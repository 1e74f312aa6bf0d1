"""Multi-chunk read-mapping driver benchmark: pipelined vs serial.

The chunked DeviceKmerIndex drivers (map_read_kmers / has_read_kmers)
queue the NEXT chunk's decode before the current chunk's n_overflow
fetch — this measures what that one-deep pipeline buys end to end on
a query set several QUERY_CHUNKs long. Everything (table rows AND
queries) is synthesized on device so the sandbox's ~5 MB/s tunnel is
excluded; each driver call returns a host array, which is a full sync,
so wall-clock over calls is a true rate.

Usage: python benchmarks/bench_chunked.py [n_rows] [n_chunks]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from graph_kmer_index_tpu import FlatKmers, KmerIndex
    from graph_kmer_index_tpu.ops.lookup import DeviceKmerIndex
    from graph_kmer_index_tpu.read_kmers import DeviceReadKmers

    n_nodes = 1 << 20
    kmers = jax.random.bits(jax.random.PRNGKey(0), (n_rows,),
                            jnp.uint64) >> jnp.uint64(2)
    nodes = (jax.random.bits(jax.random.PRNGKey(1), (n_rows,), jnp.uint32)
             % jnp.uint32(n_nodes - 1)) + jnp.uint32(1)
    # device-resident FlatKmers -> device index build (the production
    # find_kmers_parallel_device -> from_flat_kmers path)
    flat = FlatKmers(kmers, nodes,
                     jnp.arange(n_rows, dtype=jnp.uint64),
                     jnp.ones(n_rows, jnp.float32))
    index = KmerIndex.from_flat_kmers(flat, modulo=452_930_477,
                                      skip_frequencies=True)
    dev = index._device()
    dev._packed()  # build the packed tables up front (not timed)

    C = DeviceKmerIndex.QUERY_CHUNK
    n_q = n_chunks * C
    half = jax.random.choice(jax.random.PRNGKey(2), kmers, (n_q // 2,))
    miss = jax.random.bits(jax.random.PRNGKey(3), (n_q - n_q // 2,),
                           jnp.uint64) >> jnp.uint64(2)
    q = jnp.concatenate([half, miss])
    reads = DeviceReadKmers([(q, n_q)], 31)

    def serial_counts():
        """The pre-pipeline driver: resolve each chunk before
        dispatching the next (dispatch+finish back to back), including
        the same host-side ultra-row adjustment map_read_kmers applies
        (so the checksums stay comparable on deep-bucket tables)."""
        total = None
        host_adjust = np.zeros(n_nodes, dtype=np.int64)
        for chunk, nvc in dev._iter_device_chunks(reads):
            counts, host_mask = dev._counts_packed_full(chunk, nvc,
                                                        n_nodes)
            counts = counts.astype(jnp.int64)
            total = counts if total is None else total + counts
            km, mult = dev._fetch_masked_kmers(chunk, host_mask)
            if len(km):
                for _kq, m, nodes_hit in dev._ultra_rows(km, mult):
                    np.add.at(host_adjust, nodes_hit.astype(np.int64), m)
        return np.asarray(total) + host_adjust

    # warm both compile sets
    dev.map_read_kmers(reads, n_nodes)
    serial_counts()

    for label, fn in (("pipelined", lambda: dev.map_read_kmers(
            reads, n_nodes)),
            ("serial", serial_counts)):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(json.dumps({"driver": label, "n_q": n_q, "s": round(t, 3),
                          "Mq_per_s": round(n_q / t / 1e6, 2),
                          "checksum": int(np.sum(r))}), flush=True)


if __name__ == "__main__":
    main()
