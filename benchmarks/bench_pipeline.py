"""End-to-end pipeline benchmark (the BASELINE.md north-star scenario):
synthetic SNP graph -> full DenseKmerFinder enumeration -> collision-free
index at the production modulo -> read batch mapped to node counts.

With ``--device-finalize`` the find stage returns compact span tapes and
expands rows ON DEVICE (parallel.host_pool.find_kmers_parallel_device):
the expanded row arrays never cross the host link and the index build
consumes them zero-copy — the transfer-bound configuration's win.

Usage: python benchmarks/bench_pipeline.py [n_bases] [n_variants] [n_reads]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_bases = int(pos[0]) if len(pos) > 0 else 10_000_000
    n_variants = int(pos[1]) if len(pos) > 1 else 100_000
    n_reads = int(pos[2]) if len(pos) > 2 else 10_000
    modulo = int(pos[3]) if len(pos) > 3 else 452_930_477
    k = 31

    from graph_kmer_index_tpu import DenseKmerFinder, KmerIndex
    from graph_kmer_index_tpu.parallel.host_pool import (
        find_kmers_parallel, find_kmers_parallel_device)
    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    device_finalize = "--device-finalize" in sys.argv

    t0 = time.perf_counter()
    graph, _ = random_snp_graph(n_bases, n_variants, seed=0)
    t_graph = time.perf_counter() - t0
    print(f"graph build: {t_graph:.1f}s ({graph.n_nodes()} nodes)",
          flush=True)

    t0 = time.perf_counter()
    if device_finalize:
        # quarter-graph stream groups: the device expansion (tape upload
        # + hash + row expansion) overlaps the host find, so this stage
        # time approaches max(find, finalize) — the build below keeps
        # only the global sort + bucket tables
        flat = find_kmers_parallel_device(
            graph, k, n_workers=4,
            stream_rows_target=max(2_000_000, int(n_bases * 1.4) // 4),
            stream_tape_target=max(2_000_000, n_bases // 4))
        import jax
        jax.block_until_ready(flat._hashes)
    else:
        flat = find_kmers_parallel(graph, k, n_workers=4)
    t_find = time.perf_counter() - t0
    mode = "device finalize" if device_finalize else "host finalize"
    print(f"find (4 workers, native walker, {mode}): {t_find:.1f}s "
          f"({len(flat._hashes)} rows, "
          f"{n_bases/t_find/1e6:.2f} Mbases/s)", flush=True)

    t0 = time.perf_counter()
    index = KmerIndex.from_flat_kmers(flat, modulo=modulo,
                                      skip_frequencies=True)
    t_build = time.perf_counter() - t0
    print(f"device index build @ modulo {modulo}: {t_build:.1f}s",
          flush=True)

    # simulated reads: windows of the linear reference
    rng = np.random.default_rng(1)
    _, _, refseq = graph.linear_ref_sequence()
    starts = rng.integers(0, len(refseq) - 150, n_reads)
    reads = np.stack([refseq[s:s + 150] for s in starts])
    import jax.numpy as jnp
    if device_finalize:
        # device-resident query path: hash + compact on device, feed
        # DeviceReadKmers to map_kmers (no query transfer at all)
        from graph_kmer_index_tpu.ops.encode import read_tape_hashes
        from graph_kmer_index_tpu.read_kmers import DeviceReadKmers
        flatr = reads.reshape(-1).astype(np.int8)
        rstarts = (np.arange(n_reads) * 150).astype(np.int32)
        rlens = np.full(n_reads, 150, np.int32)
        hashes_d, nv = read_tape_hashes(
            jnp.asarray(flatr), jnp.asarray(rstarts), jnp.asarray(rlens),
            len(flatr), k)
        kmers = DeviceReadKmers([(hashes_d, int(nv))], k)
    else:
        from graph_kmer_index_tpu.ops.encode import sliding_hashes
        flatr = reads.reshape(-1).astype(np.int32)
        hashes = np.asarray(sliding_hashes(jnp.asarray(flatr), k))
        pos = np.arange(reads.size) % 150
        kmers = hashes[pos <= 150 - k].astype(np.uint64)

    dev = index._device()
    t0 = time.perf_counter()
    dev._packed()
    t_packed = time.perf_counter() - t0
    print(f"packed table build: {t_packed:.1f}s", flush=True)

    warm = kmers if device_finalize else kmers[:1024]
    counts = index.map_kmers(warm, graph.n_nodes())  # warm compile
    t0 = time.perf_counter()
    counts = index.map_kmers(kmers, graph.n_nodes())
    t_map = time.perf_counter() - t0
    hits = counts.sum() / max(1, len(kmers))
    print(f"map {len(kmers)} read kmers: {t_map:.2f}s "
          f"({len(kmers)/t_map/1e6:.1f} M kmers/s), hits/query = "
          f"{hits:.2f}", flush=True)


if __name__ == "__main__":
    main()
