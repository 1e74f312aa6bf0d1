"""Device lookup throughput: the KAGE read-mapping hot path
(kmers -> bucket scan -> node counts; replaces CythonKmerIndex /
kmer_mapper). Chained-differenced timing (see bench.py) — the only
trustworthy sync on this backend is a scalar fetch.

Usage: python benchmarks/bench_lookup.py [n_rows] [modulo] [n_queries]
"""
import functools
import sys
import time

import numpy as np


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    modulo = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_003
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20

    import jax
    import jax.numpy as jnp
    from graph_kmer_index_tpu import CollisionFreeKmerIndex, FlatKmers
    from graph_kmer_index_tpu.ops.lookup import (
        _node_counts, _node_counts_dense, build_dense_lanes)

    rng = np.random.default_rng(0)
    flat = FlatKmers(rng.integers(0, 1 << 62, n_rows).astype(np.uint64),
                     rng.integers(1, 1 << 20, n_rows).astype(np.uint32),
                     rng.integers(0, 1 << 30, n_rows).astype(np.uint64),
                     rng.random(n_rows).astype(np.single))
    t = time.perf_counter()
    index = CollisionFreeKmerIndex.from_flat_kmers(flat, modulo=modulo,
                                                   skip_frequencies=True)
    print(f"build: {time.perf_counter()-t:.2f}s "
          f"(n_rows={n_rows}, modulo={modulo})", flush=True)
    dev = index._device()
    print("max bucket size:", dev.max_scan, flush=True)

    n_nodes = 1 << 20
    half_hit = np.concatenate([
        np.asarray(flat._hashes[:n_q // 2], dtype=np.uint64),
        rng.integers(0, 1 << 62, n_q - n_q // 2).astype(np.uint64)])
    q0 = jnp.asarray(half_hit)

    k0, n0, k1, n1 = build_dense_lanes(dev.table_kmers, dev.table_nodes,
                                       dev.starts_tbl, dev.sizes_tbl)
    k0.block_until_ready()

    @jax.jit
    def chain_csr(q, reps):  # traced trip count -> one compile
        def body(i, x):
            counts = _node_counts(x, x.shape[0], dev.table_kmers,
                                  dev.table_nodes, dev.starts_tbl,
                                  dev.sizes_tbl, dev.modulo, n_nodes,
                                  dev.max_scan)
            # force dependence of next queries on this lookup
            return x ^ counts[(x % n_nodes).astype(jnp.int64)].astype(
                jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    @jax.jit
    def chain_dense(q, reps):
        def body(i, x):
            counts, _ = _node_counts_dense(
                x, x.shape[0], k0, n0, k1, n1, dev.table_kmers,
                dev.table_nodes, dev.starts_tbl, dev.sizes_tbl, dev.modulo,
                n_nodes, dev.max_scan)
            return x ^ counts[(x % n_nodes).astype(jnp.int64)].astype(
                jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    for name, chain in (("dense", chain_dense), ("csr", chain_csr)):
        int(chain(q0, 2))
        int(chain(q0, 10))
        t0 = time.perf_counter()
        int(chain(q0, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(q0, 10))
        t10 = time.perf_counter() - t0
        per = (t10 - t2) / 8
        print(f"lookup+count [{name}]: {per*1e3:.2f} ms/batch of {n_q} "
              f"-> {n_q/per/1e6:.1f} M lookups/s", flush=True)


if __name__ == "__main__":
    main()
