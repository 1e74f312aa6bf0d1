"""Device lookup throughput: the KAGE read-mapping hot path
(kmers -> node counts / membership; replaces CythonKmerIndex /
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
        _node_counts, _node_counts_packed, _has_kmers_packed)

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
    t = time.perf_counter()
    rec, ks, ns, modulo2, max_sz = dev._packed()
    rec.block_until_ready()
    print(f"packed build: {time.perf_counter()-t:.2f}s "
          f"(modulo2={modulo2}, max bucket={max_sz})", flush=True)

    n_nodes = 1 << 20
    half_hit = np.concatenate([
        np.asarray(flat._hashes[:n_q // 2], dtype=np.uint64),
        rng.integers(0, 1 << 62, n_q - n_q // 2).astype(np.uint64)])
    q0 = jnp.asarray(half_hit)

    # NB: the device tables are passed as ARGUMENTS — closing over them
    # bakes GB-scale constants into the compile request (HTTP 413 on
    # this backend's remote compile helper)
    def make_chain_counts(sort_agg):
        @jax.jit
        def chain_counts_packed(q, reps, rec, ks, ns):
            def body(i, x):
                counts, _ = _node_counts_packed(x, x.shape[0], rec, ks, ns,
                                                modulo2, n_nodes, max_sz,
                                                sort_agg)
                # SCALAR dependence: a counts[x % n]-style gather here
                # becomes part of the measured loop body (~30% inflation
                # at 4M queries — the round-2 "22 M/s" artifact)
                return x ^ counts[0].astype(jnp.uint64)
            return jax.lax.fori_loop(0, reps, body, q).sum()
        return chain_counts_packed

    @jax.jit
    def chain_has_packed(q, reps, rec, ks, ns):
        def body(i, x):
            hit, _ = _has_kmers_packed(x, x.shape[0], rec, ks, modulo2,
                                       max_sz)
            return x ^ hit.astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    @jax.jit
    def chain_csr(q, reps, tk, tn, st, sz):
        def body(i, x):
            counts = _node_counts(x, x.shape[0], tk, tn, st, sz,
                                  dev.modulo, n_nodes, dev.max_scan)
            return x ^ counts[0].astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    runs = [("counts/packed", make_chain_counts(False), (rec, ks, ns)),
            ("counts/sortagg", make_chain_counts(True), (rec, ks, ns)),
            ("member/packed", chain_has_packed, (rec, ks, ns))]
    if "--csr" in sys.argv:
        runs.append(("counts/csr", chain_csr,
                     (dev.table_kmers, dev.table_nodes, dev.starts_tbl,
                      dev.sizes_tbl)))
    for name, chain, args in runs:
        int(chain(q0, 2, *args))
        int(chain(q0, 10, *args))
        t0 = time.perf_counter()
        int(chain(q0, 2, *args))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(q0, 10, *args))
        t10 = time.perf_counter() - t0
        per = (t10 - t2) / 8
        print(f"lookup [{name}]: {per*1e3:.2f} ms/batch of {n_q} "
              f"-> {n_q/per/1e6:.1f} M lookups/s", flush=True)


if __name__ == "__main__":
    main()
