"""Isolate the counts-aggregation strategies: direct scatter-add of every
hit vs sort-aggregate (sort nodes, compact runs, scatter run lengths).

Usage: python benchmarks/bench_counts_agg.py [n_hits] [n_nodes]
"""
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20

    import jax
    import jax.numpy as jnp
    import numpy as np
    from graph_kmer_index_tpu.ops.lookup import (
        _aggregate_counts_sorted, _NODE_SENT)

    rng = np.random.default_rng(0)
    nodes = rng.integers(0, n_nodes, n).astype(np.int32)
    nodes[rng.random(n) < 0.5] = int(_NODE_SENT)  # half misses
    nodes_j = jnp.asarray(nodes)

    def scatter_direct(nl, n_nodes):
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        return counts.at[jnp.where(nl == _NODE_SENT, n_nodes, nl)].add(
            1, mode="drop")

    def sort_only(nl, n_nodes):
        s = jax.lax.sort(nl)
        return jnp.zeros(n_nodes, jnp.int32).at[0].set(s[0] ^ s[-1])

    def sortkv_only(nl, n_nodes):
        _, p = jax.lax.sort_key_val(
            nl, jnp.arange(nl.shape[0], dtype=jnp.int32), is_stable=True)
        return jnp.zeros(n_nodes, jnp.int32).at[0].set(p[0] ^ p[-1])

    variants = [
        ("scatter", scatter_direct),
        ("sortagg", lambda nl, nn: _aggregate_counts_sorted([nl], nn)),
        ("sort1", sort_only),
        ("sortkv", sortkv_only),
    ]
    for name, fn in variants:
        @jax.jit
        def chain(x, reps, fn=fn):
            def body(i, x):
                counts = fn(x, n_nodes)
                return x ^ counts[(x & (n_nodes - 1)).astype(jnp.int32)]
            return jax.lax.fori_loop(0, reps, body, x).sum()

        int(chain(nodes_j, 2))
        int(chain(nodes_j, 10))
        t0 = time.perf_counter()
        int(chain(nodes_j, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(nodes_j, 10))
        t10 = time.perf_counter() - t0
        per = (t10 - t2) / 8
        print(f"{name}: {per*1e3:.2f} ms for {n} hits "
              f"-> {n/per/1e6:.1f} M hits/s", flush=True)


if __name__ == "__main__":
    main()
