"""Isolate the counts-aggregation primitives with SCALAR-dependence
chains (body returns x ^ counts[0]); the earlier bench_primitives
scatter chain folded a same-size random gather into the body, so its
"72M updates/s scatter" was really gather+scatter combined.

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

    def scatter1(nl, n_nodes):
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        return counts.at[jnp.where(nl == _NODE_SENT, n_nodes, nl)].add(
            1, mode="drop")

    def scatter2(nl, n_nodes):
        # the real counts path: two full-batch scatters into one array
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        h = nl.shape[0] // 2
        counts = counts.at[jnp.where(nl[:h] == _NODE_SENT, n_nodes, nl[:h])
                           ].add(1, mode="drop")
        return counts.at[jnp.where(nl[h:] == _NODE_SENT, n_nodes, nl[h:])
                         ].add(1, mode="drop")

    def sortagg(nl, nn):
        return _aggregate_counts_sorted([nl], nn)

    def gather_same_size(nl, n_nodes):
        # reference point: one full-size random gather (no scatter)
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        g = counts[(nl & (n_nodes - 1)).astype(jnp.int32)]
        return counts.at[0].set(g.sum())

    variants = [
        ("scatter1", scatter1),
        ("scatter2", scatter2),
        ("sortagg", sortagg),
        ("gather", gather_same_size),
    ]
    for name, fn in variants:
        @jax.jit
        def chain(x, reps, fn=fn):
            def body(i, x):
                counts = fn(x, n_nodes)
                return x ^ counts[0]
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
