"""A/B the two sorts on the lookup paths' critical path (scalar-
dependence chains, see bench_counts_agg.py for why):

1. _compact_overflow's stable key+payload sort vs a fused single-u32-key
   sort ((~deep) << 22 | idx) — halves the sorted bytes when n <= 2^22.
2. _aggregate_counts_sorted's run-start machinery (second key+payload
   sort) vs (a) a fused-key second sort and (b) sorted scatter-add of
   ones right after the value sort (indices_are_sorted=True).

Usage: python benchmarks/bench_agg2.py [n_q] [n_nodes]
"""
import sys
import time


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20

    import jax
    import jax.numpy as jnp
    import numpy as np
    from graph_kmer_index_tpu.ops.lookup import (
        _aggregate_counts_sorted, _NODE_SENT)

    rng = np.random.default_rng(0)
    deep = jnp.asarray(rng.random(n_q) < 0.09)            # measured mix
    nodes = rng.integers(0, n_nodes, 2 * n_q).astype(np.int32)
    nodes[rng.random(2 * n_q) < 0.5] = int(_NODE_SENT)    # half misses
    nl = jnp.asarray(nodes)
    cap = max(1024, n_q // 32)

    # -- compaction variants ------------------------------------------
    def compact_cur(d):
        key = (~d).astype(jnp.int32)
        _, oi_full = jax.lax.sort_key_val(
            key, jnp.arange(n_q, dtype=jnp.int32), is_stable=True)
        return oi_full[:cap]

    def compact_fused(d):
        key = ((~d).astype(jnp.uint32) << 22) | jnp.arange(
            n_q, dtype=jnp.uint32)
        s = jax.lax.sort(key)
        return (s[:cap] & jnp.uint32((1 << 22) - 1)).astype(jnp.int32)

    # -- aggregation variants ------------------------------------------
    def agg_cur(x):
        return _aggregate_counts_sorted([x], n_nodes)

    def agg_sorted_scatter(x):
        s = jax.lax.sort(x)
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        return counts.at[jnp.where(s == _NODE_SENT, n_nodes, s)].add(
            1, mode="drop", indices_are_sorted=True)

    def agg_fused2nd(x):
        m = x.shape[0]
        s = jax.lax.sort(x)
        is_start = (s != _NODE_SENT) & jnp.concatenate(
            [jnp.ones(1, bool), s[1:] != s[:-1]])
        n_runs = jnp.sum(is_start, dtype=jnp.int32)
        n_valid = jnp.sum(s != _NODE_SENT, dtype=jnp.int32)
        key = ((~is_start).astype(jnp.uint32) << 24) | jnp.arange(
            m, dtype=jnp.uint32)
        pos = (jax.lax.sort(key) & jnp.uint32((1 << 24) - 1)).astype(
            jnp.int32)
        c = min(m, n_nodes + 1)
        posc = pos[:c]
        nxt = jnp.concatenate([posc[1:], jnp.full((1,), m, jnp.int32)])
        i = jnp.arange(c, dtype=jnp.int32)
        run_len = jnp.where(i < n_runs - 1, nxt, n_valid) - posc
        u = jnp.where(i < n_runs, s[posc], n_nodes)
        counts = jnp.zeros(n_nodes, dtype=jnp.int32)
        return counts.at[u].add(run_len, mode="drop")

    def sort_only(x):
        return jax.lax.sort(x)

    compact_variants = [("compact_cur", compact_cur),
                        ("compact_fused", compact_fused)]
    agg_variants = [("agg_cur", agg_cur),
                    ("agg_sorted_scatter", agg_sorted_scatter),
                    ("agg_fused2nd", agg_fused2nd),
                    ("sort_only (bound)", sort_only)]

    def run(name, fn, x0, scalar):
        @jax.jit
        def chain(x, reps):
            def body(i, x):
                out = fn(x)
                return x ^ scalar(out).astype(x.dtype)
            return jax.lax.fori_loop(0, reps, body, x).sum()

        int(chain(x0, 2)); int(chain(x0, 10))
        t0 = time.perf_counter(); int(chain(x0, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); int(chain(x0, 10))
        t10 = time.perf_counter() - t0
        per = (t10 - t2) / 8
        n = x0.shape[0]
        print(f"{name}: {per*1e3:.2f} ms for {n} -> "
              f"{n/per/1e6:.1f} M/s", flush=True)

    for name, fn in compact_variants:
        run(name, fn, deep, lambda o: o[0] > 0)
    for name, fn in agg_variants:
        run(name, fn, nl, lambda o: o[0])

    # correctness cross-check
    a = np.asarray(agg_cur(nl))
    for name, fn in [("sorted_scatter", agg_sorted_scatter),
                     ("fused2nd", agg_fused2nd)]:
        b = np.asarray(fn(nl))
        assert np.array_equal(a, b), name
    ca = np.asarray(compact_cur(deep))
    cb = np.asarray(compact_fused(deep))
    assert np.array_equal(ca, cb)
    print("equality OK", flush=True)


if __name__ == "__main__":
    main()
