"""Isolated A/B of the packed-record DECODE formulations (the shared
bottleneck of map_kmers/has_kmers): one 512-byte group-row gather per
query plus a slot-select of the bucket's 8 record lanes.

Variants:
  gather   - row gather only, elementwise lane-0 dependence (upper bound)
  masked   - current production select: 8 masked 128-lane reductions
  roll     - conditional rotate ladder (4 stages of lane-roll by
             8/16/32/64 selected by the slot bits), then 8 lane slices
  sortq    - sort queries by bucket first (device sort ~600M/s), gather
             in near-sorted row order for HBM locality, masked select,
             unsort the decoded fields

Chained-differenced timing with ELEMENTWISE dependence only (a gather
in the loop body becomes part of the measurement — see
bench_primitives.py history).

Usage: python benchmarks/bench_decode.py [n_rows] [n_queries]
"""
import sys
import time

import numpy as np


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_800_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 22

    import jax
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.lookup import (
        internal_modulo, _build_packed)

    rng = np.random.default_rng(0)
    kmers = jnp.asarray(rng.integers(0, 1 << 62, n_rows).astype(np.uint64))
    nodes = jnp.asarray(rng.integers(1, 1 << 20, n_rows).astype(np.uint32))
    modulo2 = internal_modulo(n_rows)
    t = time.perf_counter()
    rec, ks, ns, max_sz = _build_packed(kmers, nodes, modulo2)
    print(f"packed build {time.perf_counter()-t:.2f}s modulo2={modulo2} "
          f"groups={rec.shape[0]} max_sz={max_sz}", flush=True)

    q_host = np.concatenate([
        rng.integers(0, 1 << 62, n_q // 2).astype(np.uint64),
        np.asarray(kmers[: n_q - n_q // 2])])
    q0 = jnp.asarray(q_host)

    def decode_masked(g, slot, q_lo, q_hi, qv):
        rel = (jnp.arange(128, dtype=jnp.int32)[None, :] - (slot * 8)[:, None])

        def sel(lane):
            return jnp.sum(jnp.where(rel == lane, g, 0), axis=1,
                           dtype=jnp.uint32)

        sz = (~sel(3)).astype(jnp.int32)
        n0 = sel(2)
        r3 = sel(6)
        hit0 = (sel(0) == q_lo) & (sel(1) == q_hi) & qv
        hit1 = (sel(4) == q_lo) & (sel(5) == q_hi) & qv
        return sz, n0, r3, hit0, hit1

    def decode_roll(g, slot, q_lo, q_hi, qv):
        # rotate row left by slot*8: 4 conditional static-roll stages
        for bit, amt in ((1, 8), (2, 16), (4, 32), (8, 64)):
            rolled = jnp.roll(g, -amt, axis=1)
            g = jnp.where(((slot & bit) != 0)[:, None], rolled, g)
        sz = (~g[:, 3]).astype(jnp.int32)
        n0 = g[:, 2]
        r3 = g[:, 6]
        hit0 = (g[:, 0] == q_lo) & (g[:, 1] == q_hi) & qv
        hit1 = (g[:, 4] == q_lo) & (g[:, 5] == q_hi) & qv
        return sz, n0, r3, hit0, hit1

    def head(x, records):
        qv = jnp.ones(x.shape[0], bool)
        b = (x % jnp.uint64(modulo2)).astype(jnp.int32)
        q_lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        q_hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
        g = records[b // 16]
        return g, (b % 16).astype(jnp.int32), q_lo, q_hi, qv

    def fold(x, sz, n0, r3, hit0, hit1):
        mix = (sz.astype(jnp.uint32) + n0 + r3
               + hit0.astype(jnp.uint32) + hit1.astype(jnp.uint32))
        return x ^ mix.astype(jnp.uint64)

    @jax.jit
    def chain_gather(q, reps, records):
        def body(i, x):
            g, slot, _, _, _ = head(x, records)
            return x ^ g[:, 0].astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    def make_chain(decoder):
        @jax.jit
        def chain(q, reps, records):
            def body(i, x):
                g, slot, q_lo, q_hi, qv = head(x, records)
                return fold(x, *decoder(g, slot, q_lo, q_hi, qv))
            return jax.lax.fori_loop(0, reps, body, q).sum()
        return chain

    @jax.jit
    def chain_sortq(q, reps, records):
        def body(i, x):
            b = (x % jnp.uint64(modulo2)).astype(jnp.int32)
            idx = jnp.arange(x.shape[0], dtype=jnp.int32)
            bs, perm = jax.lax.sort_key_val(b, idx)
            xs = x[perm]
            g = records[(bs // 16).astype(jnp.int32)]
            slot = (bs % 16).astype(jnp.int32)
            q_lo = (xs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            q_hi = (xs >> jnp.uint64(32)).astype(jnp.uint32)
            qv = jnp.ones(x.shape[0], bool)
            sz, n0, r3, hit0, hit1 = decode_masked(g, slot, q_lo, q_hi, qv)
            mix = (sz.astype(jnp.uint32) + n0 + r3
                   + hit0.astype(jnp.uint32) + hit1.astype(jnp.uint32))
            # unsort via scatter (part of this variant's real cost)
            out = jnp.zeros_like(mix).at[perm].set(mix)
            return x ^ out.astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    chains = [("gather", chain_gather),
              ("masked", make_chain(decode_masked)),
              ("roll", make_chain(decode_roll)),
              ("sortq", chain_sortq)]
    r_lo, r_hi = 2, 10
    for name, chain in chains:
        try:
            int(chain(q0, r_lo, rec))  # compile+warm
            t0 = time.perf_counter()
            int(chain(q0, r_lo, rec))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(chain(q0, r_hi, rec))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (r_hi - r_lo)
            print(f"{name:8s} {per*1e3:8.2f} ms/iter  "
                  f"{n_q/per/1e6:7.1f} M q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
