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
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(pos[0]) if len(pos) > 0 else 16_800_000
    n_q = int(pos[1]) if len(pos) > 1 else 1 << 22

    import jax
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.lookup import (
        internal_modulo, _build_packed)

    rng = np.random.default_rng(0)
    kmers = jnp.asarray(rng.integers(0, 1 << 62, n_rows).astype(np.uint64))
    nodes = jnp.asarray(rng.integers(1, 1 << 20, n_rows).astype(np.uint32))
    modulo2 = internal_modulo(n_rows)
    t = time.perf_counter()
    rec, ks, ns, max_sz, _df = _build_packed(kmers, nodes, modulo2)
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

    # -- narrow-lane record tables: same packed records stored as u16/u8
    # lanes, 2/4 buckets per 128-lane row -> 256B/128B fetched per query
    # instead of 512B (the (n_q, 128) gather intermediate shrinks 2x/4x;
    # the slot select needs 2x/4x more sub-lane reductions). Built by
    # direct sub-lane scatters from the sorted rows (an index-array
    # byte-expansion of the u32 table OOMs at this scale).
    def build_narrow(sub, dt):
        bits = 32 // sub
        mask = jnp.uint32((1 << bits) - 1)

        @jax.jit
        def build(bs, ks, ns, sz_row):
            n = bs.shape[0]
            is_first = jnp.concatenate([jnp.ones(1, bool), bs[1:] != bs[:-1]])
            is_second = jnp.concatenate(
                [jnp.zeros(1, bool), is_first[:-1]]) & ~is_first
            flat_len = 8 * sub * (-(-modulo2 // (16 // sub)) * (16 // sub))
            oob = jnp.int32(flat_len)
            tb = bs.astype(jnp.int32) * (8 * sub)
            out = jnp.full(flat_len, dt((1 << bits) - 1))
            base = jnp.where(is_first, tb,
                             jnp.where(is_second & (sz_row == 2),
                                       tb + 4 * sub, oob))
            ks_lo = (ks & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            ks_hi = (ks >> jnp.uint64(32)).astype(jnp.uint32)
            for j in range(sub):
                sh = jnp.uint32(bits * j)
                out = out.at[base + j].set(
                    ((ks_lo >> sh) & mask).astype(dt), mode="drop")
                out = out.at[base + sub + j].set(
                    ((ks_hi >> sh) & mask).astype(dt), mode="drop")
                out = out.at[base + 2 * sub + j].set(
                    ((ns >> sh) & mask).astype(dt), mode="drop")
                out = out.at[jnp.where(is_first, tb + 3 * sub + j, oob)].set(
                    ((~sz_row.astype(jnp.uint32) >> sh) & mask).astype(dt),
                    mode="drop")
            return out.reshape(-1, 128)
        return build

    # the sorted build inputs (same stages as _build_packed)
    from graph_kmer_index_tpu.ops.lookup import _packed_sort, _packed_sizes
    bs, ks_s, ns_s = _packed_sort(kmers, nodes, modulo2)
    sz_row, _ = _packed_sizes(bs, modulo2)
    rec16 = build_narrow(2, jnp.uint16)(bs, ks_s, ns_s, sz_row)
    jax.block_until_ready(rec16)
    rec8 = build_narrow(4, jnp.uint8)(bs, ks_s, ns_s, sz_row)
    jax.block_until_ready(rec8)

    def make_chain_narrow(log2_per_u32):
        """Decode from a u8 (log2_per_u32=2) or u16 (=1) lane table."""
        sub = 1 << log2_per_u32            # sub-lanes per u32
        per_row = 128 // (8 * sub)         # buckets per 128-lane row
        bits = 32 // sub

        @jax.jit
        def chain(q, reps, records):
            def body(i, x):
                qv = jnp.ones(x.shape[0], bool)
                b = (x % jnp.uint64(modulo2)).astype(jnp.int32)
                q_lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
                q_hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
                g = records[b // per_row]
                off = ((b % per_row) * 8 * sub).astype(jnp.int32)
                rel = (jnp.arange(128, dtype=jnp.int32)[None, :]
                       - off[:, None])

                def sel(lane):
                    acc = jnp.zeros(x.shape[0], jnp.uint32)
                    for j in range(sub):
                        part = jnp.sum(
                            jnp.where(rel == lane * sub + j, g, 0),
                            axis=1, dtype=jnp.uint32)
                        acc = acc | (part << jnp.uint32(bits * j))
                    return acc

                sz = (~sel(3)).astype(jnp.int32)
                n0 = sel(2)
                r3 = sel(6)
                hit0 = (sel(0) == q_lo) & (sel(1) == q_hi) & qv
                hit1 = (sel(4) == q_lo) & (sel(5) == q_hi) & qv
                return fold(x, sz, n0, r3, hit0, hit1)
            return jax.lax.fori_loop(0, reps, body, q).sum()
        return chain

    def make_chain_gather_only(per_row):
        @jax.jit
        def chain(q, reps, records):
            def body(i, x):
                b = (x % jnp.uint64(modulo2)).astype(jnp.int32)
                g = records[b // per_row]
                return x ^ g[:, 0].astype(jnp.uint64)
            return jax.lax.fori_loop(0, reps, body, q).sum()
        return chain

    chains = [("gather", chain_gather, rec),
              ("masked", make_chain(decode_masked), rec),
              ("roll", make_chain(decode_roll), rec),
              ("sortq", chain_sortq, rec),
              ("gath16", make_chain_gather_only(8), rec16),
              ("deco16", make_chain_narrow(1), rec16),
              ("gath8", make_chain_gather_only(4), rec8),
              ("deco8", make_chain_narrow(2), rec8)]
    only = [a for a in sys.argv[1:] if a.startswith("--only=")]
    if only:
        wanted = set(only[0].split("=", 1)[1].split(","))
        chains = [c for c in chains if c[0] in wanted]
    r_lo, r_hi = 2, 10
    for name, chain, table in chains:
        try:
            int(chain(q0, r_lo, table))  # compile+warm
            t0 = time.perf_counter()
            int(chain(q0, r_lo, table))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(chain(q0, r_hi, table))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (r_hi - r_lo)
            print(f"{name:8s} {per*1e3:8.2f} ms/iter  "
                  f"{n_q/per/1e6:7.1f} M q/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
