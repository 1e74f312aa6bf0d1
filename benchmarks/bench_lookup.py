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
    from graph_kmer_index_tpu.ops.lookup import _node_counts

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
    from graph_kmer_index_tpu.ops.lookup import (
        _counts_decode_packed, _member_decode_packed,
        _overflow_scan_counts, _overflow_scan_member)

    cap_hi = dev._overflow_hint(n_q)

    # stage-B inputs from one real stage-A run: the true overflow count
    # of the half-hit batch sizes the scan matrix, exactly as the e2e
    # methods do (_overflow_pieces)
    outA = _counts_decode_packed(q0, n_q, rec, modulo2, n_nodes, cap_hi,
                                 True)
    n_over = int(outA[-1])
    if n_over > cap_hi:
        # production (_overflow_pieces) re-runs stage A at a bigger
        # compaction cap in this case; mirror it so stage B measures
        # the full deep workload instead of a truncated slice
        cap_hi = min(n_q, 1 << int(n_over - 1).bit_length())
        outA = _counts_decode_packed(q0, n_q, rec, modulo2, n_nodes,
                                     cap_hi, True)
    scan_cap = (0 if n_over == 0 else
                min(cap_hi, max(1024, 1 << int(n_over - 1).bit_length())))
    print(f"deep queries: {n_over}/{n_q} (compaction cap {cap_hi}, "
          f"scan cap {scan_cap})", flush=True)
    outM = _member_decode_packed(q0, n_q, rec, modulo2, cap_hi)
    pc = tuple(a[:scan_cap] for a in outA[2:5])
    pm = tuple(a[:scan_cap] for a in outM[2:6])

    def make_chain_counts_A(sort_agg):
        @jax.jit
        def chain(q, reps, rec):
            def body(i, x):
                counts, _, _, _, _, n_over = _counts_decode_packed(
                    x, x.shape[0], rec, modulo2, n_nodes, cap_hi,
                    sort_agg)
                # SCALAR dependence: a counts[x % n]-style gather here
                # becomes part of the measured loop body (~30% inflation
                # at 4M queries — the round-2 "22 M/s" artifact)
                return x ^ (counts[0] + n_over).astype(jnp.uint64)
            return jax.lax.fori_loop(0, reps, body, q).sum()
        return chain

    @jax.jit
    def chain_member_A(q, reps, rec):
        def body(i, x):
            hit, _, _, _, _, _, _ = _member_decode_packed(
                x, x.shape[0], rec, modulo2, cap_hi)
            return x ^ hit.astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    @jax.jit
    def chain_counts_B(q, reps, oq, ostart, osz, n_over_d, ks, ns):
        def body(i, x):
            # flip oq's low bit by a value derived from x: keeps the
            # chain data-dependent without changing the gather pattern
            c = _overflow_scan_counts(oq ^ (x[:oq.shape[0]] & jnp.uint64(1)),
                                      ostart, osz, n_over_d, ks, ns,
                                      n_nodes, max_sz)
            return x ^ c[0].astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    @jax.jit
    def chain_member_B(q, reps, hit0, oi, oq, ostart, osz, n_over_d, ks):
        def body(i, x):
            h = _overflow_scan_member(
                hit0, oi, oq ^ (x[:oq.shape[0]] & jnp.uint64(1)),
                ostart, osz, n_over_d, ks, max_sz)
            return x ^ h.astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    @jax.jit
    def chain_csr(q, reps, tk, tn, st, sz):
        def body(i, x):
            counts = _node_counts(x, x.shape[0], tk, tn, st, sz,
                                  dev.modulo, n_nodes, dev.max_scan)
            return x ^ counts[0].astype(jnp.uint64)
        return jax.lax.fori_loop(0, reps, body, q).sum()

    def measure(chain, args):
        int(chain(q0, 2, *args))
        int(chain(q0, 10, *args))
        t0 = time.perf_counter()
        int(chain(q0, 2, *args))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(q0, 10, *args))
        t10 = time.perf_counter() - t0
        return (t10 - t2) / 8

    runs = [("counts A/direct", make_chain_counts_A(False), (rec,)),
            ("counts A/sortagg", make_chain_counts_A(True), (rec,)),
            ("member A", chain_member_A, (rec,))]
    if scan_cap:
        hz = jnp.zeros(n_q, bool)
        runs += [("counts B", chain_counts_B,
                  (pc[0], pc[1], pc[2], outA[-1], ks, ns)),
                 ("member B", chain_member_B,
                  (hz, pm[3], pm[0], pm[1], pm[2], outM[-1], ks))]
    if "--csr" in sys.argv:
        runs.append(("counts/csr", chain_csr,
                     (dev.table_kmers, dev.table_nodes, dev.starts_tbl,
                      dev.sizes_tbl)))
    stage = {}
    for name, chain, args in runs:
        per = measure(chain, args)
        stage[name] = per
        print(f"lookup [{name}]: {per*1e3:.2f} ms/batch of {n_q} "
              f"-> {n_q/per/1e6:.1f} M lookups/s", flush=True)
    tb_c = stage.get("counts B", 0.0)
    tb_m = stage.get("member B", 0.0)
    for label, ta, tb in [
            ("counts e2e (A+B)", stage["counts A/sortagg"], tb_c),
            ("member e2e (A+B)", stage["member A"], tb_m)]:
        per = ta + tb
        print(f"lookup [{label}]: {per*1e3:.2f} ms -> "
              f"{n_q/per/1e6:.1f} M lookups/s", flush=True)


if __name__ == "__main__":
    main()
