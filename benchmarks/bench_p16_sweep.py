"""On-chip (rows_per_block, chunk) sweep for the P16 hashing kernel.

bench.py measures one config per SUBPROCESS (each paying a 30-120 s
remote compile); this harness compiles every candidate in ONE process —
with the persistent compilation cache a re-run after a relay hiccup is
nearly free — and reports the argmax so the headline bench can pin it
via ``GKI_BENCH_KERNELS="p16:R:C"``.

Methodology: identical to bench.py:measure_kernel — a jitted
data-dependent chain of R kernel applications ending in a scalar sum,
timed at two chain lengths and differenced (the only trustworthy sync
on this backend is a scalar fetch; constant dispatch/fetch overhead
cancels).

Usage:
    python benchmarks/bench_p16_sweep.py [p16raw|p16] [n_log2]
    python benchmarks/bench_p16_sweep.py --interpret   # CPU smoke test

Prints one JSON line per config and a final {"best": ...} line.
"""
from __future__ import annotations

import json
import sys
import time

REPS = 16
HALO = 128
# VMEM working set per grid step ~ rows * (chunk + HALO) int8 in +
# rows * chunk * 4B out (+ the kernel's shifted temporaries, ~4 more
# chunk-sized u32 rows); keep the estimate under ~8 MB of the ~16 MB
VMEM_BUDGET = 8 << 20


def vmem_estimate(rows: int, chunk: int) -> int:
    return rows * ((chunk + HALO) + 6 * chunk * 4)


def sweep(mode: str, n: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graph_kmer_index_tpu.ops.encode import (
        p8_to_lanes, p16_to_lanes, sliding_p8_pallas, sliding_p16_pallas)

    k = 31
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.integers(0, 4, n).astype(np.int8))

    def make_chain(rows: int, chunk: int):
        def apply(s):
            if mode.startswith("p8"):
                p8 = sliding_p8_pallas(s, k, rows_per_block=rows,
                                       chunk=chunk, interpret=interpret)
                if mode == "p8":
                    lo, hi = p8_to_lanes(p8, k)
                    return ((lo ^ hi) & 3).astype(jnp.int8)
                return (p8 & jnp.uint16(3)).astype(jnp.int8)
            p16 = sliding_p16_pallas(s, k, rows_per_block=rows,
                                     chunk=chunk, interpret=interpret)
            if mode == "p16":
                lo, hi = p16_to_lanes(p16, k)
                return ((lo ^ hi) & 3).astype(jnp.int8)
            return (p16 & 3).astype(jnp.int8)

        @jax.jit
        def chain(s, reps):
            def body(i, x):
                return ((x + apply(x)) & 3).astype(jnp.int8)
            return jax.lax.fori_loop(0, reps, body, s).sum()

        return chain

    configs = [(r, c)
               for r in (8, 16, 32, 64, 128, 256)
               for c in (512, 1024, 2048, 4096, 8192)
               if vmem_estimate(r, c) <= VMEM_BUDGET
               and r * c <= n]
    if interpret:  # CPU smoke: interpreter mode is ~1e5x slower
        configs = [(8, 512), (32, 2048)]

    best = (None, 0.0)
    r_short, r_long = 2, 2 + REPS
    for rows, chunk in configs:
        label = f"{mode}:{rows}:{chunk}"
        try:
            chain = make_chain(rows, chunk)
            t_c0 = time.perf_counter()
            int(chain(seq, r_short))  # compile (cached on re-runs)
            int(chain(seq, r_long))
            t_compile = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            int(chain(seq, r_short))
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(chain(seq, r_long))
            t_long = time.perf_counter() - t0
            per_iter = max(1e-9, (t_long - t_short) / REPS)
            rate = n / per_iter
        except Exception as e:  # OOM/compile failure: record and move on
            print(json.dumps({"kernel": label,
                              "error": repr(e)[:200]}), flush=True)
            continue
        print(json.dumps({"kernel": label, "rate": rate,
                          "compile_s": round(t_compile, 1)}), flush=True)
        if rate > best[1]:
            best = (label, rate)
    print(json.dumps({"best": best[0], "rate": best[1]}), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    interpret = "--interpret" in sys.argv
    mode = args[0] if args else "p16raw"
    n = 1 << (int(args[1]) if len(args) > 1 else (16 if interpret else 24))
    sweep(mode, n, interpret=interpret)


if __name__ == "__main__":
    main()
