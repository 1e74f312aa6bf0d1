"""Headline benchmark: k-mer hashing throughput per chip (k=31).

This is the hot kernel of the whole framework — every finder, read mapper
and index build goes through sliding-window hashing (the reference's
``np.convolve(seq, power_array(k))`` hot path, read_kmers.py:68-70 /
kmer_finder.py:350-352). Baseline = the reference's numpy convolve method
measured on this host's CPU. Prints ONE json line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Each device kernel candidate is measured in a subprocess with a hard
timeout so a pathological compile can never hang the harness.
"""
import json
import subprocess
import sys
import time

import numpy as np

K = 31
N_DEVICE = 1 << 24   # bases hashed per device iteration
N_CPU = 1 << 20      # bases for the CPU reference measurement
REPS = 16
# the remote compile helper degrades over a session's lifetime (first
# Pallas compile ~30s, hours later 400s+); give each candidate room
KERNEL_TIMEOUT_S = 420


def _median_time(fn, reps=REPS):
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def measure_kernel(kernel: str) -> float:
    """Rate (kmers/s) for one device kernel.

    Methodology: the only trustworthy sync point on this backend is a
    scalar fetch, so we time a jitted data-dependent chain of R kernel
    applications ending in a sum() for two chain lengths and difference
    them — constant dispatch/fetch overhead cancels, leaving pure kernel
    time per iteration."""
    import functools
    import jax
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import (
        sliding_hashes, sliding_hashes_pallas, sliding_hashes_pallas_p16,
        sliding_hashes_u32)

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.integers(0, 4, N_DEVICE).astype(np.int32))

    def apply(s):
        if kernel.startswith("p16raw"):
            # kernel-only rate: the (lo, hi) derivation is a fused
            # slice+mask the real consumers absorb into their own reads
            from graph_kmer_index_tpu.ops.encode import sliding_p16_pallas
            opts = {}
            if ":" in kernel:
                _, rows, chunk = kernel.split(":")
                opts = dict(rows_per_block=int(rows), chunk=int(chunk))
            p16 = sliding_p16_pallas(s, K, **opts)
            return (p16 & 3).astype(jnp.int32)
        if kernel.startswith("p16"):
            # roofline variant: int8 input, one u32/lane output; the
            # (lo, hi) derivation fuses into the consumer xor here
            opts = {}
            if ":" in kernel:
                _, rows, chunk = kernel.split(":")
                opts = dict(rows_per_block=int(rows), chunk=int(chunk))
            lo, hi = sliding_hashes_pallas_p16(s, K, **opts)
            return (lo ^ hi).astype(jnp.int32)
        if kernel == "pallas":
            lo, hi = sliding_hashes_pallas(s, K)
            return (lo ^ hi).astype(jnp.int32)
        if kernel == "u32":
            lo, hi = sliding_hashes_u32(s, K)
            return (lo ^ hi).astype(jnp.int32)
        return sliding_hashes(s, K).astype(jnp.int32)

    @jax.jit
    def chain(s, reps):
        # traced trip count -> ONE compile serves both chain lengths
        def body(i, x):
            return (x + apply(x) & 3).astype(jnp.int32)
        return jax.lax.fori_loop(0, reps, body, s).sum()

    r_short, r_long = 2, 2 + REPS
    int(chain(seq, r_short))  # compile
    int(chain(seq, r_long))
    t0 = time.perf_counter()
    int(chain(seq, r_short))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(chain(seq, r_long))
    t_long = time.perf_counter() - t0
    per_iter = max(1e-9, (t_long - t_short) / REPS)
    return N_DEVICE / per_iter


def measure_kernel_subprocess(kernel: str,
                              timeout_s: float = KERNEL_TIMEOUT_S
                              ) -> float | None:
    if timeout_s <= 5:
        return None
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--kernel", kernel],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"[bench] {kernel}: timed out after {timeout_s:.0f}s",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["rate"])
        except (ValueError, KeyError):
            continue
    print(f"[bench] {kernel}: no rate (stderr tail: "
          f"{out.stderr.strip().splitlines()[-1:] })",
          file=sys.stderr, flush=True)
    return None


def bench_cpu_reference(n=N_CPU):
    """The reference implementation's own vectorized hot path:
    np.convolve(numeric_seq, power_array(k)) (reference read_kmers.py:68-70)."""
    from graph_kmer_index_tpu.hashing import power_array

    seq = np.random.randint(0, 4, n).astype(np.uint64)
    pa = power_array(K)

    def run():
        np.convolve(seq, pa, mode="valid")

    run()
    return n / _median_time(run, reps=3)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--kernel":
        print(json.dumps({"rate": measure_kernel(sys.argv[2])}))
        return

    import os
    # global deadline: the driver gives this script a bounded budget;
    # worst-case per-candidate timeouts must never add up past it or
    # the JSON line is lost entirely (observed with a degraded remote
    # compile helper: one XLA compile can eat 10+ minutes)
    budget_s = float(os.environ.get("GKI_BENCH_BUDGET_S", "540"))
    deadline = time.monotonic() + budget_s

    def remaining():
        return deadline - time.monotonic()

    # CPU baseline first: seconds of work, and it guarantees the
    # vs_baseline denominator exists whatever the device side does
    cpu_rate = bench_cpu_reference()

    kernels = os.environ.get(
        "GKI_BENCH_KERNELS", "u32,p16,pallas").split(",")
    rates = {}
    for kernel in kernels:
        if kernel in ("p16", "pallas") and "p16" in rates:
            break  # p16 measured: no later candidate can beat it
        # floor-first ordering: u32 is XLA-only (cheapest compile) and
        # guarantees a line; p16 (the headline, ~2.5x) gets the bulk of
        # the remaining budget; pallas only runs if p16 failed. u32 is
        # capped low — if the helper can't compile plain XLA in 150s it
        # won't compile a Pallas kernel either, so hoarding budget for
        # p16 after a u32 timeout would be wasted anyway.
        t = (min(150, remaining() - 90) if kernel == "u32"
             else min(KERNEL_TIMEOUT_S, remaining() - 10))
        rate = measure_kernel_subprocess(kernel, t)
        if rate is not None:
            rates[kernel] = rate
    if "p16" not in rates and remaining() > 90:
        # p16's compile timed out once; a second attempt often hits a
        # less-loaded helper and it is ~2.5x the fallback kernel
        retry = measure_kernel_subprocess(
            "p16", min(KERNEL_TIMEOUT_S, remaining() - 10))
        if retry is not None:
            rates["p16"] = retry
    if not rates:
        # last resort: never leave the driver without a JSON line — run
        # the XLA kernel in-process (compiles are the usual timeout cause;
        # a second attempt in a warm process often fits), under SIGALRM
        # so a wedged backend still yields an honest failure record
        import signal

        def _give_up(signum, frame):
            print(json.dumps({
                "metric": "kmers_hashed_per_sec_per_chip",
                "value": 0, "unit": "kmers/s", "vs_baseline": 0,
                "error": "device compile timed out repeatedly; no "
                         "on-chip measurement this run"}), flush=True)
            os._exit(0)

        signal.signal(signal.SIGALRM, _give_up)
        signal.alarm(max(30, int(min(remaining() - 5, 300))))
        rates["inproc"] = measure_kernel("u32")
        signal.alarm(0)
    device_rate = max(rates.values())

    print(json.dumps({
        "metric": "kmers_hashed_per_sec_per_chip",
        "value": round(device_rate),
        "unit": "kmers/s",
        "vs_baseline": round(device_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
