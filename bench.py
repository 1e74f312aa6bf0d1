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
REPS = 5
KERNEL_TIMEOUT_S = 240


def _median_time(fn, reps=REPS):
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def measure_kernel(kernel: str) -> float:
    """Run in-process: rate (kmers/s) for one device kernel."""
    import jax.numpy as jnp
    from graph_kmer_index_tpu.ops.encode import (
        sliding_hashes, sliding_hashes_pallas, sliding_hashes_u32)

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.integers(0, 4, N_DEVICE).astype(np.int32))

    if kernel == "pallas":
        def launch():
            return sliding_hashes_pallas(seq, K)[0]
    elif kernel == "u32":
        def launch():
            return sliding_hashes_u32(seq, K)[0]
    else:
        def launch():
            return sliding_hashes(seq, K)

    launch().block_until_ready()  # compile
    # pipelined dispatch (sync once at the end) so per-call host->device
    # launch latency is amortized, as in any production streaming use
    t = time.perf_counter()
    outs = [launch() for _ in range(REPS)]
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t) / REPS
    return N_DEVICE / dt


def measure_kernel_subprocess(kernel: str) -> float | None:
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--kernel", kernel],
            capture_output=True, text=True, timeout=KERNEL_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["rate"])
        except (ValueError, KeyError):
            continue
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

    rates = {}
    for kernel in ("u32", "xla", "pallas"):
        rate = measure_kernel_subprocess(kernel)
        if rate is not None:
            rates[kernel] = rate
    if not rates:
        raise RuntimeError("no device hashing kernel completed")
    device_rate = max(rates.values())
    cpu_rate = bench_cpu_reference()

    print(json.dumps({
        "metric": "kmers_hashed_per_sec_per_chip",
        "value": round(device_rate),
        "unit": "kmers/s",
        "vs_baseline": round(device_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
