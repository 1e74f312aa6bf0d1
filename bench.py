"""Headline benchmark: k-mer hashing throughput per chip (k=31).

This is the hot kernel of the whole framework — every finder, read mapper
and index build goes through sliding-window hashing (the reference's
``np.convolve(seq, power_array(k))`` hot path, read_kmers.py:68-70 /
kmer_finder.py:350-352). Baseline = the reference's numpy convolve method
measured on this host's CPU. Prints json lines of the form
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}; the LAST such
line is the result (records are re-emitted after every measurement event,
success or failure, so the last line of combined output always parses).

Hardening contract (round-2 postmortem: BENCH_r02.json was rc=124 with
no parseable line because every candidate timed out and an in-process
fallback wedged inside a C call where SIGALRM cannot fire):
  * the PARENT process never imports jax and never talks to the device —
    every measurement (CPU baseline included) runs in a subprocess with a
    parent-owned hard timeout;
  * a provisional record is printed the moment the CPU baseline exists,
    and the current-best record is re-printed after every candidate, so
    "last line wins" parsing can never come up empty;
  * the total budget (GKI_BENCH_BUDGET_S, default 420 s) leaves >= 60 s
    of margin under the driver's own timeout, and the relay is
    TCP-prechecked so a dead backend costs seconds, not the budget;
  * a down relay is POLLED for the whole budget (minus a measurement
    floor) instead of abandoned after two retries — if it flaps up
    mid-window, measurement starts within ~15 s of the first successful
    connect (round-3 postmortem: the relay was down at capture time and
    the old 40 s give-up made the round's number a guaranteed zero);
  * every relay probe is appended, timestamped, to relay_uptime.jsonl so
    the perf history can distinguish "kernel regressed" from "infra
    down" from artifacts alone;
  * after a successful roofline measurement a stream-copy HBM-bandwidth
    control runs in the same budget and its rate is embedded in the
    headline record (effective bytes/s over measured stream bytes/s), so
    the roofline fraction is auditable from BENCH_rN.json alone.
"""
import datetime
import json
import os
import socket
import subprocess
import sys
import time

K = 31
N_DEVICE = 1 << 24   # bases hashed per device iteration
N_CPU = 1 << 20      # bases for the CPU reference measurement
REPS = 16
METRIC = "kmers_hashed_per_sec_per_chip"
RELAY_PORTS = (2025, 2297)
RELAY_LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "relay_uptime.jsonl")

# Approximate HBM traffic per base of the TIMED CHAIN, used only to
# express the headline rate as a fraction of the measured stream-copy
# bandwidth. Accounting (ops/encode.py kernel docstrings + the int8
# chain carrier): p16 kernel = 1 B in + 4 B out; p8 = 1 B in + 2 B out;
# the chain body's read-modify-write of the int8 carrier adds ~2 B/base
# (the consumer xor fuses into the kernel output read).
CHAIN_BYTES_PER_BASE = {"p16": 7.0, "p16raw": 7.0, "p8": 5.0}


# ---------------------------------------------------------------------------
# child-process measurement modes (the only code that imports jax)
# ---------------------------------------------------------------------------

def _median_time(fn, reps=REPS):
    import numpy as np
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
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graph_kmer_index_tpu.ops.encode import (
        sliding_hashes, sliding_hashes_pallas, sliding_hashes_pallas_p16,
        sliding_hashes_u32)

    rng = np.random.default_rng(0)
    # int8 carrier: the chain's own read-modify-write of the sequence is
    # harness overhead, not kernel work — at 1 byte/base it costs 2 of
    # the ~7 bytes/base total instead of 5 of 10 with an int32 carrier
    # (the kernels cast internally either way)
    seq = jnp.asarray(rng.integers(0, 4, N_DEVICE).astype(np.int8))

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
            return (p16 & 3).astype(jnp.int8)
        if kernel.startswith("p16"):
            # roofline variant: int8 input, one u32/lane output; the
            # (lo, hi) derivation fuses into the consumer xor here
            opts = {}
            if ":" in kernel:
                _, rows, chunk = kernel.split(":")
                opts = dict(rows_per_block=int(rows), chunk=int(chunk))
            lo, hi = sliding_hashes_pallas_p16(s, K, **opts)
            return ((lo ^ hi) & 3).astype(jnp.int8)
        if kernel.startswith("p8"):
            # half the output bytes of p16 (u16 P8 per position); the
            # four-slice lane derivation fuses into the consumer xor
            from graph_kmer_index_tpu.ops.encode import (
                sliding_hashes_pallas_p8)
            opts = {}
            if ":" in kernel:
                _, rows, chunk = kernel.split(":")
                opts = dict(rows_per_block=int(rows), chunk=int(chunk))
            lo, hi = sliding_hashes_pallas_p8(s, K, **opts)
            return ((lo ^ hi) & 3).astype(jnp.int8)
        if kernel == "pallas":
            lo, hi = sliding_hashes_pallas(s, K)
            return ((lo ^ hi) & 3).astype(jnp.int8)
        if kernel == "u32":
            lo, hi = sliding_hashes_u32(s, K)
            return ((lo ^ hi) & 3).astype(jnp.int8)
        return (sliding_hashes(s, K) & 3).astype(jnp.int8)

    @jax.jit
    def chain(s, reps):
        # traced trip count -> ONE compile serves both chain lengths
        def body(i, x):
            return ((x + apply(x)) & 3).astype(jnp.int8)
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


def bench_cpu_reference(n=N_CPU):
    """The reference implementation's own vectorized hot path:
    np.convolve(numeric_seq, power_array(k)) (reference read_kmers.py:68-70).
    Runs in a JAX_PLATFORMS=cpu subprocess (power_array is pure numpy, but
    the package import pulls in jax — the parent must stay jax-free)."""
    import numpy as np
    from graph_kmer_index_tpu.hashing import power_array

    seq = np.random.randint(0, 4, n).astype(np.uint64)
    pa = power_array(K)

    def run():
        np.convolve(seq, pa, mode="valid")

    run()
    return n / _median_time(run, reps=3)


# ---------------------------------------------------------------------------
# parent-process orchestration (jax-free by construction)
# ---------------------------------------------------------------------------

def _run_child(args, timeout_s, env=None):
    """Run a child bench mode; return its reported rate or None."""
    if timeout_s <= 5:
        return None
    try:
        out = subprocess.run(
            [sys.executable, __file__] + args,
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        print(f"[bench] {args}: timed out after {timeout_s:.0f}s",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["rate"])
        except (ValueError, KeyError):
            continue
    print(f"[bench] {args}: no rate (stderr tail: "
          f"{out.stderr.strip().splitlines()[-1:] })",
          file=sys.stderr, flush=True)
    return None


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _relay_up(timeout_s=3.0):
    """True iff the axon relay accepts TCP on at least one known port.

    Connection-refused and connect-timeout both count as down: the former
    is a dead relay, the latter a black-holed one — in either case a
    device subprocess would burn its whole timeout for nothing."""
    host = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
    for port in RELAY_PORTS:
        s = socket.socket()
        s.settimeout(timeout_s)
        try:
            s.connect((host, port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def _log_probe(up: bool, note: str = ""):
    """Append a timestamped relay probe to relay_uptime.jsonl (the
    committed uptime history; best-effort — a read-only checkout must
    not break the bench)."""
    rec = {"t": datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"), "up": bool(up)}
    if note:
        rec["note"] = note
    try:
        with open(RELAY_LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass


def _stream_control(timeout_s):
    """Measured achievable HBM bandwidth (bytes/s moved, read+write) via
    the Pallas stream-copy control in benchmarks/bench_primitives.py.
    Returns None on failure."""
    prim = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "bench_primitives.py")
    if timeout_s <= 5 or not os.path.exists(prim):
        return None
    try:
        out = subprocess.run(
            [sys.executable, prim, "--only", "stream_copy"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"[bench] stream control timed out after {timeout_s:.0f}s",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["rate"])
        except (ValueError, KeyError):
            continue
    return None


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--kernel":
        print(json.dumps({"rate": measure_kernel(sys.argv[2])}))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--cpu-baseline":
        print(json.dumps({"rate": bench_cpu_reference()}))
        return

    # global deadline: the driver gives this script a bounded budget and
    # parses the last JSON line of the combined output; worst-case
    # per-candidate timeouts must never add up past it (observed with a
    # degraded remote compile helper: one XLA compile can eat 10+ min)
    budget_s = float(os.environ.get("GKI_BENCH_BUDGET_S", "420"))
    deadline = time.monotonic() + budget_s

    # persistent XLA compile cache for every child: a kernel compiled in
    # an earlier run (e.g. the recapture script the moment the relay
    # returned) is a cache hit here, so a late relay return still fits a
    # roofline measurement in the window. Harmless if the backend can't
    # serialize executables — jax skips caching silently.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    def remaining():
        return deadline - time.monotonic()

    state = {"metric": METRIC, "value": 0, "unit": "kmers/s",
             "vs_baseline": 0.0,
             "error": "no device measurement yet"}

    def emit():
        # stdout AND stderr are interleaved in the driver's tail: the
        # record must be re-printed after every event so it is always
        # the final line
        print(json.dumps(state), flush=True)

    # CPU baseline first (subprocess, forced-cpu env): seconds of work,
    # and it guarantees the vs_baseline denominator exists whatever the
    # device side does
    cpu_rate = _run_child(["--cpu-baseline"],
                          min(120, remaining() - 30), env=_cpu_env())
    if not cpu_rate:
        state["error"] = "cpu baseline failed; no measurements"
        # keep a distinct, un-popped marker: a later device success must
        # not masquerade as a clean 0x-speedup measurement
        state["baseline_error"] = "cpu baseline failed; vs_baseline unknown"
        cpu_rate = None
    emit()

    def record(kernel, rate):
        if rate is None:
            emit()   # failure: re-assert the current best as last line
            return
        # per-candidate event record: makes kernel A/Bs (p8 vs p16)
        # auditable from the artifact even when only the best becomes
        # the headline; never the last line (emit() always follows)
        print(json.dumps({"metric": "candidate_rate", "kernel": kernel,
                          "value": round(rate), "unit": "kmers/s"}),
              flush=True)
        if rate > state["value"]:
            state.update(value=round(rate),
                         vs_baseline=(round(rate / cpu_rate, 2)
                                      if cpu_rate else 0.0))
            state.pop("error", None)
            state["kernel"] = kernel
        emit()

    # relay precheck: a dead/black-holed relay must not eat per-candidate
    # timeouts — but it must be POLLED for the whole budget, because a
    # relay that returns mid-window is the difference between a real
    # number and a zero (round-3 postmortem). Keep polling until only the
    # minimum measurement floor remains; start measuring the moment a
    # connect succeeds.
    poll_floor_s = 130   # enough for one u32 (pure-XLA) measurement
    t_poll0 = time.monotonic()
    up = _relay_up()
    _log_probe(up, note="bench start")
    last_emit = time.monotonic()
    while not up and remaining() > poll_floor_s:
        time.sleep(min(15, max(1, remaining() - poll_floor_s)))
        up = _relay_up()
        _log_probe(up)
        if time.monotonic() - last_emit > 60:
            emit()   # keep the last line fresh/parseable during the wait
            last_emit = time.monotonic()
    waited = time.monotonic() - t_poll0
    if not up:
        if state["value"] == 0:
            state["error"] = (
                f"axon relay down for the whole budget (polled "
                f"{waited:.0f}s, TCP connect failed throughout); no "
                f"on-chip measurement this run")
        emit()
        return
    if waited > 20:
        state["relay_wait_s"] = round(waited)
        _log_probe(True, note=f"relay up after {waited:.0f}s poll")

    kernels = os.environ.get(
        "GKI_BENCH_KERNELS", "u32,p8,p16,pallas").split(",")

    def _base(name):
        return name.split(":")[0]  # "p16:32:2048" -> "p16"

    done = set()   # exact entries (incl. pinned configs) that measured
    for pos, kernel in enumerate(kernels):
        if _base(kernel) == "pallas" and any(
                _base(d) in ("p8", "p16") for d in done):
            break  # a roofline variant measured: pallas cannot beat it
        # floor-first ordering: u32 is XLA-only (cheapest compile) and
        # guarantees a line; the roofline kernels (p8/p16, pinned
        # configs included) split the remaining budget evenly; pallas
        # only runs if all of them failed. u32 is capped low — if the
        # helper can't compile plain XLA in 120s it won't compile a
        # Pallas kernel either, so hoarding budget for the roofline
        # kernels after a u32 timeout would be wasted.
        if _base(kernel) == "u32":
            # when the relay returned late and the window is short, the
            # floor kernel gets nearly everything (one number beats
            # timing out two candidates)
            t = (min(120, remaining() - 120) if remaining() > 240
                 else min(115, remaining() - 15))
        else:
            n_left = max(1, sum(1 for x in kernels[pos:]
                                if _base(x) in ("p8", "p16")))
            # leave ~60 s for the stream-bandwidth control when the
            # window allows it
            reserve = 75 if remaining() > 200 else 15
            t = (remaining() - reserve) / n_left
        rate = _run_child(["--kernel", kernel], t)
        if rate is not None:
            done.add(kernel)
        record(kernel, rate)
    for kernel in kernels:
        # a roofline compile timed out once; a second attempt often hits
        # a less-loaded helper and it is ~2.5x+ the fallback kernel.
        # Retry only entries the user actually listed.
        if (_base(kernel) in ("p8", "p16") and kernel not in done
                and remaining() > 60):
            record(kernel,
                   _run_child(["--kernel", kernel], remaining() - 15))
    if not done and state["value"] == 0:
        state["error"] = ("relay accepted TCP but every device candidate "
                          "timed out (wedged backend / degraded compile "
                          "helper); no on-chip measurement this run")
        emit()
        return

    # roofline auditability: measure achievable HBM bandwidth with the
    # Pallas stream-copy control and embed it in the headline record, so
    # "fraction of achievable BW" is computable from BENCH_rN.json alone
    if done and remaining() > 70:
        bw = _stream_control(min(150, remaining() - 15))
        _log_probe(True, note=(f"stream control "
                               f"{'ok' if bw else 'failed'}"))
        if bw:
            state["stream_copy_bytes_per_sec"] = round(bw)
            bpb = CHAIN_BYTES_PER_BASE.get(
                _base(state.get("kernel", "")))
            if bpb:
                state["chain_bytes_per_base"] = bpb
                state["frac_of_stream_bw"] = round(
                    state["value"] * bpb / bw, 3)
            emit()


if __name__ == "__main__":
    main()
