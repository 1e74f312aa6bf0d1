"""Genome-scale kill+resume rehearsal (VERDICT r4 item 8).

Drives the out-of-core build through the CLI front door
(``make_index_out_of_core --checkpoint-dir``) at >=500 Mb, SIGKILLs the
whole process group mid-find, re-runs the identical argv to completion,
runs an uninterrupted control build in a second directory, and asserts
the two shard checkpoints are bit-identical column by column — the
failure-recovery story at the scale it exists for (reference analog:
manual re-runs with start/stop_at_critical_path_number,
kmer_finder.py:92-93, command_line_interface.py:574-623).

Disk discipline: the interrupted run's find-checkpoint + spills are
deleted before the control run, so the peak is ~2 checkpoints + one
spill set, not everything at once.

Two modes: "findck" (default — `--checkpoint-dir` set, parent-streaming
spill, resume reloads find chunks from npz) and "spill" (worker-side
spill only: resume skips chunks straight from the spill journal, no
second row copy on disk).

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/bench_ooc_resume.py [n_bases] [n_variants] \
          [workdir] [n_ranges] [mode: findck|spill]
"""
from __future__ import annotations

import glob
import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def rec(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}),
          flush=True)


def cli_argv(graph_path, d, k, modulo, n_ranges, with_findck):
    argv = [sys.executable, "-m", "graph_kmer_index_tpu.cli",
            "make_index_out_of_core", "-g", graph_path, "-k", str(k),
            "-d", d, "-m", str(modulo), "-n", str(n_ranges),
            "-t", "4", "-v", "4"]
    if with_findck:
        argv += ["--checkpoint-dir", os.path.join(d, "findck")]
    return argv


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/root/ooc_resume"
    n_ranges = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    mode = sys.argv[5] if len(sys.argv) > 5 else "findck"
    assert mode in ("findck", "spill"), mode
    modulo = 452_930_477
    k = 31
    kill_fraction = 0.4

    from graph_kmer_index_tpu.utils.synthetic import random_snp_graph

    os.makedirs(workdir, exist_ok=True)
    graph_path = os.path.join(workdir, "graph.npz")
    t0 = time.perf_counter()
    if not os.path.exists(graph_path):
        graph, _ = random_snp_graph(n_bases, n_variants, seed=0,
                                    indel_fraction=0.1)
        graph.to_file(graph_path)
        del graph
    rec("graph_build", round(time.perf_counter() - t0, 1), "s",
        n_bases=n_bases, n_variants=n_variants)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    # -- run A: start, SIGKILL the process group mid-find, resume ---------
    a_dir = os.path.join(workdir, "A")
    os.makedirs(a_dir, exist_ok=True)
    findck = os.path.join(a_dir, "findck")
    argv = cli_argv(graph_path, a_dir, k, modulo, n_ranges,
                    mode == "findck")
    t0 = time.perf_counter()
    proc = subprocess.Popen(argv, env=env, start_new_session=True,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # the find pool writes one chunk npz per finished chunk; 4 workers x
    # 20 chunks/worker = 80 chunks total
    n_chunks_total = 80
    killed_at = None
    journal = os.path.join(a_dir, "spill", "journal.jsonl")

    def chunks_done():
        if mode == "findck":
            return len(glob.glob(os.path.join(findck, "chunk-*.npz")))
        try:
            with open(journal) as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    while proc.poll() is None:
        done = chunks_done()
        if done >= int(kill_fraction * n_chunks_total):
            os.killpg(proc.pid, signal.SIGKILL)
            killed_at = done
            break
        time.sleep(0.5)
    proc.wait()
    assert killed_at is not None, \
        "run finished before the kill point; raise n_bases"
    rec("killed_mid_find", round(time.perf_counter() - t0, 1), "s",
        chunks_done=killed_at, of=n_chunks_total,
        spilled=len(glob.glob(os.path.join(a_dir, "spill", "*.bin"))))

    t0 = time.perf_counter()
    subprocess.run(argv, env=env, check=True)
    t_resume = time.perf_counter() - t0
    rec("resumed_to_completion", round(t_resume, 1), "s")

    # free the resume machinery before the control run (disk budget)
    shutil.rmtree(findck, ignore_errors=True)
    shutil.rmtree(os.path.join(a_dir, "spill"), ignore_errors=True)

    # -- run B: uninterrupted control -------------------------------------
    b_dir = os.path.join(workdir, "B")
    os.makedirs(b_dir, exist_ok=True)
    t0 = time.perf_counter()
    subprocess.run(cli_argv(graph_path, b_dir, k, modulo, n_ranges, False),
                   env=env, check=True)
    t_clean = time.perf_counter() - t0
    shutil.rmtree(os.path.join(b_dir, "spill"), ignore_errors=True)
    rec("clean_control_run", round(t_clean, 1), "s")

    # -- bit-identity of the two checkpoints, shard by shard --------------
    from graph_kmer_index_tpu.parallel import checkpoint as ckpt
    pa = os.path.join(a_dir, "index")
    pb = os.path.join(b_dir, "index")
    t0 = time.perf_counter()
    with np.load(ckpt.manifest_path(pa)) as za, \
            np.load(ckpt.manifest_path(pb)) as zb:
        assert set(za.files) == set(zb.files)
        for name in za.files:
            assert np.array_equal(za[name], zb[name]), name
        n_table = int(za["n_table"])
        total_rows = int(za["shard_rows"].sum())
    for t in range(n_table):
        with np.load(ckpt.shard_path(pa, t, n_table)) as za, \
                np.load(ckpt.shard_path(pb, t, n_table)) as zb:
            assert set(za.files) == set(zb.files), t
            for name in za.files:
                assert np.array_equal(za[name], zb[name]), (t, name)
    rec("kill_resume_bit_identity", round(time.perf_counter() - t0, 1),
        "s", n_shards=n_table, rows=total_rows, ok=True)
    rec("ooc_resume_acceptance", n_bases, "bases", rows=total_rows,
        resumed_s=round(t_resume, 1), clean_s=round(t_clean, 1), ok=True)


if __name__ == "__main__":
    main()
