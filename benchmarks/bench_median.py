"""Median-of-N acceptance discipline (VERDICT r4 item 5).

Runs a JSON-record-emitting benchmark script N times back to back and
aggregates every numeric per-stage record into min/median/max — the
reference's own wall-clock discipline (run_profile.py:16-21) applied at
acceptance scale, replacing single best-case captures on this noisy
shared box.

Usage:
  python benchmarks/bench_median.py N script.py [args...]
Emits each run's records prefixed with {"run": i, ...} and a final
{"metric": "<stage>_agg", "median": .., "min": .., "max": ..} per stage.
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys


def main():
    n = int(sys.argv[1])
    script = sys.argv[2]
    args = sys.argv[3:]
    per_stage: dict[tuple, list] = {}
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, script, *args],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        if proc.returncode != 0:
            print(json.dumps({"metric": "run_failed", "run": i,
                              "rc": proc.returncode}), flush=True)
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            r["run"] = i
            print(json.dumps(r), flush=True)
            v = r.get("value")
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                per_stage.setdefault((r["metric"], r.get("unit")),
                                     []).append(float(v))
    for (metric, unit), vals in per_stage.items():
        print(json.dumps({
            "metric": f"{metric}_agg", "unit": unit, "n": len(vals),
            "min": min(vals), "median": statistics.median(vals),
            "max": max(vals)}), flush=True)


if __name__ == "__main__":
    main()
