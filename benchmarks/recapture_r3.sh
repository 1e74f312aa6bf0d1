#!/bin/bash
# Round-3 on-chip recapture: run the moment the axon relay returns.
# Each step under its own timeout; everything appends to the log.
# Usage: bash benchmarks/recapture_r3.sh [logfile]
set -u -o pipefail  # the relay-check gate pipes through tee
LOG="${1:-/tmp/recapture_r3.log}"
cd "$(dirname "$0")/.."

say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "package check (fresh containers lose the editable install)"
python -c "import graph_kmer_index_tpu" 2>/dev/null || \
    pip install -e . --no-deps --no-build-isolation -q | tee -a "$LOG"

say "relay check"
if ! python - <<'EOF' | tee -a "$LOG"
import socket, sys
up = False
for p in (2025, 2297):
    s = socket.socket(); s.settimeout(3)
    try:
        s.connect(("127.0.0.1", p)); print(p, "OPEN"); up = True
    except Exception as e:
        print(p, "DOWN", e)
    finally:
        s.close()
sys.exit(0 if up else 1)
EOF
then
    say "relay down — aborting (running the candidates would just burn timeouts)"
    exit 1
fi

say "1/5 headline bench (P8/P16 hashing)"
GKI_BENCH_KERNELS="u32,p8,p16" GKI_BENCH_BUDGET_S=420 timeout 540 \
    python bench.py 2>&1 | tee -a "$LOG"

say "2/5 bandwidth-ceiling controls (stream copy / sum / xla scale)"
timeout 900 python benchmarks/bench_primitives.py \
    stream_copy,stream_sum,xla_stream_scale 2>&1 | tee -a "$LOG"

say "2b/6 p16 config sweep (one process, cache-amortized compiles)"
timeout 1800 python benchmarks/bench_p16_sweep.py p16raw 2>&1 | tee -a "$LOG"
# pin the winner into the headline bench with:
#   GKI_BENCH_KERNELS="u32,p16:<rows>:<chunk>" python bench.py

say "3/5 packed lookup rates"
timeout 900 python benchmarks/bench_lookup.py 2>&1 | tail -30 | tee -a "$LOG"

say "4/5 build stages (fused compile units)"
timeout 900 python benchmarks/bench_build.py 2>&1 | tail -30 | tee -a "$LOG"

say "5/5 end-to-end 10Mb pipeline (device finalize)"
timeout 1800 python benchmarks/bench_pipeline.py 10000000 100000 10000 \
    --device-finalize 2>&1 | tee -a "$LOG"

say "6/6 serving path (sharded from_kmers steps, device-built table)"
timeout 900 python benchmarks/bench_serve.py 16000000 4194304 1 \
    2>&1 | tee -a "$LOG"

say "7/7 multi-chunk driver pipeline (dispatch-ahead vs serial)"
timeout 900 python benchmarks/bench_chunked.py 16000000 3 \
    2>&1 | tee -a "$LOG"

say "done — record results in BASELINE.md (builder-measured, relay-up)"
