#!/bin/bash
# Session-long axon-relay watcher (VERDICT r4 item 1).
#
# Probes both relay ports every ~30 s for the whole builder session,
# appends every probe to relay_uptime.jsonl (gap-free evidence either
# way), and on the FIRST successful connect immediately fires the
# on-chip recapture suite (benchmarks/recapture_r3.sh) under timeout,
# then the headline bench.py so BENCH_r05-quality numbers exist even if
# the relay flaps back down later.
#
# Usage: bash benchmarks/relay_watch.sh [uptime_log] [recapture_log]
# Run in the background for the entire session:
#   nohup bash benchmarks/relay_watch.sh >/tmp/relay_watch.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
UPLOG="${1:-relay_uptime.jsonl}"
RECLOG="${2:-/tmp/recapture_r5.log}"
FIRED_MARK="/tmp/relay_watch_fired"

probe() {
    python3 - <<'EOF'
import socket, sys
up = False
for p in (2025, 2297):
    s = socket.socket(); s.settimeout(3)
    try:
        s.connect(("127.0.0.1", p)); up = True
    except Exception:
        pass
    finally:
        s.close()
sys.exit(0 if up else 1)
EOF
}

while true; do
    TS=$(date -u +%Y-%m-%dT%H:%M:%S+00:00)
    if probe; then
        echo "{\"t\": \"$TS\", \"up\": true}" >> "$UPLOG"
        if [ ! -e "$FIRED_MARK" ]; then
            touch "$FIRED_MARK"
            echo "=== relay UP at $TS — firing recapture ===" >> "$RECLOG"
            # Whole suite bounded; each step has its own timeout too.
            timeout 7200 bash benchmarks/recapture_r3.sh "$RECLOG" \
                >> "$RECLOG" 2>&1
            echo "=== recapture finished (rc=$?) at $(date -u +%H:%M:%S) ===" \
                >> "$RECLOG"
        fi
    else
        echo "{\"t\": \"$TS\", \"up\": false}" >> "$UPLOG"
    fi
    sleep 30
done
