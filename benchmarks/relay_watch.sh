#!/bin/bash
# Session-long axon-relay watcher (VERDICT r4 item 1).
#
# Probes BOTH relay ports every ~30 s for the whole builder session,
# appends every probe to relay_uptime.jsonl (gap-free evidence either
# way), and when both ports accept, fires the on-chip recapture suite
# (benchmarks/recapture_r3.sh) under timeout. Requiring both ports
# matters: a half-up relay hangs jits (CLAUDE.md) and must not burn the
# attempt. A FAILED recapture retries after a 30 min cooldown instead
# of permanently consuming the one automatic capture opportunity.
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
    python3 - <<'PYEOF'
import socket, sys
ok = 0
for p in (2025, 2297):
    s = socket.socket(); s.settimeout(3)
    try:
        s.connect(("127.0.0.1", p)); ok += 1
    except Exception:
        pass
    finally:
        s.close()
sys.exit(0 if ok == 2 else 1)
PYEOF
}

while true; do
    TS=$(date -u +%Y-%m-%dT%H:%M:%S+00:00)
    if probe; then
        echo "{\"t\": \"$TS\", \"up\": true}" >> "$UPLOG"
        NOW=$(date +%s)
        LAST=0; RC_PREV=1
        if [ -e "$FIRED_MARK" ]; then
            read -r LAST RC_PREV < "$FIRED_MARK" || true
        fi
        if [ "$RC_PREV" != "0" ] && [ $((NOW - LAST)) -ge 1800 ]; then
            echo "$NOW 1" > "$FIRED_MARK"
            echo "=== relay UP at $TS — firing recapture ===" >> "$RECLOG"
            # Whole suite bounded; each step has its own timeout too.
            timeout 7200 bash benchmarks/recapture_r3.sh "$RECLOG" \
                >> "$RECLOG" 2>&1
            RC=$?
            echo "$(date +%s) $RC" > "$FIRED_MARK"
            echo "=== recapture finished (rc=$RC) at $(date -u +%H:%M:%S) ===" \
                >> "$RECLOG"
        fi
    else
        echo "{\"t\": \"$TS\", \"up\": false}" >> "$UPLOG"
    fi
    sleep 30
done
