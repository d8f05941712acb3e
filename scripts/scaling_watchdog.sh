#!/bin/bash
# Watch for a pristine host window (pure-CPU 8->32 ceiling >= threshold),
# then fire ONE strong-scaling attempt at that pair. The probe is ~10 s of
# CPU every interval; if the box is busy (including with our own work) the
# probe reads low and the run does not fire -- self-protecting.
# Usage: scripts/scaling_watchdog.sh [threshold] [interval_sec] [max_probes]
set -u
cd "$(dirname "$0")/.."
THRESH=${1:-0.95}
INTERVAL=${2:-600}
MAXPROBES=${3:-30}
for i in $(seq 1 "$MAXPROBES"); do
  C=$(python - <<'EOF'
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
from bench_scaling import cpu_ceiling
print(round(cpu_ceiling(8, 32), 3))
EOF
)
  echo "$(date -u +%H:%M:%S) probe $i/$MAXPROBES ceiling=$C (threshold $THRESH)"
  OK=$(python -c "print(1 if float('$C') >= float('$THRESH') else 0)")
  if [ "$OK" = "1" ]; then
    echo "$(date -u +%H:%M:%S) pristine window detected -- firing 8->32 attempt"
    # bench_scaling rewrites BENCH/BASELINE.md for the pairs it ran; a lone
    # 8:32 run must not clobber the authoritative 2:8 block, so capture the
    # attempt JSON from stdout and restore BASELINE.md afterwards.
    DCS_SCALING_PAIRS=8:32 DCS_SCALING_ATTEMPTS=1 \
      python scripts/bench_scaling.py 20000000 | tee /tmp/watchdog_scaling_out.log
    RC=$?
    git checkout -- BENCH/BASELINE.md
    grep '"attempt_result"' /tmp/watchdog_scaling_out.log >> BENCH/SCALING_ATTEMPTS_r5.jsonl
    echo "WATCHDOG_FIRED_$RC"
    exit 0
  fi
  sleep "$INTERVAL"
done
echo "WATCHDOG_EXHAUSTED"
