#!/bin/bash
# Watch for quiet host windows (pure-CPU 8->32 ceiling probe) and use
# them for the two outstanding pristine-window measurements:
#   * probe >= HEADLINE_T and headline not yet captured -> one bench.py
#     attempt; keep it if accepted with ceilings >= 0.9 both sides.
#   * probe >= SCALING_T -> one 8->32 strong-scaling attempt (restoring
#     BENCH/BASELINE.md afterwards so a lone 8:32 run cannot clobber
#     the authoritative 2:8 block), then exit.
# The probe is ~10 s of CPU per interval; if the box is busy (including
# with our own work) the probe reads low and nothing fires.
# Usage: scripts/scaling_watchdog.sh [scaling_t] [interval_sec] [max_probes] [headline_t]
set -u
cd "$(dirname "$0")/.."
SCALING_T=${1:-0.95}
INTERVAL=${2:-600}
MAXPROBES=${3:-30}
HEADLINE_T=${4:-0.93}
HEADLINE_DONE=0
for i in $(seq 1 "$MAXPROBES"); do
  C=$(python - <<'EOF'
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
from bench_scaling import cpu_ceiling
print(round(cpu_ceiling(8, 32), 3))
EOF
)
  echo "$(date -u +%H:%M:%S) probe $i/$MAXPROBES ceiling=$C (headline>=$HEADLINE_T done=$HEADLINE_DONE, scaling>=$SCALING_T)"
  SOK=$(python -c "print(1 if float('$C') >= float('$SCALING_T') else 0)")
  HOK=$(python -c "print(1 if float('$C') >= float('$HEADLINE_T') else 0)")
  if [ "$SOK" = "1" ]; then
    echo "$(date -u +%H:%M:%S) pristine window -- firing 8->32 attempt"
    DCS_SCALING_PAIRS=8:32 DCS_SCALING_ATTEMPTS=1 \
      python scripts/bench_scaling.py 20000000 | tee /tmp/watchdog_scaling_out.log
    RC=$?
    git checkout -- BENCH/BASELINE.md
    grep '"attempt_result"' /tmp/watchdog_scaling_out.log >> BENCH/SCALING_ATTEMPTS_r5.jsonl
    echo "WATCHDOG_FIRED_SCALING_$RC"
    exit 0
  fi
  if [ "$HOK" = "1" ] && [ "$HEADLINE_DONE" = "0" ]; then
    echo "$(date -u +%H:%M:%S) good window -- one headline bench attempt"
    DCS_BENCH_ATTEMPTS=1 python bench.py > /tmp/watchdog_bench.json 2>/tmp/watchdog_bench.log
    KEEP=$(python - <<'EOF'
import json
try:
    a = json.load(open('/tmp/watchdog_bench.json'))
    p = a['protocol']
    if p['accepted'] and p['ceiling_pre'] >= 0.9 and p['ceiling_post'] >= 0.9:
        print(1)
    elif p['accepted']:
        # bench-protocol-accepted but under the 0.9 bar: bank the best
        # full-queryset accepted run separately, keep hunting
        try:
            old = json.load(open('BENCH/HEADLINE_r5_FULLSET.json'))['value']
        except Exception:
            old = 1e18
        if a['value'] < old:
            json.dump(a, open('BENCH/HEADLINE_r5_FULLSET.json', 'w'))
        print(2)
    else:
        print(0)
except Exception:
    print(0)
EOF
)
    if [ "$KEEP" = "1" ]; then
      cp /tmp/watchdog_bench.json BENCH/HEADLINE_r5_ACCEPTED.json
      HEADLINE_DONE=1
      echo "WATCHDOG_HEADLINE_KEPT"
    elif [ "$KEEP" = "2" ]; then
      echo "accepted-but-sub-0.9 window banked to HEADLINE_r5_FULLSET.json"
    else
      python - <<'EOF' || true
import json
try:
    a = json.load(open('/tmp/watchdog_bench.json'))
    rec = {"note": "watchdog headline attempt, window not clean enough",
           "result_protocol": a["protocol"], "value": a["value"]}
    with open('BENCH/HEADLINE_r5_RETRIES.jsonl', 'a') as f:
        f.write(json.dumps(rec) + "\n")
except Exception as e:
    print("retry-log failed:", e)
EOF
      echo "headline attempt not clean enough; logged"
    fi
  fi
  sleep "$INTERVAL"
done
echo "WATCHDOG_EXHAUSTED"
