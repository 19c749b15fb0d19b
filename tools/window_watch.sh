#!/bin/bash
# Quiet-window watcher: probe the raw-CPU 8->32 scaling ceiling every
# ~4 minutes; the first time it reads >= 3.80x (of 4x ideal), fire the
# 1M-page 8->32 extraction scaling bench and append the result to
# BENCH.md with the probe stamp. One-shot: exits after a successful
# in-window run or after MAX_PROBES attempts.
set -u
cd /root/repo
MAX_PROBES=${MAX_PROBES:-12}
THRESH=${THRESH:-3.80}
OUT=/tmp/window_watch.log
for i in $(seq 1 "$MAX_PROBES"); do
  ratio=$(python3 - <<'EOF'
import sys
sys.path.insert(0, "tools")
from cpu_probe import measure
ops8 = measure(8, 2.0)
ops32 = measure(32, 2.0)
print(round(ops32 / ops8, 2))
EOF
)
  load=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "$(date -u +%H:%M:%S) probe#$i 8->32=$ratio loadavg=$load" >> "$OUT"
  # the probe alone is not enough: under concurrent load it measures
  # RELATIVE throughput on a busy box (it read 3.81x mid-bench once) —
  # require a near-idle 1-min loadavg as well before firing
  load1=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if float('$ratio') >= float('$THRESH') and float('$load1') < 1.5 else 0)")
  if [ "$ok" = "1" ]; then
    echo "window open ($ratio) — running scaling bench" >> "$OUT"
    python3 scaling_bench.py --pages 1000000 --low 8 --high 32 \
      --workload extract > /tmp/window_scaling.json 2>/tmp/window_scaling.err
    if [ -s /tmp/window_scaling.json ]; then
      python3 - "$ratio" "$load" <<'EOF'
import json, sys
ratio, load = sys.argv[1], sys.argv[2]
lines = [l for l in open("/tmp/window_scaling.json") if l.strip().startswith("{")]
rec = json.loads(lines[-1])
legs = rec.get("legs") or rec.get("results") or rec
with open("BENCH.md", "a") as f:
    f.write("\n## Scaling run: extraction+stats, watcher-fired in-window "
            "(pages=1000000)\n\n")
    f.write(f"(raw-CPU probe 8->32 = {ratio}x of 4x ideal at loadavg {load}, "
            "measured by tools/window_watch.sh immediately before launch)\n\n")
    f.write("```json\n" + json.dumps(rec) + "\n```\n")
EOF
      git add BENCH.md && git commit -q -m "BENCH: watcher-fired in-window 8->32 scaling read at 1M pages

No-Verification-Needed: doc-only BENCH.md append" \
        && echo "committed" >> "$OUT"
    else
      echo "bench produced no output; see /tmp/window_scaling.err" >> "$OUT"
    fi
    exit 0
  fi
  sleep 240
done
echo "no window within $MAX_PROBES probes" >> "$OUT"
