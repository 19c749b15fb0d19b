#!/bin/bash
# Quiet-window watcher: probe the raw-CPU scaling ceiling with a
# SUSTAINED multi-second probe (round 5 — the 2 s burst probe reads
# ~3.9x on a host whose sustained ceiling is clamped to ~3.1x) every
# ~4 minutes; the first time the 8->32 sustained ratio reads >= THRESH
# with a near-idle loadavg, fire (a) the 1M-page 8->32 extraction
# scaling bench and (b) the 30k-page 4->16 substring-dedup legs, and
# append both to BENCH.md with the probe stamp. One-shot: exits after a
# successful in-window run or after MAX_PROBES attempts.
set -u
cd /root/repo
MAX_PROBES=${MAX_PROBES:-12}
THRESH=${THRESH:-3.80}
PROBE_SECONDS=${PROBE_SECONDS:-5.0}
OUT=/tmp/window_watch.log
for i in $(seq 1 "$MAX_PROBES"); do
  # read loadavg BEFORE the probe: the probe's own 32 processes push the
  # 1-min average past any idle gate for minutes (the 5 s sustained
  # probe made the post-probe read self-defeating)
  load=$(cut -d' ' -f1-3 /proc/loadavg)
  load1=$(cut -d' ' -f1 /proc/loadavg)
  ratio=$(python3 - "$PROBE_SECONDS" <<'EOF'
import sys
sys.path.insert(0, "tools")
from cpu_probe import measure
secs = float(sys.argv[1])
ops8 = measure(8, secs)
ops32 = measure(32, secs)
print(round(ops32 / ops8, 2))
EOF
)
  echo "$(date -u +%H:%M:%S) probe#$i sustained-8->32=$ratio pre-probe-loadavg=$load" >> "$OUT"
  ok=$(python3 -c "print(1 if float('$ratio') >= float('$THRESH') and float('$load1') < 1.5 else 0)")
  if [ "$ok" = "1" ]; then
    echo "window open (sustained $ratio) — running scaling benches" >> "$OUT"
    python3 scaling_bench.py --pages 1000000 --low 8 --high 32 \
      --workload extract > /tmp/window_scaling.json 2>/tmp/window_scaling.err
    python3 scaling_bench.py --pages 30000 --low 4 --high 16 \
      --workload substr > /tmp/window_substr.json 2>/tmp/window_substr.err
    if [ -s /tmp/window_scaling.json ] || [ -s /tmp/window_substr.json ]; then
      python3 - "$ratio" "$load" "$PROBE_SECONDS" <<'EOF'
import json, sys
ratio, load, secs = sys.argv[1], sys.argv[2], sys.argv[3]
def last_json(path):
    try:
        lines = [l for l in open(path) if l.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except OSError:
        return None
ext = last_json("/tmp/window_scaling.json")
sub = last_json("/tmp/window_substr.json")
with open("BENCH.md", "a") as f:
    f.write("\n## Scaling run: watcher-fired in-window (SUSTAINED probe)\n\n")
    f.write(f"(raw-CPU sustained probe 8->32 = {ratio}x of 4x ideal over "
            f"{secs}s/level at loadavg {load}, measured by "
            "tools/window_watch.sh immediately before the legs)\n\n")
    if ext:
        f.write("extraction+stats 8->32 (pages=1000000):\n```json\n"
                + json.dumps(ext) + "\n```\n")
    if sub:
        f.write("substring-dedup 4->16 (pages=30000):\n```json\n"
                + json.dumps(sub) + "\n```\n")
EOF
      git add BENCH.md && git commit -q -m "BENCH: watcher-fired in-window scaling reads (sustained probe)

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
