"""Scaling-efficiency evidence (north_rule): the same job on the same input
at two parallelism levels (local[8] vs local[32] — the sandbox stand-in for
N vs 4N executors). Reports docs/sec at both plus efficiency = (T8/T32)/4.

Each run is a fresh subprocess/JVM so no JIT/cache warmth leaks between
levels. Results are appended to BENCH.md.

Usage: python scaling_bench.py [--pages 20000] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKLOAD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from prase_spark.config import get_spark

cpus = int(sys.argv[1])
n_pages = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

from prase_spark.extract import extract_triples
from prase_spark.fixtures import pages_fixture

pages, _ = pages_fixture(spark, n_pages=n_pages)
pages = pages.repartition(cpus * 2).cache()
pages.count()  # materialize outside the timed window

t0 = time.time()
n_triples = extract_triples(pages).count()
elapsed = time.time() - t0
print(json.dumps({{"cpus": cpus, "pages": n_pages, "triples": n_triples,
                   "sec": round(elapsed, 3),
                   "docs_per_sec": round(n_pages / elapsed, 1)}}))
spark.stop()
"""


def run_level(repo: str, cpus: int, pages: int) -> dict:
    script = WORKLOAD.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(pages)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.abspath(__file__))

    lo = run_level(repo, args.low, args.pages)
    hi = run_level(repo, args.high, args.pages)
    ratio = args.high / args.low
    efficiency = (lo["sec"] / hi["sec"]) / ratio
    result = {
        "workload": "page->triple extraction (mapInPandas, Arrow)",
        "low": lo,
        "high": hi,
        "speedup": round(lo["sec"] / hi["sec"], 3),
        "efficiency_n_to_4n": round(efficiency, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(repo, "BENCH.md"), "a", encoding="utf8") as f:
        f.write(
            f"\n## Scaling run (pages={args.pages})\n\n"
            f"| cores | sec | docs/sec |\n|---|---|---|\n"
            f"| {lo['cpus']} | {lo['sec']} | {lo['docs_per_sec']} |\n"
            f"| {hi['cpus']} | {hi['sec']} | {hi['docs_per_sec']} |\n\n"
            f"speedup {result['speedup']}x over {ratio:.0f}x cores -> "
            f"**scaling efficiency {result['efficiency_n_to_4n']}** "
            f"(target >= 0.8 per BASELINE.json)\n"
        )


if __name__ == "__main__":
    main()
