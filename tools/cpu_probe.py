"""Spark-free CPU-throughput probe: measures this VM's aggregate compute
scaling across process counts, establishing the HARDWARE ceiling any
Spark N->4N measurement on this box is bounded by (BENCH.md cites it to
justify measuring 4->16 instead of 8->32).

Usage: python tools/cpu_probe.py [--levels 4,8,16,32] [--seconds 3]
Appends nothing; prints one JSON line per level plus the ratios.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(args):
    seconds, = args
    end = time.time() + seconds
    ops = 0
    x = 1
    while time.time() < end:
        for _ in range(100_000):
            x = (x * 1000003 + 17) % 2305843009213693951
        ops += 100_000
    return ops


def measure(n_proc: int, seconds: float) -> int:
    with mp.Pool(n_proc) as pool:
        return sum(pool.map(_burn, [(seconds,)] * n_proc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="4,8,16,32")
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for n in levels:
        ops = measure(n, args.seconds)
        results[n] = ops
        print(json.dumps({"procs": n, "ops": ops, "mops": round(ops / 1e6, 1)}))
    base = levels[0]
    ratios = {
        f"{base}->{n}": round(results[n] / results[base], 2) for n in levels[1:]
    }
    if 8 in results and 32 in results:
        ratios["8->32"] = round(results[32] / results[8], 2)
    if 4 in results and 16 in results:
        ratios["4->16"] = round(results[16] / results[4], 2)
    print(json.dumps({"ratios": ratios}))


if __name__ == "__main__":
    main()
