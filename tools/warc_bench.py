"""WARC ingest throughput read (BENCH.md evidence, probe-free).

Generates N .warc.gz shards (member-per-record, deterministic bodies),
then measures:
  1. read_warc record scan + payload materialization (count + byte sum)
  2. the full ingest seam: read_warc -> warc_to_pages -> extract_text
     (byte-derived text) -> token-ish length agg

Prints one JSON line per stage. Usage:
    python tools/warc_bench.py [--files 32] [--recs 2000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--recs", type=int, default=2000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from prase_spark.warc import gzip_member, warc_record_bytes

    base = tempfile.mkdtemp(prefix="warc_bench_")
    n_docs = args.files * args.recs
    body_pad = ("lorem ipsum " * 40).strip()  # ~480 B text -> ~2.3 KB html
    t_gen = time.time()
    total_bytes = 0
    for f in range(args.files):
        parts = []
        for k in range(args.recs):
            doc = f * args.recs + k
            html = (
                f"<html><head><script>var x={doc};</script></head>"
                f"<body><h1>Doc {doc}</h1><p>{body_pad}</p>"
                f"<p>Alice works for Acme</p><div>{body_pad}</div>"
                f"</body></html>"
            ).encode()
            parts.append(
                gzip_member(
                    warc_record_bytes(
                        f"https://bench.org/{doc}",
                        f"2024-06-{1 + doc % 28:02d}T{doc % 24:02d}:00:00Z",
                        html,
                    )
                )
            )
        path = os.path.join(base, f"shard-{f:04d}.warc.gz")
        with open(path, "wb") as fh:
            data = b"".join(parts)
            fh.write(data)
            total_bytes += len(data)
    gen_s = time.time() - t_gen

    from prase_spark.config import get_spark
    from prase_spark.extract import extract_text
    from prase_spark.warc import read_warc, warc_to_pages

    spark = get_spark("warc_bench", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    glob = os.path.join(base, "*.warc.gz")

    try:
        from pyspark.sql import functions as F

        # warm-up: JVM codegen + OS page cache, untimed
        read_warc(spark, glob).count()

        # stage 1: record scan + payload bytes
        t0 = time.time()

        row = (
            read_warc(spark, glob)
            .agg(F.count("*").alias("n"), F.sum(F.length("html")).alias("b"))
            .collect()[0]
        )
        scan_s = time.time() - t0
        plan = read_warc(spark, glob)._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({
            "workload": f"read_warc {args.files} gz shards x {args.recs} recs",
            "docs": row["n"], "payload_bytes": int(row["b"]),
            "container_bytes": total_bytes, "gen_sec": round(gen_s, 1),
            "sec": round(scan_s, 2),
            "docs_per_sec": round(row["n"] / scan_s, 1),
            "container_mb_per_sec": round(total_bytes / 1e6 / scan_s, 1),
            "exchanges": plan.count("Exchange"), "cores": args.cores,
        }))
        assert row["n"] == n_docs, (row["n"], n_docs)

        # stage 2: full ingest seam to byte-derived text
        t0 = time.time()
        row = (
            extract_text(warc_to_pages(read_warc(spark, glob)))
            .agg(F.count("*").alias("n"), F.sum(F.length("text")).alias("c"))
            .collect()[0]
        )
        seam_s = time.time() - t0
        print(json.dumps({
            "workload": "read_warc -> warc_to_pages -> extract_text",
            "docs": row["n"], "text_chars": int(row["c"]),
            "sec": round(seam_s, 2),
            "docs_per_sec": round(row["n"] / seam_s, 1),
            "cores": args.cores,
        }))
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
