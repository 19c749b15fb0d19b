"""Throughput + plan read for the round-5 crawl surfaces:

  1. parse_feeds       (RSS+Atom entry mining over feed bodies)
  2. extract_hreflang + extract_og_properties  (head-declaration scans)
  3. page_identity     (canonical/og:url/redirect signals -> one CC)
  4. fact_history      (gaps-and-islands fact versioning at volume)

Everything synthesized NATIVELY (spark.range -> concat projections,
zero Python) so the measured cost is the operator under test; each
stage prints one BENCH.md-format JSON line with its Exchange count.

Usage: python tools/crawlsurf_bench.py [n_pages] [n_facts]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prase_spark.config import get_spark


def n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def synth_feed_bodies(spark, n_feeds: int, n_items: int):
    i = F.col("id")
    host = F.concat(F.lit("h"), (i % 50000).cast("string"), F.lit(".org"))
    parts = [F.lit('<rss version="2.0"><channel><title>C</title>')]
    for j in range(n_items):
        parts += [
            F.lit("<item><title>Post "), ((i + j) % 997).cast("string"),
            F.lit(" &amp; more</title><link>https://h"),
            (i % 50000).cast("string"), F.lit(".org/a"),
            ((i * 31 + j) % 100000).cast("string"),
            F.lit("</link><guid>g"), ((i * 31 + j)).cast("string"),
            F.lit("</guid><pubDate>Mon, 0"), (1 + (i + j) % 9).cast("string"),
            F.lit(" Jan 2024 00:00:00 GMT</pubDate></item>"),
        ]
    parts.append(F.lit("</channel></rss>"))
    atom_parts = [F.lit("<feed><title>F</title>")]
    for j in range(n_items):
        atom_parts += [
            F.lit('<entry><title>E</title><link href="https://h'),
            (i % 50000).cast("string"), F.lit(".org/e"),
            ((i * 17 + j) % 100000).cast("string"),
            F.lit('"/><id>t:'), ((i * 17 + j)).cast("string"),
            F.lit("</id><updated>2024-01-01T00:00:00Z</updated></entry>"),
        ]
    atom_parts.append(F.lit("</feed>"))
    body = F.when(i % 2 == 0, F.concat(*parts)).otherwise(F.concat(*atom_parts))
    return spark.range(0, n_feeds).select(host.alias("host"), body.alias("body"))


def synth_head_pages(spark, n_pages: int):
    """Pages whose heads declare hreflang triples + OG cards — the
    head-scan workload (3 hreflang links + 4 og metas + noise each)."""
    i = F.col("id")
    g = (i / 3).cast("long").cast("string")
    url = F.concat(
        F.lit("https://h"), (i % 50000).cast("string"),
        F.lit(".example.org/l"), (i % 3).cast("string"),
        F.lit("/p"), g, F.lit(".html"),
    )
    html = F.concat(
        F.lit("<html><head>"),
        F.lit('<link rel="alternate" hreflang="en" href="/l0/p'), g,
        F.lit('.html"><link rel="alternate" hreflang="fr" href="/l1/p'), g,
        F.lit('.html"><link rel="alternate" hreflang="de" href="/l2/p'), g,
        F.lit('.html">'),
        F.lit('<meta property="og:title" content="Title '), g, F.lit('">'),
        F.lit('<meta property="og:type" content="article">'),
        F.lit('<meta property="og:url" content="https://c.org/'), g,
        F.lit('"><meta property="og:image" content="https://img/i'), g,
        F.lit('.png">'),
        F.lit('<link rel="stylesheet" href="/s.css">'),
        F.lit("</head><body><p>"),
        F.lit("page body filler text " * 30),
        F.lit("</p></body></html>"),
    )
    return spark.range(0, n_pages).select(
        url.alias("url"), F.encode(html, "utf-8").alias("html")
    )


def synth_facts(spark, n_facts: int):
    i = F.col("id")
    return spark.range(0, n_facts).select(
        F.concat(F.lit("S"), (i % 200000).cast("string")).alias("subj"),
        F.concat(F.lit("p"), (i % 5).cast("string")).alias("pred"),
        F.concat(F.lit("v"), (i / 3_000_000).cast("long").cast("string"))
        .alias("obj"),
        i.alias("ts"),
    )


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_facts = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark("crawlsurf_bench")
    spark.sparkContext.setLogLevel("ERROR")
    from prase_spark.datapipe.feeds import parse_feeds
    from prase_spark.datapipe.urlnorm import page_identity
    from prase_spark.extract import extract_og_properties
    from prase_spark.linkgraph import extract_hreflang
    from prase_spark.temporal import fact_history

    feeds = synth_feed_bodies(spark, n_pages, 10)
    parse_feeds(feeds.limit(500)).count()  # warm codegen
    fe = parse_feeds(feeds)
    t0 = time.monotonic()
    n_entries = fe.count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "workload": f"parse_feeds {n_pages} feeds x 10 entries",
        "entries": n_entries, "sec": round(dt, 2),
        "feeds_per_sec": round(n_pages / dt, 1),
        "entries_per_sec": round(n_entries / dt, 1),
        "exchanges": n_exchanges(fe),
    }), flush=True)

    pages = synth_head_pages(spark, n_pages).persist()
    pages.count()
    hr = extract_hreflang(pages)
    og = extract_og_properties(pages)
    t0 = time.monotonic()
    n_alt = hr.count()
    n_og = og.count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "workload": f"extract_hreflang + extract_og_properties {n_pages} pages",
        "alt_rows": n_alt, "og_rows": n_og, "sec": round(dt, 2),
        "pages_per_sec": round(2 * n_pages / dt, 1),
        "exchanges": n_exchanges(hr) + n_exchanges(og),
    }), flush=True)

    hints = og.where(F.col("prop") == "og:url").select(
        "url", F.col("content").alias("target")
    )
    pid = page_identity(pages, hints)
    t0 = time.monotonic()
    n_ids = pid.count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "workload": f"page_identity {n_pages} pages (og:url hints, CC merge)",
        "rows": n_ids, "sec": round(dt, 2),
        "pages_per_sec": round(n_pages / dt, 1),
    }), flush=True)
    pages.unpersist()

    facts = synth_facts(spark, n_facts)
    fh = fact_history(facts)
    t0 = time.monotonic()
    n_vers = fh.count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "workload": f"fact_history {n_facts} captures x 1M keys",
        "versions": n_vers, "sec": round(dt, 2),
        "captures_per_sec": round(n_facts / dt, 1),
        "exchanges": n_exchanges(fh),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
