"""Throughput + plan read for the link-graph / CDX surfaces.

Synthesizes anchor-rich pages NATIVELY (spark.range -> one concat
projection, zero Python) so the measured cost is the operator under
test, then times:
  1. extract_links            (decode -> grammar -> resolve, per-page)
  2. extract_links -> host_link_graph   (+ the one hash agg)
  3. build_cdx                (surt + md5 + format, per-page)
and counts Exchange operators in each physical plan.

Usage: python tools/linkgraph_bench.py [n_pages] [n_anchors_per_page]
Prints one JSON line per stage (BENCH.md format).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prase_spark.config import get_spark


def synth_link_pages(spark, n_pages: int, n_anchors: int):
    i = F.col("id")
    url = F.concat(
        F.lit("https://h"), (i % 50000).cast("string"),
        F.lit(".example.org/d"), (i % 97).cast("string"),
        F.lit("/p"), i.cast("string"), F.lit(".html"),
    )
    filler = F.lit(
        "<p>" + "the committee deliberates at length about many things " * 40 + "</p>"
    )
    parts = [F.lit("<html><body>"), filler]
    for j in range(n_anchors):
        # mix of absolute cross-host, rooted (self-host), and relative
        if j % 3 == 0:
            parts += [
                F.lit('<a href="https://h'),
                ((i * 7 + j) % 50000).cast("string"),
                F.lit('.example.org/t'), ((i + j) % 31).cast("string"),
                F.lit('">anchor text '), ((i + j) % 11).cast("string"),
                F.lit("</a>"),
            ]
        elif j % 3 == 1:
            parts += [
                F.lit('<a href="/local/'), ((i + j) % 13).cast("string"),
                F.lit('.html">nav '), ((i + j) % 5).cast("string"), F.lit("</a>"),
            ]
        else:
            parts += [
                F.lit('<a href="rel'), ((i + j) % 7).cast("string"),
                F.lit('.html">rel link</a>'),
            ]
    parts.append(F.lit("</body></html>"))
    html = F.concat(*parts)
    return spark.range(0, n_pages).select(
        url.alias("url"),
        F.expr("timestamp '2024-01-01' + make_dt_interval(0, 0, 0, id % 86400)")
        .alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
    )


def n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    spark = get_spark("linkgraph_bench")
    spark.sparkContext.setLogLevel("ERROR")
    from prase_spark.cdx import build_cdx
    from prase_spark.linkgraph import extract_links, host_link_graph

    pages = synth_link_pages(spark, n_pages, n_anchors)
    # warm the JVM/codegen once on a small slice
    extract_links(pages.limit(1000)).count()

    links = extract_links(pages)
    t0 = time.monotonic()
    n_links = links.count()
    t_links = time.monotonic() - t0
    print(json.dumps({
        "workload": f"extract_links {n_pages} pages x {n_anchors} anchors",
        "links": n_links, "sec": round(t_links, 2),
        "pages_per_sec": round(n_pages / t_links, 1),
        "links_per_sec": round(n_links / t_links, 1),
        "exchanges": n_exchanges(links),
    }))

    hg = host_link_graph(extract_links(pages))
    t0 = time.monotonic()
    n_hosts = hg.count()
    t_hg = time.monotonic() - t0
    print(json.dumps({
        "workload": "extract_links -> host_link_graph",
        "host_pairs": n_hosts, "sec": round(t_hg, 2),
        "pages_per_sec": round(n_pages / t_hg, 1),
        "exchanges": n_exchanges(hg),
    }))

    cdx = build_cdx(pages)
    t0 = time.monotonic()
    n_cdx = cdx.count()
    t_cdx = time.monotonic() - t0
    print(json.dumps({
        "workload": f"build_cdx {n_pages} pages",
        "records": n_cdx, "sec": round(t_cdx, 2),
        "pages_per_sec": round(n_pages / t_cdx, 1),
        "exchanges": n_exchanges(cdx),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
