"""Sitemap grammar subset, index files, CDX staleness join."""

from pyspark.sql import functions as F

from prase_spark.datapipe.sitemaps import (
    parse_sitemaps,
    sitemap_index,
    staleness_against_cdx,
)

_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.org/a?x=1&amp;y=2 </loc>
    <lastmod>2024-03-05</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.org/b</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>
"""

_INDEX = """<sitemapindex>
  <sitemap><loc>https://h.org/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://h.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark, body):
    return spark.createDataFrame([("h.org", body)], "host string, body string")


def test_parse_sitemaps_subset(spark):
    rows = sorted(
        map(tuple, parse_sitemaps(_df(spark, _BODY)).collect())
    )
    # locless entry dropped; &amp; unescaped; priority scaled to e2
    assert rows == [
        ("h.org", "https://h.org/a?x=1&y=2", "2024-03-05", 80),
        ("h.org", "https://h.org/b", None, None),
    ]


def test_sitemap_index(spark):
    rows = sorted(r.child_loc for r in sitemap_index(_df(spark, _INDEX)).collect())
    assert rows == [
        "https://h.org/sitemap-1.xml",
        "https://h.org/sitemap-2.xml",
    ]


def test_staleness_against_cdx(spark):
    urls = spark.createDataFrame(
        [
            ("https://h.org/new", "2024-03-05", None),     # captured before -> stale
            ("https://h.org/same", "2024-03-01", None),    # same day -> fresh
            ("https://h.org/nomod", None, None),           # no lastmod -> fresh
            ("https://h.org/never", "2024-01-01", None),   # never captured -> stale
        ],
        "loc string, lastmod string, priority_e2 bigint",
    )
    cdx = spark.createDataFrame(
        [
            ("https://h.org/new", "20240301120000"),
            ("https://h.org/new", "20240201120000"),
            ("https://h.org/same", "20240301080000"),
            ("https://h.org/nomod", "20230101000000"),
        ],
        "url string, ts string",
    )
    got = {r.loc: r.stale for r in staleness_against_cdx(urls, cdx).collect()}
    assert got == {
        "https://h.org/new": True,
        "https://h.org/same": False,
        "https://h.org/nomod": False,
        "https://h.org/never": True,
    }
