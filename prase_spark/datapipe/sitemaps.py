"""Sitemap ingestion — the crawl-discovery side of the compliance pass.

A crawl-scale KG pipeline consumes sitemaps twice: seeding (which URLs
a host declares) and freshness (lastmod drives re-crawl priority, which
at processing time becomes capture-staleness scoring against the CDX
index). Pure codegen string expressions over sitemap XML bodies — one
projection + explode per document, zero Python, zero exchanges.

Grammar subset (pinned, RE2-replayable): ``<url>`` entries inside a
``<urlset>`` with ``<loc>`` required and ``<lastmod>``/``<priority>``
optional, and ``<sitemap><loc>`` child entries inside a sitemap INDEX
file. Attribute-carrying tags, CDATA, and XML entities beyond
``&amp;`` are out of grammar (web sitemaps are machine-generated; the
subset covers the generator output of every major CMS). Index recursion
is the CALLER's loop (fetching is I/O, not dataflow): ``sitemap_index``
yields the child locations to fetch, ``parse_sitemaps`` the leaf URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_ELEM_RE = r"(?is)<url>.*?</url>"
_SM_ELEM_RE = r"(?is)<sitemap>.*?</sitemap>"
_LOC_RE = r"(?is)<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>"
_PRIO_RE = r"(?is)<priority>\s*([^<]*?)\s*</priority>"


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, loc, lastmod, priority_e2) — one row per ``<url>`` entry.

    ``lastmod`` stays the raw W3C datetime string (timestamp parsing is
    the caller's policy — sitemap dates mix date-only and full-zone
    forms); ``priority_e2`` is the 0.0-1.0 priority scaled to an exact
    integer (×100, NULL when absent) per the scaled-integer doctrine.
    ``&amp;`` unescapes in loc (the one entity the subset admits);
    entries without a loc are dropped."""
    elems = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(_URL_ELEM_RE), 0)
        ).alias("__e"),
    )
    loc = F.regexp_replace(
        F.regexp_extract("__e", _LOC_RE, 1), F.lit("&amp;"), F.lit("&")
    )
    lastmod = F.regexp_extract("__e", _LASTMOD_RE, 1)
    prio = F.regexp_extract("__e", _PRIO_RE, 1)
    return (
        elems.select(
            "host",
            loc.alias("loc"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
            F.when(prio == "", None)
            .otherwise(F.round(prio.cast("double") * 100).cast("bigint"))
            .alias("priority_e2"),
        )
        .where(F.col("loc") != "")
    )


def sitemap_index(
    sitemaps: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, child_loc) — child sitemap locations from INDEX files; the
    caller fetches these and feeds the bodies back to parse_sitemaps
    (bounded recursion is crawl policy, not dataflow)."""
    elems = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(_SM_ELEM_RE), 0)
        ).alias("__e"),
    )
    loc = F.regexp_replace(
        F.regexp_extract("__e", _LOC_RE, 1), F.lit("&amp;"), F.lit("&")
    )
    return elems.select("host", loc.alias("child_loc")).where(
        F.col("child_loc") != ""
    )


def staleness_against_cdx(
    sitemap_urls: DataFrame, cdx: DataFrame
) -> DataFrame:
    """(loc, lastmod, last_capture_ts, stale) — join declared URLs
    against the CDX index's LATEST capture per URL: ``stale`` when the
    host declares a lastmod strictly after the last capture (or the URL
    was never captured). Feeds re-crawl priority.

    ``lastmod`` date-only forms compare against the capture ts by
    14-digit prefix truncation — both sides collapse to yyyyMMdd, the
    coarsest common grain, so a date-only lastmod never reads as newer
    within its own capture day. The CDX side reduces to one max per
    URL first (map-side combinable) — the join carries one row per
    distinct URL, never the capture history."""
    last_cap = cdx.groupBy("url").agg(F.max("ts").alias("last_capture_ts"))
    j = sitemap_urls.join(
        last_cap, sitemap_urls["loc"] == last_cap["url"], "left"
    ).drop("url")
    lastmod_digits = F.regexp_replace(F.col("lastmod"), r"[^0-9]", "")
    day_declared = F.substring(lastmod_digits, 1, 8)
    day_captured = F.substring(F.col("last_capture_ts"), 1, 8)
    stale = F.when(F.col("last_capture_ts").isNull(), F.lit(True)).otherwise(
        F.when(F.col("lastmod").isNull(), F.lit(False)).otherwise(
            day_declared > day_captured
        )
    )
    return j.select("loc", "lastmod", "last_capture_ts", stale.alias("stale"))
