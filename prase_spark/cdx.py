"""SURT canonicalization + CDX capture index — the crawl-side lookup
structure of a web-scale KG constructor.

Beyond-reference surface (the reference has no crawl layer; its nearest
analog is the TSV scan at /root/reference/objects/KGs.py:55-88), but any
pipeline that re-processes a 10^12-page crawl needs the Common-Crawl
index pattern: every capture keyed by its SURT (Sort-friendly URI
Reordering Transform — host labels reversed so one domain's captures
are one contiguous key range), range-sharded and sorted so a per-domain
re-extract reads ONE shard slice instead of scanning the corpus.

Scale shape:
- ``surt_key`` / ``build_cdx`` are pure codegen projections — one scan,
  zero exchanges, zero Python.
- ``write_cdx_index`` range-partitions by (surt, ts) then sorts within
  partitions: globally ordered shards (the zipnum-block analog), so a
  prefix lookup prunes to the few shards whose parquet min/max straddle
  the prefix — O(shards touched), never O(corpus).
- ``cdx_lookup`` is a sargable prefix range filter (>= prefix AND
  < prefix||'~'-style bound expressed as startswith, which parquet
  row-group stats serve) — no regex in the pruning path.

SURT spec (deterministic; pinned so any engine can replay it):
lowercase; scheme and fragment dropped; a single leading ``www.`` and a
``:port`` suffix dropped from the host; host labels reversed and joined
with ``,``; then ``)`` and the path?query (``/`` when the path is
empty). Userinfo is out of scope (crawl URLs never carry it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: CDX timestamp layout (14-digit, second resolution) — the CC format.
CDX_TS_FMT = "yyyyMMddHHmmss"


def surt_key(url_col: Column | str) -> Column:
    """SURT of a URL column, e.g.
    ``HTTPS://WWW.Sub.Example.COM:443/A/b?Q=1#f`` ->
    ``com,example,sub)/a/b?q=1``. Pure string expressions."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.lower(F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""))
    u = F.regexp_replace(u, r"#.*$", "")
    auth = F.regexp_extract(u, r"^([^/?#]*)", 1)
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(u, r"^[^/?#]*", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), rest)


def build_cdx(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """(surt, ts, url, digest, length_bytes) — one CDX record per
    capture. ``ts`` is the 14-digit CDX timestamp (wall time — format of
    the capture timestamp, so it round-trips the parsed value at any
    session timezone); ``digest`` is the md5 hex of the raw payload
    bytes; ``length_bytes`` the payload octet length. One codegen
    projection over the page scan."""
    return pages.select(
        surt_key(url_col).alias("surt"),
        F.date_format(F.col(ts_col), CDX_TS_FMT).alias("ts"),
        F.col(url_col).alias("url"),
        F.md5(F.col(html_col)).alias("digest"),
        F.octet_length(F.col(html_col)).alias("length_bytes"),
    )


def write_cdx_index(cdx: DataFrame, path: str, n_shards: int = 32) -> None:
    """Materialize the index as ``n_shards`` globally range-ordered
    parquet shards keyed on (surt, ts) — the zipnum-block layout. Range
    partitioning samples the key distribution, so one mega-domain spreads
    across consecutive shards instead of hot-spotting one."""
    (
        cdx.repartitionByRange(n_shards, "surt", "ts")
        .sortWithinPartitions("surt", "ts")
        .write.mode("overwrite")
        .parquet(path)
    )


def cdx_lookup(cdx: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a domain: ``com,example``; a
    subtree: ``com,example)/docs/``), ts-ordered per URL. The predicate
    is a sargable prefix filter — over a written index, parquet min/max
    stats prune untouched shards/row groups."""
    return cdx.where(F.col("surt").startswith(surt_prefix)).orderBy("surt", "ts")


def mark_revisits(cdx: DataFrame) -> DataFrame:
    """cdx + (revisit: boolean) — a capture is a REVISIT when its digest
    equals the digest of the SAME URL's previous capture (ts order):
    the WARC `revisit` record convention, which lets a store keep one
    payload per content change instead of one per fetch.

    Ties on ts break by digest (deterministic). The window partitions
    by URL: its size is the URL's recapture count — crawl-policy
    bounded (a crawler revisits a URL dozens of times per year, never
    corpus-many), so no skew surface; the first capture of every URL is
    never a revisit."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("ts", "digest")
    prev = F.lag("digest").over(w)
    return cdx.withColumn(
        "revisit", prev.isNotNull() & (prev == F.col("digest"))
    )


def to_cdxj(cdx: DataFrame) -> DataFrame:
    """Render records as CDXJ lines: ``<surt> <ts> {"url":...,
    "digest":..., "length":...}`` — the interchange format crawl tooling
    consumes. ``to_json(struct(...))`` keeps field order pinned; one
    projection, no Python."""
    payload = F.to_json(
        F.struct(
            F.col("url"),
            F.col("digest"),
            F.col("length_bytes").alias("length"),
        )
    )
    return cdx.select(
        F.concat_ws(" ", F.col("surt"), F.col("ts"), payload).alias("line")
    )
