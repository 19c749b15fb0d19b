"""URL canonicalization + crawl dedup — the front-of-pipeline pass that
collapses the same page fetched under cosmetically different URLs
(scheme/host case, default ports, fragments, tracking parameters,
trailing slashes) before any text processing spends compute on it.

All native column expressions (chained regexp_replace — one codegen'd
projection); the dedup is one aggregation keyed on the canonical form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped by canonical_url — the common cross-site set
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid",
)


def canonical_url(col: Column | str) -> Column:
    """Deterministic canonical form of a URL column:

    1. lowercase the scheme and host (path/query case is preserved),
    2. drop the fragment (#...),
    3. drop default ports (:80 for http, :443 for https),
    4. drop tracking query parameters (TRACKING_PARAMS), then any bare
       '?'/'&' leftovers,
    5. drop a single trailing slash on a non-root path.

    Pure string rewriting — no parsing library, so the exact same regex
    chain is replayable in any engine (the gate's DuckDB twin)."""
    c = F.col(col) if isinstance(col, str) else col
    # 1: scheme+host lowercase (authority = up to first / ? # after //)
    u = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"#.*$", "")  # 2: fragment
    # 3: default ports — capture-group form (no lookahead: the DuckDB twin
    # runs on RE2, which has none)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?#].*)", r"$1$2")
    params = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, rf"([?&])(?:{params})=[^&#]*", r"$1")  # 4
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5: trailing path slash (also when a query follows) on non-root paths
    u = F.regexp_replace(u, r"(://[^/?#]*/.+?)/([?#]|$)", r"$1$2")
    return u


def dedup_by_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical URL: the EARLIEST capture wins (min ts, tie
    -> min raw url — fully deterministic). Adds ``canonical_url`` and
    ``n_captures``; all original columns of the winning row are kept.
    One hash aggregation on the canonical key (max_by struct)."""
    with_canon = pages.withColumn("canonical_url", canonical_url(url_col))
    others = [c for c in pages.columns]
    return (
        with_canon.groupBy("canonical_url")
        .agg(
            F.min_by(
                F.struct(*others),
                F.struct(F.col(ts_col), F.col(url_col)),
            ).alias("w"),
            F.count("*").alias("n_captures"),
        )
        .select("canonical_url", "w.*", "n_captures")
    )
