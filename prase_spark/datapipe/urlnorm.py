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


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """(src, final, hops, cyclic) — the terminal target of every
    redirect chain, by POINTER DOUBLING: each round joins the mapping
    with itself, so a chain of length L resolves in ceil(log2 L) joins,
    not L — ``max_hops=32`` costs 5 self-joins however long the chains.

    ``redirects`` is the single-successor edge set a crawl emits from
    3xx captures (one Location per source URL; duplicate sources are
    rejected upstream by construction — a URL redirects to one place at
    a given snapshot). Rows whose chain exceeds ``max_hops`` after the
    doubling rounds still point at a source URL — those are loops (or
    over-long chains, same crawl policy): flagged ``cyclic`` with
    ``final`` NULL, exactly how a crawler treats redirect cycles.

    Scale shape: each round is ONE equi-join of the mapping with itself
    on an 8-byte-hashable key plus a coalesce — no windows, no
    iteration proportional to chain length, localCheckpoint-free
    because the loop depth is a constant 5."""
    import math

    m = redirects.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("n_src"),
            F.col("cur").alias("n_cur"),
            F.col("hops").alias("n_hops"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["n_src"], "left")
            .select(
                "src",
                F.coalesce("n_cur", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("n_hops"), F.lit(0))
                ).alias("hops"),
            )
        )
    # a cur that is still someone's source after the rounds is a cycle
    # (or an over-max chain): final unusable either way
    srcs = redirects.select(F.col(src_col).alias("cur")).distinct()
    return (
        m.join(srcs.withColumn("__loop", F.lit(True)), on="cur", how="left")
        .select(
            "src",
            F.when(F.col("__loop").isNotNull(), None)
            .otherwise(F.col("cur"))
            .alias("final"),
            "hops",
            F.col("__loop").isNotNull().alias("cyclic"),
        )
    )


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
