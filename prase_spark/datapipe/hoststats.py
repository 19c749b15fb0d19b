"""Host-level reputation statistics and domain blocklist filtering.

CCNet/RefinedWeb-style curation makes KEEP/DROP decisions per host, not
per page: a host whose pages are mostly duplicates or mostly junk is
dropped wholesale, and known-bad registrable domains are removed by
blocklist before any per-page work runs. The reference has no notion of
a host (its KG dumps carry no URLs) — this is beyond-reference curation
the brief asks for.

Scale shape: ``host_stats`` is ONE hash aggregation keyed on host
(map-side partial aggregation; #hosts ~10^7-10^8 at crawl scale, so the
post-shuffle state is tiny relative to the corpus). Texts are compared
through 64-bit hashes on the shuffle, never raw bytes. The resulting
per-host table is small enough to broadcast back for filtering —
``filter_by_hosts`` broadcasts the blocklist side explicitly, so the
corpus-side scan never shuffles at all.

Averages follow the repo's exact-integer discipline
(``textstats.quality_micro_parts``): every reported mean is a half-up
scaled BIGINT computed with integral arithmetic, so cross-engine value
verification never hashes an engine-dependent double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import quality_micro_parts, token_count

# Minimal set of two-level public suffixes for the naive eTLD+1 rule
# below. The full Public Suffix List is a data file (environment); these
# cover the common crawl-scale cases and the rule degrades gracefully
# (an unknown two-level suffix groups one label too coarse, never
# crashes).
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "co.in", "com.cn",
)


def registrable_domain(host_col: Column | str) -> Column:
    """Naive eTLD+1: last two labels of the host, or last three when the
    last two form a known two-level public suffix (co.uk etc.)."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    c = F.lower(c)
    parts = F.split(c, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 2, c).when(
        last2.isin(*_TWO_LEVEL_SUFFIXES) & (n >= 3), last3
    ).otherwise(last2)


def host_stats(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-host reputation rollup in ONE aggregation.

    Columns out: ``host``, ``n_docs``, ``total_tokens``,
    ``avg_quality_e6`` (mean quality x 1e6, half-up BIGINT),
    ``n_unique`` (distinct page texts, compared via xxhash64 — a
    collision undercounts uniques by 1 in ~2^-64 of host-pairs, which a
    reputation THRESHOLD cannot observe), ``dup_pct_e4`` (duplicate
    fraction x 1e4, half-up BIGINT).
    """
    c = F.col(text_col)
    n_num, d_den = quality_micro_parts(c)
    per_row = pages.select(
        F.col(host_col).alias("host"),
        token_count(c).alias("n_tokens"),
        n_num.alias("q_num"),
        d_den.alias("q_den"),
        F.xxhash64(c).alias("text_h"),
    ).withColumn("q_micro", F.expr("(2 * q_num + q_den) div (2 * q_den)"))
    agg = per_row.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("q_micro").alias("q_micro_sum"),
        F.countDistinct("text_h").alias("n_unique"),
    )
    return agg.select(
        "host",
        "n_docs",
        "total_tokens",
        F.expr("(2 * q_micro_sum + n_docs) div (2 * n_docs)").alias("avg_quality_e6"),
        "n_unique",
        F.expr(
            "(2 * (n_docs - n_unique) * 10000 + n_docs) div (2 * n_docs)"
        ).alias("dup_pct_e4"),
    )


def flag_hosts(
    stats: DataFrame,
    min_avg_quality_e6: int = 0,
    max_dup_pct_e4: int = 10_000,
) -> DataFrame:
    """Append a ``blocked`` boolean: low mean quality OR high dup rate."""
    return stats.withColumn(
        "blocked",
        (F.col("avg_quality_e6") < F.lit(min_avg_quality_e6))
        | (F.col("dup_pct_e4") > F.lit(max_dup_pct_e4)),
    )


def filter_by_hosts(
    pages: DataFrame,
    blocked_hosts: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Drop every page whose host is in ``blocked_hosts`` (one column:
    ``host``). The blocklist side is broadcast — the corpus scan stays
    shuffle-free; probe-side host skew is harmless in a broadcast
    anti-join (no partitioning by host ever happens)."""
    bl = F.broadcast(
        blocked_hosts.select(F.col("host").alias("__bl_host")).distinct()
    )
    return pages.join(
        bl, on=F.col(host_col) == F.col("__bl_host"), how="left_anti"
    )


def filter_by_domain_blocklist(
    pages: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """UT1-style URL filtering: drop pages whose registrable domain
    (naive eTLD+1 of the URL host) appears in ``blocked_domains`` (one
    column: ``domain``). Blocklist broadcast, corpus never shuffled."""
    from prase_spark.datapipe.boilerplate import host_of

    dom = registrable_domain(host_of(url_col))
    bl = F.broadcast(
        blocked_domains.select(F.col("domain").alias("__bl_dom")).distinct()
    )
    return (
        pages.withColumn("__dom", dom)
        .join(bl, on=F.col("__dom") == F.col("__bl_dom"), how="left_anti")
        .drop("__dom")
    )
