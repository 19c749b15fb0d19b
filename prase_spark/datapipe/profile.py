"""One-pass corpus profiling: the dataset-card numbers (volume, vocab,
length distribution) computed in a single aggregation over the exploded
token stream.

At 100 TB the exact versions of these are the expensive ones — a
COUNT(DISTINCT term) over a web corpus shuffles the full vocabulary, and
an exact median sorts it — so ``approx=True`` (default) swaps in the
streaming sketches Spark already ships: HyperLogLog++ for vocabulary
(``approx_count_distinct``, mergeable, fixed memory) and t-digest-style
``percentile_approx`` for the length quantiles. Both are one-pass,
map-side-combinable, and bounded-memory per partition — the profile of a
petabyte corpus costs one scan. ``approx=False`` computes the exact
values; the driver gate runs that variant (sketch internals differ
between engines, exact values don't).

Plan note: doc-level stats ride the SAME exploded scan as term-level
stats — posexplode keeps the token position, and doc-level aggregates
count each document once via its position-0 row (empty docs survive
through explode_outer's null row). One shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One-row profile: (n_docs, n_tokens, distinct_terms, min_tokens,
    max_tokens, median_tokens_x2).

    ``median_tokens_x2`` is twice the interpolated median as a BIGINT —
    (a+b)/2 * 2 == a+b is exact integer arithmetic, so the exact variant
    is value-hashable cross-engine with no float in the sink (the same
    scaled-integer doctrine as corpus_stats). ``rsd``: target relative
    error of the HLL vocabulary sketch when ``approx``."""
    toked = docs.select(
        F.col(key_col).alias("key"), tokens(text_col).alias("__t")
    ).select(
        "key",
        F.size("__t").alias("n_tokens"),
        F.posexplode_outer("__t").alias("pos", "term"),
    )
    is_doc_row = F.coalesce(F.col("pos"), F.lit(0)) == 0
    doc_tokens = F.when(is_doc_row, F.col("n_tokens"))
    distinct_terms = (
        F.approx_count_distinct("term", rsd) if approx
        else F.countDistinct("term")
    )
    median_x2 = (
        F.percentile_approx(doc_tokens, 0.5) * 2 if approx
        else F.expr(
            "CAST(percentile(CASE WHEN coalesce(pos, 0) = 0 THEN n_tokens END, 0.5D)"
            " * 2 AS BIGINT)"
        )
    )
    return toked.agg(
        F.sum(is_doc_row.cast("long")).alias("n_docs"),
        F.sum(doc_tokens).cast("long").alias("n_tokens"),
        distinct_terms.cast("long").alias("distinct_terms"),
        F.min(doc_tokens).cast("long").alias("min_tokens"),
        F.max(doc_tokens).cast("long").alias("max_tokens"),
        median_x2.cast("long").alias("median_tokens_x2"),
    )


def exact_quantiles(
    df, value_col: str, qs_pct: list[int], n_parts: int = 32
):
    """(q_pct, value, rank): EXACT order statistics of a numeric column
    without a single-partition sort — the deterministic alternative to
    approxQuantile (whose Greenwald-Khanna summary is engine- and
    merge-order-specific, so it can never be value-verified).

    The quantile at q% is the value at 0-based global rank
    ``floor(q * (n-1) / 100)`` under (value, tiebreak) order — the
    "lower" / type-1 estimator, pure integer arithmetic. The global
    order comes from metablock.global_rank (range partitions +
    per-partition offsets, one bounded collect), so cost is one range
    shuffle + one per-partition sort regardless of how many quantiles
    are probed; the probe itself is a broadcast semi-join on rank.

    Profiling doctrine: corpus length/score distributions drive the
    curation thresholds (token-count caps, quality floors); exact
    quantiles make those thresholds reproducible across engines and
    rounds, where approximate sketches drift.
    """
    from pyspark.sql import functions as F

    from prase_spark.metablock import global_rank

    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    ranked = global_rank(
        vals.withColumn("__tb", F.monotonically_increasing_id()),
        ["v", "__tb"],
        n_parts,
    ).select("v", "rank").localCheckpoint()
    n = ranked.count()
    if n == 0:
        raise ValueError("exact_quantiles: no non-null values")
    spark = df.sparkSession
    probes = spark.createDataFrame(
        [(q, (q * (n - 1)) // 100) for q in qs_pct], "q_pct INT, rank LONG"
    )
    return (
        ranked.join(F.broadcast(probes), "rank")
        .select("q_pct", F.col("v").alias("value"), "rank")
    )
