"""Collocation mining — top-k adjacent word pairs ranked by an
observed/expected lift score, the statistical signal for multi-word
entity names ("new york", "supreme court") feeding KG construction's
mention vocabulary.

Score, in exact integer micro-units so the value is bit-identical at any
partitioning and cross-engine (the scaled-integer doctrine — no double
ever reaches a sink):

    lift_e6 = (n_ab * N * 10^6) div (n_a * n_b)

where n_ab is the corpus bigram count, n_a / n_b the unigram counts, and
N the corpus token count. This is pointwise-mutual-information's inside
ratio P(ab)/(P(a)P(b)) up to the constant N_bigrams/N factor — constant
factors don't change a ranking. The numerator is carried as
DECIMAL(38,0) (HUGEINT in the DuckDB twin) so a web-scale corpus
(n_ab·N ≈ 10^10·10^15) cannot overflow 64-bit.

Scale shape: one exploded scan feeds the unigram aggregation and one the
bigram aggregation (both map-side combinable, word-sized keys);
``min_count`` prunes the bigram tail BEFORE the two unigram-count joins,
which is where web corpora drop ~95% of pairs; the final top-k is a
TakeOrderedAndProject (per-partition heaps + driver merge), never a
global sort materialization. No reference analog (the reference consumes
pre-built triples) — first-class pipeline op, SQL-oracled via
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens


def collocations(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """(w1, w2, n_ab, lift_e6): the ``top_k`` adjacent token pairs with
    corpus frequency >= ``min_count``, ranked by (lift_e6 DESC, w1, w2)
    — a total order, so the cut is deterministic."""
    toked = docs.select(tokens(text_col).alias("__t"))

    uni = (
        toked.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    # One row; bounded collect-free: broadcast the scalar as a 1-row join.
    total = uni.agg(F.sum("n").cast("long").alias("__N"))

    # sequence(0, -1) would yield a DESCENDING [0, -1] in Spark, so the
    # short-doc case is guarded explicitly rather than relying on slice.
    bigrams = toked.select(
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.expr(
                    "transform(sequence(0, size(__t) - 2),"
                    " i -> struct(__t[i] AS w1, __t[i + 1] AS w2))"
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b")
    ).select("b.w1", "b.w2")

    big = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )

    scored = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("__n1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("__n2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.expr(
                f"CAST((CAST(n_ab AS DECIMAL(38,0)) * __N * {scale})"
                " div (CAST(__n1 AS DECIMAL(38,0)) * __n2) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )
    return scored.orderBy(F.desc("lift_e6"), "w1", "w2").limit(top_k)
