"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — graph
centrality over the token co-occurrence graph picks each document's
representative keywords.

Where this sits: textstats scores documents, textindex counts terms;
TextRank is the KEYWORD layer — the compact topical signature a
training-data pipeline attaches per document (topic-balanced sampling
keys, dedup-cluster naming, retrieval tags). The classic formulation is
per-document PageRank over a word window graph; at corpus scale the
standard adaptation (and the one that parallelizes) runs ONE PageRank
over the corpus-level co-occurrence graph and projects ranks back onto
each document's vocabulary — global salience, locally filtered.

Composition, not new machinery: adjacent-token edges (the colloc bigram
shape, symmetrized, deduplicated) -> graphstats.pagerank (scaled-BIGINT
integer ranks, bit-stable at any partitioning) -> per-document top-k by
(rank desc, token asc). Everything is already-audited operators, so the
whole chain value-hashes against one DuckDB query.

Scale shape: the co-occurrence graph is vocab^2-bounded but
Zipf-concentrated (far smaller than the corpus); pagerank is one
join + one shuffle per iteration; the per-doc top-k window partitions
by doc (group size = the doc's vocabulary)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens
from prase_spark.graphstats import pagerank


def cooccurrence_edges(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(src, dst): the symmetrized, deduplicated adjacent-token graph —
    an edge per UNORDERED pair of consecutive tokens anywhere in the
    corpus, emitted in both directions (undirected TextRank on a
    directed-PageRank kernel). Self-pairs dropped."""
    t = docs.select(tokens(text_col).alias("__t"))
    bi = (
        t.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                    F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return (
        bi.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(bi.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 3,
    k: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(<key_col>, token, rank_e12, rn): each document's top-``k``
    tokens by corpus-level TextRank salience (ties -> token asc, a total
    order). Documents whose tokens never co-occur (single-token docs)
    contribute no keywords — they have no graph evidence."""
    edges = cooccurrence_edges(docs, text_col, key_col).localCheckpoint()
    ranks = pagerank(edges, iterations=iterations)
    dtok = docs.select(
        F.col(key_col).alias("key"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    ).distinct()
    w = Window.partitionBy("key").orderBy(
        F.col("rank_e12").desc(), F.col("token").asc()
    )
    return (
        dtok.join(ranks.withColumnRenamed("node", "token"), "token")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("key").alias(key_col), "token", "rank_e12", "rn")
    )
