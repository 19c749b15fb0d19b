"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard pre-training
hygiene pass (exact n-gram collision against the eval corpus).

Scale shape: the EVAL side is small (benchmarks are thousands of rows,
not billions) — its distinct shingle set broadcasts; the train shingles
stream through one broadcast hash join and a per-doc count, so cost is
O(train tokens) with no shuffle of raw text. Nothing is dropped here:
the caller filters on ``contaminated`` (or inspects ``n_hits``) so the
removal policy stays explicit and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.dedup import shingle_table


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    min_hits: int = 1,
    hash_fn=None,
) -> DataFrame:
    """(key, n_hits, contaminated) for every train row: ``n_hits`` =
    number of DISTINCT word ``n``-grams the document shares with the eval
    corpus, ``contaminated`` = n_hits >= min_hits.

    Matching is exact on the shingle STRING by default (no false
    positives). Pass ``hash_fn`` (e.g. ``F.xxhash64``) to join on 64-bit
    shingle hashes instead — smaller broadcast at a ~2^-64-per-pair
    collision risk; the driver-gate oracle uses the exact default.
    Documents shorter than ``n`` tokens fall back to their whole text as
    one shingle (shingle_table semantics), so short eval questions still
    match verbatim copies."""
    ev = eval_df.select(
        F.lit(0).alias("__ev"),
        F.col(eval_text_col or text_col).alias("__evtxt"),
    )
    ev_sh = (
        shingle_table(ev, "__evtxt", key_col="__ev", n=n)
        .select("shingle")
        .distinct()
    )
    tr_sh = shingle_table(train, text_col, key_col, n)
    if hash_fn is not None:
        ev_sh = ev_sh.select(hash_fn(F.col("shingle")).alias("shingle")).distinct()
        tr_sh = tr_sh.select("key", hash_fn(F.col("shingle")).alias("shingle"))
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy("key")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train.select(F.col(key_col).alias("key"))
        .join(hits, "key", "left")
        .select(
            F.col("key").alias(key_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
