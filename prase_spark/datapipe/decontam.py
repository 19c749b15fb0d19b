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


def bloom_bits_table(
    eval_shingles: DataFrame,
    m_bits: int,
    k: int = 5,
    shingle_col: str = "shingle",
) -> DataFrame:
    """Distributed Bloom-filter build over the eval shingle set: returns
    (word, mask) rows — the filter's bit array chunked into 64-bit words,
    ``<= m_bits / 64`` rows total (~2 MB of longs for m=2^27, vs
    gigabytes of raw shingle strings). One shuffle on ``word``.

    Position ``i`` of a shingle is ``pmod(xxhash64(i, shingle), m_bits)``
    — k independent seeded hashes via xxhash64's multi-column form."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    pos = eval_shingles.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.lit(i), F.col(shingle_col)), F.lit(m_bits))
                for i in range(k)
            ])
        ).alias("pos")
    )
    return (
        pos.selectExpr("pos DIV 64 AS word", "pos % 64 AS bit")
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias("mask"))
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    min_hits: int = 1,
    m_bits: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Same contract and EXACT same output as :func:`decontaminate`, for
    eval sets too large to broadcast as strings (the 100-TB shape:
    decontaminating against the union of every benchmark ever published).

    Plan shape: the train shingle stream passes through ``k`` broadcast
    hash joins against the (word, mask) Bloom table — all map-side, no
    shuffle, whole-stage codegen — and only Bloom-passing shingles (true
    hits + the ~(1 - e^(-k*n_eval/m))^k false-positive sliver) reach the
    exact shingle-equality join, which no longer needs the eval side to
    fit in a broadcast. Bloom filters have NO false negatives, so the
    exact verify restores bit-identical semantics: the correctness gate
    runs this against the same DuckDB oracle as plain decontaminate.
    Size ``m_bits`` at ~10 bits per distinct eval shingle for ~1% Bloom
    passthrough (m 2^27 = 16 MB broadcast covers ~13M shingles)."""
    ev = eval_df.select(
        F.lit(0).alias("__ev"),
        F.col(eval_text_col or text_col).alias("__evtxt"),
    )
    ev_sh = (
        shingle_table(ev, "__evtxt", key_col="__ev", n=n)
        .select("shingle")
        .distinct()
    )
    bits = bloom_bits_table(ev_sh, m_bits, k)

    tr_sh = shingle_table(train, text_col, key_col, n)
    cand = tr_sh
    for i in range(k):
        cand = (
            cand.withColumn(
                "__pos", F.pmod(F.xxhash64(F.lit(i), F.col("shingle")), F.lit(m_bits))
            )
            .withColumn("__word", F.expr("__pos DIV 64"))
            .join(
                F.broadcast(bits.withColumnRenamed("word", "__word")),
                "__word",
                "left",
            )
            .filter(
                F.expr("shiftright(coalesce(mask, CAST(0 AS BIGINT)), CAST(__pos % 64 AS INT)) & 1 = 1")
            )
            .drop("__pos", "__word", "mask")
        )
    # exact verify on the (tiny) Bloom-surviving stream — shuffle join,
    # deliberately NOT broadcast: the eval side may be arbitrarily large
    hits = (
        cand.join(ev_sh, "shingle")
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
