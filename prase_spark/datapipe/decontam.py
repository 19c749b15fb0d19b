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


def decontaminate_fuzzy(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_key_col: str | None = None,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    threshold_pct: int = 50,
    hash_fn=None,
    max_bucket_size: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """(key, contaminated_by, est_pct) for every train row: FUZZY
    decontamination (the GPT-3-appendix / PaLM near-overlap hygiene
    pass) — flag training documents whose MinHash-estimated Jaccard
    against ANY eval/benchmark document reaches ``threshold_pct``, which
    exact-shingle :func:`decontaminate` misses once an eval answer is
    lightly paraphrased or partially quoted. ``contaminated_by`` = the
    eval doc with the highest estimate (ties -> min eval key), NULL
    below threshold; ``est_pct = (100 * matching_slots) DIV num_hashes``
    is an exact integer in both engines, so the operator value-gates.

    This is :func:`incremental.incremental_minhash` with the broadcast
    on the OTHER side: there the probe batch is small and the corpus is
    the store; here the eval set is the small side (benchmarks are
    thousands of rows) and TRAIN is the 10^12-doc corpus — so the eval
    bands broadcast into the train band stream (train never shuffles on
    text or signatures), the banded candidate set (collisions with a
    tiny eval set — output-proportional) broadcasts back into the train
    signature scan, and the only aggregations are per-candidate-pair
    slot counts plus a per-train-key argmax. Degenerate TRAIN band
    buckets (boilerplate signatures) are capped with the standard guard
    + telemetry; eval-side buckets need no cap (the whole side
    broadcasts)."""
    from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets
    from prase_spark.datapipe.dedup import (
        band_keys_of_wide,
        minhash_wide_signatures,
        shingle_table,
    )

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET
    ekey = eval_key_col or key_col
    etxt = eval_text_col or text_col
    ev_sigs = minhash_wide_signatures(
        shingle_table(eval_df, etxt, ekey, shingle_n), num_hashes, seed, hash_fn
    ).persist()
    ev_bands = band_keys_of_wide(ev_sigs, num_hashes, bands).select(
        F.col("key").alias("eval_key"), "band", "band_key"
    )
    tr_sigs = minhash_wide_signatures(
        shingle_table(train, text_col, key_col, shingle_n),
        num_hashes,
        seed,
        hash_fn,
    ).persist()
    tr_bands = cap_band_buckets(
        band_keys_of_wide(tr_sigs, num_hashes, bands),
        max_bucket_size,
        stats_out=stats_out,
        label="decontaminate_fuzzy",
    )
    cand = (
        tr_bands.select(F.col("key").alias("train_key"), "band", "band_key")
        .join(F.broadcast(ev_bands), ["band", "band_key"])
        .select("train_key", "eval_key")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"t.m{h}") == F.col(f"e.m{h}"), 1).otherwise(0)
        for h in range(num_hashes)
    )
    est = (
        tr_sigs.alias("t")
        .join(F.broadcast(cand), F.col("t.key") == F.col("train_key"))
        .join(F.broadcast(ev_sigs.alias("e")), F.col("eval_key") == F.col("e.key"))
        .select("train_key", "eval_key", matches.alias("__matches"))
        .selectExpr(
            "train_key",
            "eval_key",
            f"CAST(100 * __matches AS BIGINT) DIV {num_hashes} AS est_pct",
        )
        .filter(F.col("est_pct") >= threshold_pct)
    )
    best = est.groupBy("train_key").agg(
        F.min_by(
            F.struct("eval_key", "est_pct"),
            # highest estimate wins; ties -> min eval key (the
            # any-orderable-key formulation, not numeric negation)
            F.struct((-F.col("est_pct")).alias("neg_est"), F.col("eval_key")),
        ).alias("b")
    )
    return (
        train.select(F.col(key_col).alias("key"))
        .join(best, F.col("key") == F.col("train_key"), "left")
        .select(
            "key",
            F.col("b.eval_key").alias("contaminated_by"),
            F.coalesce(F.col("b.est_pct"), F.lit(0).cast("long")).alias("est_pct"),
        )
    )
