"""Hashed-feature linear quality classifier — the "model-based quality
filter" curation stage (GPT-3's WebText-vs-crawl classifier, LLaMA's
wiki-reference classifier, fastText-style linear scoring), re-expressed
as broadcast-join DataFrame passes with no per-row Python.

The pipeline shape every published recipe shares: featurize a document
as a bag of hashed n-grams, score it with a linear model, keep (or
importance-sample) by the score. Here:

- **Features**: :func:`prase_spark.datapipe.dsir.hashed_grams` — one row
  per n-gram occurrence, bucket in ``[0, n_buckets)``; the model is
  ``n_buckets`` rows and broadcasts at any corpus scale.
- **Scoring** (:func:`classifier_score`): one explode -> one
  BroadcastHashJoin on the bucket -> per-doc partial aggregate that
  collapses to ~one row per doc BEFORE the only exchange (the
  ``lmscore.lm_score`` scale shape). Weights are integer-scaled
  (``w_e6`` BIGINT), so the logit is BIGINT-exact — cross-engine
  hash-verifiable, no transcendental in the decision path.
- **Weights** come from either
  (a) :func:`nb_log_odds_weights` — a training-free naive-Bayes-flavored
  discriminant from two :func:`~prase_spark.datapipe.dsir.bucket_model`
  tables (integer-exact, the gate path), or
  (b) :func:`train_logistic_weights` — distributed batch
  gradient-descent logistic regression expressed entirely as DataFrame
  aggregations: per-iteration, one groupBy(key) computes logits, one
  groupBy(bucket) the gradient. The model (<= ``n_buckets`` rows) is
  collected and re-broadcast each step — a BOUNDED collect, documented
  per the repo's anti-pattern rules; the corpus-sized (key, bucket)
  pair table is built once, persisted, and never re-shuffled on a gram
  key.

Scale notes for 10^12 docs: the pair table is the only corpus-sized
intermediate; it shuffles ONCE (groupBy(key, bucket) to collapse
duplicate grams) and both per-iteration aggregates are map-side
combinable. Training runs on a SAMPLE in practice (labels are scarce);
scoring the full crawl is the one-join pass above.

No reference analog (the reference consumes pre-built triples; this
extends SURVEY.md §2's 'beyond-reference curation suite').
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.dsir import hashed_grams

__all__ = [
    "nb_log_odds_weights",
    "classifier_score",
    "train_logistic_weights",
    "LogisticModel",
]

_SCALE = 1_000_000


def nb_log_odds_weights(
    target_model: DataFrame,
    raw_model: DataFrame,
    scale: int = _SCALE,
) -> DataFrame:
    """(bucket, w_e6 BIGINT): training-free linear weights from two
    ``(bucket, cnt)`` bag-of-buckets models (target corpus vs raw crawl):

        w_e6(b) = (scale * tcnt * R) div (max(rcnt, 1) * T) - scale

    where T / R are the two models' total masses — the integer-exact
    RATE RATIO ``(tcnt/T) / (rcnt/R)`` scaled and centered at zero:
    positive exactly when the bucket is over-represented in the target
    relative to the raw crawl, the same sign structure as the
    naive-Bayes log-odds log(p_t(b)/p_r(b)) but with no log/double in
    the model (truncating integer division on non-negative operands —
    any SQL engine reproduces it bit-for-bit). NOTE the raw model
    normally CONTAINS the target mass (the DSIR setup), which only
    shrinks the ratio toward 1 — sign and ordering survive.

    Buckets absent from the target get weight ``-scale`` (strong
    negative); buckets absent from the raw model (possible only when the
    target is not a subset of raw) take ``rcnt = 1`` as a floor rather
    than dividing by zero. Buckets absent from both models don't exist
    as rows — scoring treats them as 0 (unseen means no evidence).

    The arithmetic runs in DECIMAL(38,0): ``scale * tcnt * R`` at
    web scale (tcnt ~ 10^12, R ~ 10^13, scale 10^6) overflows BIGINT but
    stays far under 10^38."""
    if scale < 2:
        raise ValueError(f"scale must be >= 2, got {scale}")
    t_tot = int(
        target_model.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("s")).collect()[0]["s"]
    )
    r_tot = int(
        raw_model.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("s")).collect()[0]["s"]
    )
    if t_tot == 0 or r_tot == 0:
        raise ValueError(
            f"nb_log_odds_weights: empty model (target mass {t_tot}, raw mass {r_tot})"
        )
    t = target_model.select("bucket", F.col("cnt").alias("__tc"))
    r = raw_model.select("bucket", F.col("cnt").alias("__rc"))
    joined = r.join(t, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("__tc", F.lit(0)).alias("tcnt"),
        F.coalesce("__rc", F.lit(0)).alias("rcnt"),
    )
    return joined.select(
        "bucket",
        F.expr(
            f"CAST((CAST({scale} AS DECIMAL(38,0)) * tcnt * {r_tot}) div "
            f"(CAST(GREATEST(rcnt, 1) AS DECIMAL(38,0)) * {t_tot}) "
            f"- {scale} AS BIGINT)"
        ).alias("w_e6"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
    orders: tuple[int, ...] = (1, 2),
    bias_e6: int = 0,
    hash_fn=None,
) -> DataFrame:
    """Score every document with a broadcast ``(bucket, w_e6)`` linear
    model. Returns one row per input document:

    - ``n_grams`` — hashed-gram occurrences (0-gram docs kept);
    - ``logit_e6`` — ``bias_e6 + sum_grams w_e6(bucket)``, BIGINT-exact
      (unseen buckets contribute 0);
    - ``keep_flag`` — ``1`` iff ``logit_e6 > 0`` (BIGINT for the gate
      hash; the threshold is the caller's to move by adjusting
      ``bias_e6``).

    The weight side broadcasts; the corpus side explodes, joins, and
    partially aggregates to one row per doc before its only exchange."""
    grams = hashed_grams(docs, text_col, key_col, n_buckets, orders, hash_fn)
    joined = grams.join(
        F.broadcast(weights.select("bucket", "w_e6")), "bucket", "left"
    )
    scored = joined.groupBy("key").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("w_e6"), F.lit(0))).alias("__wsum"),
    )
    return docs.select(F.col(key_col).alias("key")).join(
        scored, "key", "left"
    ).select(
        "key",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        (F.coalesce("__wsum", F.lit(0)) + F.lit(int(bias_e6)))
        .cast("long")
        .alias("logit_e6"),
    ).select(
        "key",
        "n_grams",
        "logit_e6",
        (F.col("logit_e6") > 0).cast("long").alias("keep_flag"),
    )


class LogisticModel(NamedTuple):
    """Trained logistic model: ``weights`` is a (bucket, w DOUBLE)
    DataFrame (<= n_buckets rows), ``bias`` the scalar intercept.
    ``as_integer_weights(scale)`` exports the gate/scoring form."""

    weights: DataFrame
    bias: float

    def as_integer_weights(self, scale: int = _SCALE) -> tuple[DataFrame, int]:
        w = self.weights.select(
            "bucket",
            F.round(F.col("w") * F.lit(int(scale))).cast("long").alias("w_e6"),
        )
        return w, int(round(self.bias * scale))


def train_logistic_weights(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
    orders: tuple[int, ...] = (1, 2),
    iterations: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    hash_fn=None,
) -> LogisticModel:
    """Batch gradient-descent logistic regression over hashed-gram count
    features, expressed as DataFrame aggregations (no MLlib, no per-row
    Python). ``label_col`` is 0/1.

    Per iteration (the whole loop is 2 shuffles x ``iterations`` over a
    once-persisted pair table):

    1. logits: pairs JOIN broadcast(w) -> groupBy(key).sum(cnt * w) + b
    2. residuals: r = y - sigmoid(logit)  (per doc)
    3. gradient: pairs JOIN broadcast(residuals)? NO — residuals are
       per-doc (corpus-sized), so the gradient pass joins the persisted
       pair table to the logit table ON key (both hash-partitioned on
       key by the same groupBy) and aggregates groupBy(bucket) — the
       join reuses the exchange, the bucket agg output is <= n_buckets
       rows.

    The model (<= ``n_buckets`` rows + 1 scalar) is collected to the
    driver each step and re-entered as a broadcast literal table — a
    BOUNDED collect (n_buckets is a constructor argument, default 10^4).
    Features use raw occurrence counts per (doc, bucket); lr defaults
    aggressive because counts are small integers. Training at crawl
    scale runs on a labeled SAMPLE; full-corpus scoring is
    :func:`classifier_score` with the exported integer weights."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = docs.sparkSession
    pairs = (
        hashed_grams(docs, text_col, key_col, n_buckets, orders, hash_fn)
        .groupBy("key", "bucket")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    labels = docs.select(
        F.col(key_col).alias("key"), F.col(label_col).cast("double").alias("y")
    ).persist()
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("train_logistic_weights: empty input")
    pairs.count()

    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(iterations):
        if w:
            w_df = spark.createDataFrame(
                [(int(b), float(v)) for b, v in w.items()], "bucket LONG, w DOUBLE"
            )
            contrib = pairs.join(F.broadcast(w_df), "bucket", "left").select(
                "key",
                "bucket",
                "c",
                (F.col("c") * F.coalesce(F.col("w"), F.lit(0.0))).alias("cw"),
            )
        else:
            contrib = pairs.select("key", "bucket", "c", F.lit(0.0).alias("cw"))
        logits = contrib.groupBy("key").agg(F.sum("cw").alias("z"))
        resid = (
            labels.join(logits, "key", "left")
            .select(
                "key",
                (
                    F.col("y")
                    - F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce("z", F.lit(0.0)) + F.lit(bias))))
                ).alias("r"),
            )
        )
        grad_rows = (
            pairs.join(resid, "key")
            .groupBy("bucket")
            .agg(F.sum(F.col("c") * F.col("r")).alias("g"))
            .collect()
        )
        mean_r = resid.agg(F.avg("r").alias("m")).collect()[0]["m"]
        for row in grad_rows:
            b = int(row["bucket"])
            g = float(row["g"]) / n_docs
            w[b] = w.get(b, 0.0) + lr * (g - l2 * w.get(b, 0.0))
        bias += lr * float(mean_r)

    pairs.unpersist()
    labels.unpersist()
    w_df = spark.createDataFrame(
        [(int(b), float(v)) for b, v in sorted(w.items())], "bucket LONG, w DOUBLE"
    )
    return LogisticModel(weights=w_df, bias=bias)
