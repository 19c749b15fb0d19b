"""DSIR-style data selection — importance resampling over hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"), re-expressed as broadcast-join DataFrame passes.

The published recipe: featurize every document as a bag of unigrams and
bigrams hashed into ``m`` buckets; fit two bag-of-buckets multinomials —
``p`` on a small TARGET corpus (the distribution you want more of) and
``q`` on the RAW crawl; weight each raw document by its importance ratio
``log w(x) = sum_b c_b(x) * (log p_b - log q_b)``; then Gumbel-top-k
resample by ``log w`` so selection is importance-weighted rather than
greedy. Hashing makes the feature space fixed-size (the model is ``m``
rows — broadcastable at any corpus scale) and the weight a single
linear pass over a document's n-grams.

Scale shape (what must survive 10^12 docs):

- :func:`bucket_model` is explode -> bucket -> groupBy(bucket) with
  map-side partial counts: ONE shuffle bounded by ``m`` rows per
  upstream partition, output exactly ``m`` rows (a few hundred KB) —
  fit once, persist, reuse across crawls.
- :func:`dsir_weights` never shuffles anything corpus-sized on a gram
  key: explode -> two BroadcastHashJoins (target + raw model) ->
  groupBy(doc) whose partial aggregate collapses to ~one row per doc
  BEFORE the only exchange (same shape as ``lmscore.lm_score``).
- :func:`dsir_sample`'s Gumbel noise is hash-seeded (xxhash64 of the
  key and the seed — no RNG state, identical on any executor layout),
  and the top-k uses the same count-threshold prefilter discipline as
  the vocab builders via a quantile cut on the score.

Cross-engine discipline: ``log_w`` is transcendental, so the gate
hashes only the exact-integer surface (``n_grams`` /
``tgt_freq_sum`` / ``raw_freq_sum`` — the two model-mass dot products
that determine the weight up to the shared smoothing constants);
``log_w`` and the Gumbel sample are pytest-oracled against a pure
pandas replica. With ``hash_fn=poly_hash61`` the bucket assignment is
value-replicable in DuckDB (:data:`prase_spark.datapipe.hashing
.POLY_SQL`), so the integer surface is hash-verified end-to-end.

No reference analog (the reference consumes pre-built triples; this
extends SURVEY.md §2's 'beyond-reference curation suite').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens, word_ngrams

__all__ = ["hashed_grams", "bucket_model", "dsir_weights", "dsir_sample"]


def hashed_grams(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
    orders: tuple[int, ...] = (1, 2),
    hash_fn=None,
) -> DataFrame:
    """(key, bucket): one row per n-gram occurrence, bucket in
    ``[0, n_buckets)``. Unigrams and bigrams share the bucket space (the
    paper's setup — the strings can't collide: unigrams contain no
    space). The token array is materialized in its own projection below
    the n-gram transform (the HOF re-evaluation trap ``bigram_vocab``
    documents). No shuffle — explode preserves partitioning."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not orders:
        raise ValueError("orders must be non-empty")
    hash_fn = hash_fn or F.xxhash64
    toks = docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
    grams = F.flatten(
        F.array(*[word_ngrams(F.col("__t"), n) for n in sorted(set(orders))])
    )
    return toks.select("key", F.explode(grams).alias("gram")).select(
        "key", F.pmod(hash_fn(F.col("gram")), F.lit(n_buckets)).alias("bucket")
    )


def bucket_model(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
    orders: tuple[int, ...] = (1, 2),
    hash_fn=None,
) -> DataFrame:
    """(bucket, cnt): bag-of-hashed-n-grams multinomial counts for a
    corpus — the DSIR feature model. At most ``n_buckets`` rows, so the
    result broadcasts regardless of corpus size; the single shuffle is
    map-side combined down to <= ``n_buckets`` rows per partition."""
    return (
        hashed_grams(docs, text_col, key_col, n_buckets, orders, hash_fn)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_weights(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
    orders: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    hash_fn=None,
) -> DataFrame:
    """Per-document importance weights against two :func:`bucket_model`
    tables. Returns one row per input document:

    - ``n_grams`` — hashed-gram occurrences (0-gram docs kept, zeros);
    - ``tgt_freq_sum`` / ``raw_freq_sum`` — BIGINT-exact dot products
      ``sum_grams cnt_model(bucket)`` against each model (the gate
      surface: the weight is monotone in these up to smoothing);
    - ``log_w`` — ``sum_grams [ln p(bucket) - ln q(bucket)]`` with
      add-``alpha`` smoothing over the ``n_buckets`` outcomes. Double,
      ranking/resampling use only.

    Both models are broadcast explicitly; the corpus side's only
    shuffle carries |docs| rows (per-doc partial aggregate before the
    exchange — see module note)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t_tot = int(
        target_model.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("s")).collect()[0]["s"]
    )
    r_tot = int(
        raw_model.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("s")).collect()[0]["s"]
    )
    t_denom = float(t_tot) + alpha * n_buckets
    r_denom = float(r_tot) + alpha * n_buckets

    grams = hashed_grams(docs, text_col, key_col, n_buckets, orders, hash_fn)
    joined = grams.join(
        F.broadcast(target_model.select("bucket", F.col("cnt").alias("__tc"))),
        "bucket",
        "left",
    ).join(
        F.broadcast(raw_model.select("bucket", F.col("cnt").alias("__rc"))),
        "bucket",
        "left",
    )
    tc = F.coalesce(F.col("__tc"), F.lit(0))
    rc = F.coalesce(F.col("__rc"), F.lit(0))
    log_term = F.log((tc + F.lit(alpha)) / F.lit(t_denom)) - F.log(
        (rc + F.lit(alpha)) / F.lit(r_denom)
    )
    scored = joined.groupBy("key").agg(
        F.count("*").alias("n_grams"),
        F.sum(tc).alias("tgt_freq_sum"),
        F.sum(rc).alias("raw_freq_sum"),
        F.sum(log_term).alias("log_w"),
    )
    return docs.select(F.col(key_col).alias("key")).join(scored, "key", "left").select(
        "key",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("tgt_freq_sum", F.lit(0)).cast("long").alias("tgt_freq_sum"),
        F.coalesce("raw_freq_sum", F.lit(0)).cast("long").alias("raw_freq_sum"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


# 2^53: the largest power of two whose reciprocal maps a hash-derived
# integer onto an exactly-representable double grid in (0, 1).
_U_GRID = float(1 << 53)


def dsir_sample(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    key_col: str = "key",
    weight_col: str = "log_w",
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` rows maximizing
    ``log_w + Gumbel(0,1)`` — a without-replacement sample proportional
    to ``w`` (Vieira 2014's Gumbel-max trick, the paper's selection
    rule). The Gumbel draw is hash-seeded per key (xxhash64(key, seed)
    -> uniform on the 2^-53 grid -> -ln(-ln u)), so the sample is
    deterministic for a given seed on any cluster layout and needs no
    RNG state.

    The top-k avoids a full sort: rows are prefiltered by an approximate
    quantile threshold on the score (a superset of the true top-k,
    retried downward if the approximation undershoots), then only the
    survivors take the deterministic orderBy+limit — the driver-side
    merge sees ~k rows, not partitions x k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        F.pmod(F.xxhash64(F.col(key_col), F.lit(int(seed))), F.lit(1 << 53)).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(_U_GRID)
    scored = weights.withColumn(
        "__score", F.col(weight_col) - F.log(-F.log(u))
    ).persist()
    try:
        n = scored.count()
        pre = scored
        if n > 4 * k:
            q = max(0.0, 1.0 - (1.25 * k) / n)
            t = scored.stat.approxQuantile("__score", [q], 0.01)[0]
            pre = scored.filter(F.col("__score") >= F.lit(t))
            while pre.count() < k:
                t -= 2.0
                pre = scored.filter(F.col("__score") >= F.lit(t))
        res = (
            pre.orderBy(F.col("__score").desc(), F.col(key_col).asc())
            .limit(k)
            .drop("__score")
            .persist()
        )
        res.count()
        return res
    finally:
        scored.unpersist()
