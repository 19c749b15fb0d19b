"""Deterministic distinct-count sketching: KMV (k minimum values) over
poly-hashed values (Bar-Yossef et al. 2002, the bottom-k estimator).

Corpus profiling at 100 TB wants "how many distinct X per group" where
exact distinct is unaffordable (distinct URLs per host, distinct
documents per shard, vocabulary per language). HyperLogLog is the
standard answer but its register layout and float corrections make it
engine-specific — Spark's approx_count_distinct can never be
value-verified against another engine. KMV gives the same O(k) space
with a DIFFERENT determinism property: the sketch IS the k smallest
distinct ``poly_hash61`` values, a pure set function of the input —
bit-identical on any engine, partitioning, or merge order — and the
estimator ``(k-1) * P // h_k`` is one integer division. That makes the
whole sketch value-oracle-able, in keeping with the repo's
no-RNG-state / exact-integer doctrine.

Scale shape:
- one distinct over (group, hash) pairs — 8-byte hash shuffle rows,
  never raw values (the minhash shuffle doctrine);
- the per-group k-minimum selection is the SAME two-phase salted
  partial top-k as sampling.cap_per_group (monotone selection, so
  salting is sound): no single-partition sort over a hot group's full
  distinct set exists in the plan;
- sketches merge by union + re-min-k (used by the streaming/unioned
  variant of the same call), the classic KMV mergeability.

Estimator: with h uniform on [0, P), the k-th smallest of D distinct
hashes sits near ``k * P / D``, so ``D_hat = (k-1) * P // h_k``
(unbiased form). Groups with fewer than k distinct values short-circuit
to the EXACT count (the sketch saw everything). Relative error is
~1/sqrt(k-2): k=64 gives ~13%, k=256 ~6%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.hashing import POLY_P, poly_hash61

#: quadratic finalizer constant. poly_hash61 is affine in the trailing
#: characters, so near-identical keys ("item-1".."item-4999") land on a
#: structured lattice whose bottom-k is NOT uniform — squaring mod the
#: Mersenne prime P scatters affine structure (measured: k=64 estimate
#: 443 vs true 5000 raw, 5452 after the finalizer). h^2 < 2^122 fits
#: DECIMAL(38,0)/HUGEINT exactly, so the finalizer stays shared
#: arithmetic with a bit-exact DuckDB twin.
KMV_FIN_ADD = 2654435769


def _kmv_hash_sql(h_col: str) -> str:
    """Spark/DuckDB-shared SQL for the finalized sketch hash
    (h*h + KMV_FIN_ADD) mod P over exact decimal arithmetic."""
    return (
        f"CAST((CAST({h_col} AS DECIMAL(38,0)) * {h_col} + {KMV_FIN_ADD}) "
        f"% {POLY_P} AS BIGINT)"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt_buckets: int = 64,
) -> DataFrame:
    """(group, n_kept, kth_hash, distinct_est): per-group KMV
    distinct-count sketch summary. ``n_kept`` is the sketch size
    (min(k, true distinct)), ``kth_hash`` the largest retained hash,
    ``distinct_est`` the exact count when ``n_kept < k`` else
    ``(k-1) * P // kth_hash``. All columns BIGINT, all deterministic.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    from pyspark.sql import Window

    pairs = (
        df.select(
            F.col(group_col).alias("group"),
            poly_hash61(F.col(value_col).cast("string")).alias("__ph"),
        )
        .selectExpr("group", _kmv_hash_sql("__ph") + " AS h")
        .distinct()
    )
    # two-phase salted partial min-k (cap_per_group doctrine): phase 1
    # keeps k per (group, salt) shard — every global bottom-k hash
    # survives its shard by monotonicity — phase 2 re-ranks the
    # <= k * salt_buckets survivors per group
    salt = F.pmod(F.col("h"), F.lit(int(salt_buckets)))
    w1 = Window.partitionBy("group", "__salt").orderBy(F.col("h").asc())
    w2 = Window.partitionBy("group").orderBy(F.col("h").asc())
    kept = (
        pairs.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    return kept.groupBy("group").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).selectExpr(
        "group",
        "n_kept",
        "kth_hash",
        # (k-1) * P needs ~2^67: DECIMAL(38,0) keeps it exact; the
        # quotient is <= P for any kth_hash >= k-1 so the BIGINT cast is
        # safe on real data (kth_hash < k-1 implies n_kept < k, which
        # takes the exact branch)
        f"CASE WHEN n_kept < {int(k)} THEN n_kept "
        f"ELSE CAST((CAST({int(k) - 1} AS DECIMAL(38,0)) * {POLY_P}) "
        f"DIV kth_hash AS BIGINT) END AS distinct_est",
    )
