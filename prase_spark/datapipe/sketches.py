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


#: count-min hash family: row i uses the affine map
#: (CMS_A + 2i) * base + (CMS_B + i) mod P over the FINALIZED base hash
#: (the quadratic finalizer scatters poly_hash61's affine lattice first,
#: same reasoning as KMV). Odd multipliers, exact DECIMAL(38,0)
#: arithmetic: (1e12-scale a) * (2^61 base) ~ 1e30 << 1e38, so both
#: engines compute bit-identical buckets.
CMS_A = 999999000001
CMS_B = 12345


def count_min(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, bucket, cnt): a Count-Min sketch (Cormode & Muthukrishnan
    2005) of the value column's frequency distribution — the heavy-
    hitter / frequency-estimate summary a 100-TB profile pass ships to
    the driver instead of a corpus-sized term table. ``depth * width``
    cells bound the sketch regardless of cardinality; point estimates
    overestimate only (est >= true, with +eps*N error at probability
    1-delta for width=e/eps, depth=ln(1/delta)).

    Determinism doctrine: buckets are pure integer arithmetic over the
    finalized poly hash (no RNG, no engine-specific hash), so the ENTIRE
    sketch — every cell — is value-replicable in ANSI SQL and the gate
    hashes all depth*width populated cells against DuckDB.

    Scale shape: the corpus first collapses to one row per DISTINCT base
    hash (map-side combinable sum of weights; shuffle rows are 8-byte
    hashes + a count, never raw values — the bucket maps factor through
    the base hash, so this pre-aggregation is exact), then fans out
    ``depth`` cells per distinct value and sums per cell. Cell count is
    capped at depth*width by construction, so the second shuffle is
    sketch-sized, not corpus-sized.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    per_value = (
        df.select(poly_hash61(value_col).alias("__ph"), w.alias("__w"))
        .select(F.expr(_kmv_hash_sql("__ph")).alias("__base"), "__w")
        .groupBy("__base")
        .agg(F.sum("__w").alias("__wv"))
    )
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    cells = per_value.select(
        F.explode(rows).alias("row"),
        F.col("__base"),
        F.col("__wv"),
    ).select(
        "row",
        F.expr(
            f"CAST((CAST(({CMS_A} + 2 * row) AS DECIMAL(38,0)) * __base "
            f"+ ({CMS_B} + row)) % {POLY_P} % {width} AS BIGINT)"
        ).alias("bucket"),
        "__wv",
    )
    return cells.groupBy("row", "bucket").agg(F.sum("__wv").alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    keys: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(<value_col>, est): Count-Min point estimates for each distinct
    key — min over the sketch's ``depth`` cells for that key (0 when a
    cell is empty). The sketch side is depth*width rows at most, so the
    join broadcasts; the key side never shuffles."""
    k = (
        keys.select(F.col(value_col).alias("__v")).distinct()
        .select("__v", poly_hash61("__v").alias("__ph"))
        .select("__v", F.expr(_kmv_hash_sql("__ph")).alias("__base"))
    )
    probes = k.select(
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        F.col("__base"),
    ).select(
        "__v",
        "row",
        F.expr(
            f"CAST((CAST(({CMS_A} + 2 * row) AS DECIMAL(38,0)) * __base "
            f"+ ({CMS_B} + row)) % {POLY_P} % {width} AS BIGINT)"
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("__v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
        .withColumnRenamed("__v", value_col)
    )
