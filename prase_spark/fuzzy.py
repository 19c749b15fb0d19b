"""Fuzzy string join: LOSSLESS edit-distance matching at scale.

The reference seeds alignment from EXACT literal equality
(objects/KGs.py:53-58 — its ``literal_dict_by_value`` is a hash map);
real web-extracted names carry typos, so a production seeding layer
needs the edit-distance-tolerant variant. The classic scale problem:
"all cross-KG pairs within Levenshtein k" is a similarity join nothing
naive expresses without an all-pairs product.

This module uses the DELETION-NEIGHBORHOOD method (FastSS, Bocek et al.
2007): two strings with edit distance <= k always share a string
reachable from each by <= k character deletions, so

    generate each value's <=k-deletion variants  (n^k keys per value)
    -> equi-join the two sides on an 8-byte hash of the variant
    -> verify candidates with the real levenshtein()

is COMPLETE (no true pair missed — unlike prefix/length blocking) and
SOUND (the verify step kills hash collisions and >k neighbors). The
gate's DuckDB twin is an INDEPENDENT brute-force quadratic join, so the
correctness record proves the blocking loses nothing, not merely that
two implementations agree.

Scale shape:
- variant generation is pure codegen (higher-order ``transform`` over
  ``sequence``, no Python); each row fans out to ~(len+1)^k keys — for
  k=1 on names this is ~20-40 rows, each an 8-byte hash + id;
- the only shuffle is the candidate equi-join on the hashed variant;
  degenerate shared variants (very short strings) are bucket-guarded
  with the package's standard cap + telemetry before the join;
- the verify is one codegen ``levenshtein`` per CANDIDATE (never per
  cross pair).

k is meant to be 1 or 2: the neighborhood grows as (len choose k), so
k>=3 on long strings is the wrong tool (use n-gram Jaccard from
datapipe.dedup for coarser similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets


def _deletion_keys(value_col: str, k: int):
    """Array column of all variants of ``value_col`` reachable by 0..k
    single-character deletions (the string itself included), distinct.
    Pure codegen: transform/sequence/substring, iterated k times."""
    dels = (
        "transform(sequence(0, length({s})), i -> CASE WHEN i = 0 THEN {s} "
        "ELSE concat(substring({s}, 1, i - 1), "
        "substring({s}, i + 1, length({s}))) END)"
    )
    expr = dels.format(s=value_col)
    for _ in range(k - 1):
        expr = f"array_distinct(flatten(transform({expr}, v -> " + dels.format(
            s="v"
        ) + ")))"
    return F.array_distinct(F.expr(expr))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    max_edits: int = 1,
    id_left: str = "l_id",
    id_right: str = "r_id",
    value: str = "value",
    max_key_df: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """All (l_id, r_id) pairs whose values are within ``max_edits``
    Levenshtein distance: DataFrame[l_id, l_value, r_id, r_value, edits]
    with ``edits`` the exact distance (0 = identical).

    ``left`` carries (id_left, value); ``right`` carries (id_right,
    value). Pairs are per-ID (two ids sharing a value both match), and
    every true pair within ``max_edits`` is found — deletion
    neighborhoods are a lossless filter — EXCEPT pairs only reachable
    through a variant key shared by more than ``max_key_df`` rows on
    one side (dropped with ``stats_out`` telemetry, the package's
    standard hot-bucket posture; identical strings share ALL their
    keys, so a hot-key drop rarely severs a pair completely).
    """
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    lk = left.select(
        F.col(id_left), F.col(value).alias("l_value")
    ).withColumn(
        "key",
        F.explode(_deletion_keys("l_value", max_edits))
        if max_edits
        else F.col("l_value"),
    )
    rk = right.select(
        F.col(id_right), F.col(value).alias("r_value")
    ).withColumn(
        "key",
        F.explode(_deletion_keys("r_value", max_edits))
        if max_edits
        else F.col("r_value"),
    )
    # 8-byte shuffle keys, never variant text
    lk = lk.select(id_left, "l_value", F.xxhash64("key").alias("hk"))
    rk = rk.select(id_right, "r_value", F.xxhash64("key").alias("hk"))
    l_stats: dict = {}
    r_stats: dict = {}
    lk = cap_band_buckets(
        lk,
        max_key_df,
        band_cols=("hk",),
        stats_out=l_stats if stats_out is not None else None,
        label="fuzzy_join.left",
    )
    rk = cap_band_buckets(
        rk,
        max_key_df,
        band_cols=("hk",),
        stats_out=r_stats if stats_out is not None else None,
        label="fuzzy_join.right",
    )
    if stats_out is not None:
        stats_out["left"] = l_stats
        stats_out["right"] = r_stats
    cands = lk.join(rk, "hk").select(
        id_left, "l_value", id_right, "r_value"
    ).distinct()
    return cands.where(
        F.levenshtein("l_value", "r_value") <= max_edits
    ).select(
        id_left,
        "l_value",
        id_right,
        "r_value",
        F.levenshtein("l_value", "r_value").cast("int").alias("edits"),
    )
