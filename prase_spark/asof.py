"""As-of (point-in-time) join — for every left event, the most recent
right row at or before it per key. The lookup every temporal pipeline
needs (price at trade time, profile snapshot at event time, last crawl
of a URL before a given fetch) and one Spark has no native operator for.

Spark-first strategy: NOT a range join (a theta-join `l.ts >= r.ts`
explodes to |L|·|R| candidates per key before taking the max), but the
union-merge formulation: tag both sides, union them, and run ONE window
pass per key ordered by (ts, side) carrying the last-seen right payload
forward (`last(..., ignorenulls=True)` over unbounded-preceding rows).
Cost is a single shuffle on the key + a per-key local sort — the same
shape as sessionization, linear in |L| + |R|, no candidate blowup, and
AQE-compatible. Right rows sort before left rows at equal timestamps,
so the match is inclusive (`right.ts <= left.ts`), matching DuckDB's
`ASOF JOIN ... ON l.ts >= r.ts` — which is exactly the oracle twin.

Determinism: the only ambiguity an as-of join admits is several right
rows sharing one (key, ts); ``tiebreak_col`` resolves it by max-key
pre-reduction (one small aggregation on the right side only). Without a
tiebreak the caller asserts uniqueness — the standard contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_expr(df: DataFrame, col: str) -> F.Column:
    """Order column as a total-ordered integral: epoch micros for any
    timestamp flavor (NTZ included — sessions pin UTC), pass-through for
    numerics."""
    dtype = dict(df.dtypes)[col]
    if "timestamp" in dtype:
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "key",
    right_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows plus, for each, the payload of the latest right row with
    ``right[on] <= left[on]`` and equal ``by`` key (NULLs where no right
    row precedes). Right payload columns keep their names, or gain
    ``suffix`` when they would collide with a left column.

    ``right_cols``: right payload to carry (default: all but ``by``).
    ``tiebreak_col``: when several right rows share one (by, on) instant,
    keep the one with the greatest value of this column."""
    right_cols = right_cols or [c for c in right.columns if c != by]
    rp = right.select(
        F.col(by).alias("__by"),
        _ts_expr(right, on).alias("__ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    if tiebreak_col is not None:
        if tiebreak_col not in right_cols:
            raise ValueError(
                f"tiebreak_col {tiebreak_col!r} must be in right_cols"
            )
        rp = rp.groupBy("__by", "__ts").agg(
            F.max_by("__r", F.col(f"__r.{tiebreak_col}")).alias("__r")
        )
    r_type = rp.schema["__r"].dataType

    lt = (
        left.withColumn("__by", F.col(by))
        .withColumn("__ts", _ts_expr(left, on))
        .withColumn("__side", F.lit(1))
        .withColumn("__r", F.lit(None).cast(r_type))
    )
    # a NULL key never equi-matches in join semantics, but partitionBy
    # groups NULLs together — drop null-key build rows so null-key left
    # rows get NULL payloads, same as DuckDB's ASOF equality condition
    rt = rp.filter(F.col("__by").isNotNull()).withColumn("__side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy("__by")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    taken = set(left.columns)
    out_cols = [F.col(c) for c in left.columns]
    for c in right_cols:
        name = c + suffix if c in taken else c
        out_cols.append(F.col("__m").getField(c).alias(name))
    return matched.select(*out_cols)
