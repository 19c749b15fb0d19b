"""Gap-based event sessionization — the classic clickstream/crawl-log
rollup: a user's events ordered in time split into sessions wherever the
inter-event gap exceeds a timeout.

Scale shape: ONE shuffle (hash-partition by user), then two window
passes over each user's locally-sorted events (lag → new-session flag →
running sum) and one aggregation on (user, session) — all map-side
combinable after the window. The window is partitioned per user, so
cross-user skew is invisible; the only hot spot would be a single user
with an executor-breaking event count (bots at crawl scale) — cap those
upstream with ``stratified_sample`` or a count filter, because salting a
window would break the ordering the semantics require.

Every emitted value is integral (epoch microseconds / counts), so the
result is bit-identical across partitionings and engines — no double
reaches a sink. Ordering is total: ties in ``ts`` are broken by the
event key, so session numbering is deterministic.

No reference analog (the reference consumes pre-built triples) —
first-class pipeline op, SQL-oracled via ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    key_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_seq, n_events, start_us, end_us, duration_us):
    one row per session, ``session_seq`` numbered 1.. per user in time
    order. A new session starts when the gap since the user's previous
    event exceeds ``gap_seconds`` (strictly greater — an exactly-gap
    pause continues the session)."""
    gap_us = int(gap_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        # cast handles TIMESTAMP_NTZ parquet columns; sessions pin UTC so
        # the wall-clock micros equal DuckDB's epoch_us on the same data
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(key_col).alias("__key"),
    )
    w = Window.partitionBy("user_id").orderBy("__us", "__key")
    flagged = ev.withColumn(
        "__new",
        F.when(
            F.col("__us") - F.lag("__us").over(w) > F.lit(gap_us), 1
        ).otherwise(0),
    ).withColumn(
        # first event of a user has lag NULL -> __new 0; starting the
        # running sum at 1 numbers sessions 1..k
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        (F.max("__us") - F.min("__us")).alias("duration_us"),
    )
