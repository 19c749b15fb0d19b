"""Scalable deterministic dense-id assignment.

The reference reassigns contiguous ids with a driver-side loop over Python
sets (objects/KG.py:202-210). At 10^12-row scale a single global window
(``row_number() over (ORDER BY name)``) would serialize on one task, so we
use the standard two-phase distributed dense-rank:

1. range-partition + sort by the (unique) order key,
2. count rows per partition (tiny collect), prefix-sum the offsets,
3. broadcast the offsets and add partition-local ``row_number``.

Deterministic as long as the order key is unique: range partitioning keeps
the global order across partitions regardless of sampled boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = start, start+1, ... densely in ``order_cols`` order.

    ``order_cols`` must be a unique key of ``df`` (guaranteed by the
    ``distinct()`` dict-encode step that precedes every call).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_part = max(1, n_part)

    parted = (
        df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # CRITICAL: materialize the partitioning before counting. RangePartitioner
    # samples with a seed derived from the (fresh) RDD id, so re-evaluating
    # `parted` in the downstream plan could draw different boundaries than the
    # ones the offsets were computed from -> overlapping/gapped ids. The
    # persist pins one snapshot for both reads.
    parted = parted.persist()
    # Per-partition counts: at most `n_part` rows — safe driver collect.
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], start
    for pid in range(max(counts, default=-1) + 1):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    if not offsets:
        return df.withColumn(id_col, F.lit(None).cast("long"))
    offset_df = spark.createDataFrame(offsets, schema="__pid INT, __offset LONG")

    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        parted.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(id_col, (F.col("__rn") - 1 + F.col("__offset")).cast("long"))
        .drop("__pid", "__rn", "__offset")
    )
    # Pin the assignment eagerly: ids must NEVER be recomputed — a fresh
    # evaluation would re-sample range boundaries against the collected
    # offsets (silent id corruption). localCheckpoint stores RDD blocks
    # that survive catalog.clearCache() (which only unpersists SQL
    # relations), so downstream cache hygiene can't resurrect the race.
    out = out.localCheckpoint()
    parted.unpersist()
    return out
