"""zorder_key / zorder_layout (io.py) vs a Python Morton replica, plus
the locality property the layout exists for."""

import pytest
from pyspark.sql import functions as F

from prase_spark.io import zorder_key, zorder_layout


def _morton(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_replica(spark):
    rows = [(i, (i * 37) % 1024, (i * 101) % 1024) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = {r.id: r.z for r in df.select("id", zorder_key("x", "y").alias("z")).collect()}
    assert got == {i: _morton(x, y) for i, x, y in rows}


def test_zorder_layout_buckets_are_tighter_than_row_order(spark):
    # 4096 points on a 64x64 grid; bucket into 16 contiguous chunks by
    # (a) z-order and (b) raw row id; z-order buckets must have far
    # smaller total bounding-box area (the pruning-effectiveness proxy)
    pts = [(i, i % 64, (i // 64) % 64) for i in range(4096)]

    # on a complete grid every chunking is area-tight; what pruning
    # actually feels is the PER-DIMENSION extent of each box — a
    # row-ordered chunk spans the full x range (x predicates never
    # prune), a z-ordered chunk spans a 16x16 square
    def _extents(order_key):
        chunks = {}
        for rank, (i, x, y) in enumerate(sorted(pts, key=order_key)):
            b = rank // 256
            xs, ys = chunks.setdefault(b, ([], []))
            xs.append(x)
            ys.append(y)
        sx = sum(max(xs) - min(xs) + 1 for xs, _ in chunks.values())
        sy = sum(max(ys) - min(ys) + 1 for _, ys in chunks.values())
        return sx, sy

    zx, zy = _extents(lambda p: _morton(p[1], p[2]))
    rx, ry = _extents(lambda p: p[0])
    assert rx == 64 * 16          # row order: every chunk spans all of x
    assert zx == 16 * 16 and zy == 16 * 16  # z order: 16x16 squares
    assert zx + zy < rx + ry

    # and the Spark layout produces one contiguous __z range per
    # partition (non-overlapping shards, the cdx discipline)
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    laid = zorder_layout(df, "x", "y", n_files=8)
    ranges = (
        laid.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2
