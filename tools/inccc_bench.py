"""One-off incremental-CC throughput read: full `connected_components`
recompute vs `incremental_components` on the same update, at a mapping
size where the difference is the point (the 10^12-mention argument in
miniature).

Fixture (deterministic, spark.range only): base graph = n_nodes in
chains of 8 (node -> its group hub), batch = one bridging edge per 2k
nodes (0.05% of nodes touched). Full recompute re-runs CC over
base+batch; incremental resolves the batch, contracts, and relabels.

Usage: python tools/inccc_bench.py [n_nodes] [batch_every]
Prints one JSON line; paste/append the read into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batch_every = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from pyspark.sql import functions as F

    from prase_spark.config import get_spark
    from prase_spark.matching import connected_components, incremental_components

    spark = get_spark("inccc_bench")
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n_nodes).select(F.col("id"))
    base = ids.filter(F.col("id") % 8 != 0).select(
        F.col("id").alias("src"), F.expr("(id DIV 8) * 8").alias("dst")
    )
    batch = ids.filter(F.col("id") % batch_every == 0).select(
        F.col("id").alias("src"), (F.col("id") + 8).alias("dst")
    )

    t0 = time.monotonic()
    mapping = connected_components(base).persist()
    n_map = mapping.count()
    t_base = time.monotonic() - t0

    # the steady-state cost a continuously-updating store pays per batch
    stats: dict = {}
    t0 = time.monotonic()
    inc = incremental_components(mapping, batch, stats_out=stats)
    n_inc = inc.count()
    t_inc = time.monotonic() - t0

    # what it replaces: from-scratch CC over base + batch
    t0 = time.monotonic()
    full = connected_components(base.unionByName(batch))
    n_full = full.count()
    t_full = time.monotonic() - t0

    print(
        json.dumps(
            {
                "workload": "incremental_components vs full CC recompute",
                "n_nodes": n_nodes,
                "mapping_rows": n_map,
                "batch_edges": n_nodes // batch_every,
                "touched_components": stats.get("touched_components"),
                "rows_out_incremental": n_inc,
                "rows_out_full": n_full,
                "sec_base_cc": round(t_base, 3),
                "sec_incremental": round(t_inc, 3),
                "sec_full_recompute": round(t_full, 3),
                "speedup_vs_recompute": round(t_full / t_inc, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
