"""Incremental connected components (matching.incremental_components).

Oracle: full `connected_components` recompute over base ∪ batch must be
identical — on hand-built merge shapes and on a seeded random graph.
"""

import random

from pyspark.sql import functions as F

from prase_spark.matching import connected_components, incremental_components


def _cc(spark, edges):
    if not edges:
        return {}
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


def _inc(spark, base_edges, batch_edges, stats=None):
    mapping = connected_components(
        spark.createDataFrame(base_edges, ["src", "dst"])
    )
    batch = spark.createDataFrame(batch_edges, ["src", "dst"])
    out = incremental_components(mapping, batch, stats_out=stats)
    return {r["node"]: r["component"] for r in out.collect()}


def test_transitive_merge_across_batch(spark):
    # three separate base components {1,2} {10,11} {20,21}; the batch
    # chains them 2-10, 11-20 — all six nodes must land in component 1
    base = [(1, 2), (10, 11), (20, 21)]
    got = _inc(spark, base, [(2, 10), (11, 20)])
    assert got == {n: 1 for n in [1, 2, 10, 11, 20, 21]}


def test_noop_batch_keeps_mapping(spark):
    base = [(1, 2), (2, 3), (10, 11)]
    stats = {}
    got = _inc(spark, base, [(1, 3), (10, 11)], stats)
    assert got == _cc(spark, base)
    assert stats["touched_components"] == 0


def test_new_nodes_and_mixed_batch(spark):
    base = [(1, 2)]
    # 100-101 is a brand-new component; 2-50 attaches new node 50 to {1,2}
    got = _inc(spark, base, [(100, 101), (2, 50)])
    assert got == {1: 1, 2: 1, 50: 1, 100: 100, 101: 100}


def test_matches_full_recompute_random(spark):
    rng = random.Random(11)
    nodes = list(range(1, 120))
    base = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    base = [(a, b) for a, b in base if a != b]
    batch = [
        (rng.choice(nodes + list(range(200, 230))),
         rng.choice(nodes + list(range(200, 230))))
        for _ in range(40)
    ]
    batch = [(a, b) for a, b in batch if a != b]
    got = _inc(spark, base, batch)
    want = _cc(spark, base + batch)
    # the incremental result also keeps base-only nodes untouched by the
    # batch; the full recompute over base+batch covers the same node set
    assert got == want


def test_mapping_never_shuffled(spark):
    base = [(i, i + 1) for i in range(0, 40, 2)]
    mapping = connected_components(
        spark.createDataFrame(base, ["src", "dst"])
    ).localCheckpoint()
    batch = spark.createDataFrame([(1, 2), (4, 100)], ["src", "dst"])
    out = incremental_components(mapping, batch)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every join that touches the instance-scale mapping must be
    # broadcast; a sort-merge join would shuffle 10^12 rows
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
