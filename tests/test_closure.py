"""Transitive closure + type propagation (prase_spark.closure).

Oracle strategy: hand-computed closures on small DAGs (diamond, cycle,
long chain) plus a DuckDB WITH RECURSIVE twin on a pseudorandom forest —
the same recursive-CTE formulation the driver gate uses.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from prase_spark.closure import propagate_types, transitive_closure


def _pairs(df):
    return {(r["src"], r["anc"], r["depth"]) for r in df.collect()}


def test_diamond_min_depth(spark):
    # a->b->d, a->c->d, d->e : depth(a,d) must be 2 (diamond), (a,e)=3
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        ["src", "dst"],
    )
    stats = {}
    got = _pairs(transitive_closure(edges, stats_out=stats))
    assert got == {
        ("a", "b", 1),
        ("a", "c", 1),
        ("a", "d", 2),
        ("a", "e", 3),
        ("b", "d", 1),
        ("b", "e", 2),
        ("c", "d", 1),
        ("c", "e", 2),
        ("d", "e", 1),
    }
    assert stats["levels"] == 3
    assert stats["truncated_frontier_rows"] == 0


def test_cycle_terminates(spark):
    # 1->2->3->1 : finite pair space, every node reaches every node
    # (including itself at depth 3); new-pairs-only frontier terminates
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    got = _pairs(transitive_closure(edges))
    assert got == {
        (1, 2, 1), (2, 3, 1), (3, 1, 1),
        (1, 3, 2), (2, 1, 2), (3, 2, 2),
        (1, 1, 3), (2, 2, 3), (3, 3, 3),
    }


def test_long_chain_and_max_hops_truncation(spark):
    n = 100
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    stats = {}
    full = transitive_closure(edges, max_hops=128, stats_out=stats)
    assert full.count() == n * (n + 1) // 2
    assert full.where("src = 0 AND anc = 100").collect()[0]["depth"] == 100
    assert stats["truncated_frontier_rows"] == 0

    stats = {}
    capped = transitive_closure(edges, max_hops=10, stats_out=stats)
    assert capped.agg(F.max("depth")).collect()[0][0] == 10
    assert stats["levels"] == 10
    assert stats["truncated_frontier_rows"] == 1  # frontier still live


def test_closure_matches_duckdb_recursive_cte(spark):
    # pseudorandom forest over 400 nodes: parent(i) = i // 3
    rows = [(i, i // 3) for i in range(1, 400)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = sorted(_pairs(transitive_closure(edges)))
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in rows)
        + ") t(src, dst)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            WITH RECURSIVE clos AS (
              SELECT src, dst AS anc, 1 AS depth FROM e
              UNION
              SELECT c.src, e.dst, c.depth + 1 FROM clos c JOIN e ON c.anc = e.src
            )
            SELECT src, anc, MIN(depth) AS depth FROM clos GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want


def test_propagate_types_asserted_beats_inherited(spark):
    # hierarchy: cat->animal->thing ; assertions: e1:cat, e1:thing (direct)
    sub = spark.createDataFrame(
        [("cat", "animal"), ("animal", "thing")], ["src", "dst"]
    )
    a = spark.createDataFrame(
        [("e1", "cat"), ("e1", "thing"), ("e2", "animal")], ["entity", "type"]
    )
    got = {
        (r["entity"], r["type"]): r["depth"]
        for r in propagate_types(a, sub).collect()
    }
    assert got == {
        ("e1", "cat"): 0,
        ("e1", "animal"): 1,
        ("e1", "thing"): 0,  # direct assertion beats 2-hop inheritance
        ("e2", "animal"): 0,
        ("e2", "thing"): 1,
    }


def test_propagate_types_plan_broadcasts_closure(spark):
    sub = spark.createDataFrame(
        [(i, i // 2) for i in range(2, 64)], ["src", "dst"]
    )
    a = spark.createDataFrame(
        [(f"e{i}", 1 + i % 63) for i in range(500)], ["entity", "type"]
    )
    out = propagate_types(a, sub)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the instance-side join must be broadcast, never a sort-merge
    # exchange of the assertion table against the closure
    assert "BroadcastHashJoin" in plan
    # correctness spot check: entity typed 32 inherits 16, 8, 4, 2, 1
    got = {
        r["type"]: r["depth"]
        for r in out.where("entity = 'e31'").collect()  # e31 -> type 32
    }
    assert got == {32: 0, 16: 1, 8: 2, 4: 3, 2: 4, 1: 5}


@pytest.mark.parametrize("parts", [1, 7])
def test_closure_partitioning_invariance(spark, parts):
    rows = [(i, i // 4) for i in range(1, 200)]
    edges = spark.createDataFrame(rows, ["src", "dst"]).repartition(parts)
    got = _pairs(transitive_closure(edges))
    base = _pairs(
        transitive_closure(spark.createDataFrame(rows, ["src", "dst"]))
    )
    assert got == base
