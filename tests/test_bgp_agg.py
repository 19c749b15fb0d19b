"""SPARQL aggregates over BGP solutions: bag semantics, HAVING, top-k."""

import pytest
from pyspark.sql import functions as F

from prase_spark.bgp import bgp_aggregate


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # two orders per customer c1, one for c2; c3 has no orders
        ("o1", "ownedBy", "c1"), ("o2", "ownedBy", "c1"), ("o3", "ownedBy", "c2"),
        ("c1", "inNation", "n1"), ("c2", "inNation", "n2"), ("c3", "inNation", "n2"),
        ("o1", "price", "100"), ("o2", "price", "250"), ("o3", "price", "70"),
        # o1 reachable to c1 twice via a second edge type is NOT modeled;
        # bag semantics tested via duplicate solution below
        ("o3", "ownedBy2", "c2"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_group_count_sum(triples):
    got = {
        r.n: (r.n_orders, r.cents)
        for r in bgp_aggregate(
            triples,
            [("?o", "ownedBy", "?c"), ("?c", "inNation", "?n"),
             ("?o", "price", "?p")],
            group_by=["?n"],
            aggs={"n_orders": "count(*)", "cents": "sum(CAST(p AS BIGINT))"},
        ).collect()
    }
    assert got == {"n1": (2, 350), "n2": (1, 70)}


def test_having_order_limit(triples):
    got = bgp_aggregate(
        triples,
        [("?o", "ownedBy", "?c"), ("?c", "inNation", "?n"),
         ("?o", "price", "?p")],
        group_by=["?n"],
        aggs={"cents": "sum(CAST(p AS BIGINT))"},
        having="cents > 100",
        order_by=["cents DESC"],
        limit=1,
    ).collect()
    assert [(r.n, r.cents) for r in got] == [("n1", 350)]


def test_global_aggregate_no_groups(triples):
    row = bgp_aggregate(
        triples,
        [("?o", "price", "?p")],
        group_by=[],
        aggs={"total": "sum(CAST(p AS BIGINT))", "n": "count(*)"},
    ).first()
    assert (row.total, row.n) == (420, 3)


def test_unbound_group_var_rejected(triples):
    with pytest.raises(ValueError, match="not bound"):
        bgp_aggregate(
            triples, [("?o", "price", "?p")], group_by=["?z"],
            aggs={"n": "count(*)"},
        )


def test_minus_removes_compatible_solutions(spark, triples):
    from prase_spark.bgp import bgp_match

    got = sorted(
        r.o
        for r in bgp_match(
            triples,
            [("?o", "ownedBy", "?c")],
            minus=[("?o", "price", "100")],
        ).collect()
    )
    assert got == ["o2", "o3"]  # o1 has price 100 -> removed


def test_minus_disjoint_rejected(spark, triples):
    from prase_spark.bgp import bgp_match

    with pytest.raises(ValueError, match="MINUS"):
        bgp_match(
            triples, [("?o", "ownedBy", "?c")], minus=[("?x", "price", "?p")]
        )


def test_values_inline_data(spark, triples):
    from prase_spark.bgp import bgp_match

    got = sorted(
        (r.c, r.n)
        for r in bgp_match(
            triples,
            [("?c", "inNation", "?n")],
            values={"?n": ["n2"]},
        ).collect()
    )
    assert got == [("c2", "n2"), ("c3", "n2")]
    with pytest.raises(ValueError, match="VALUES"):
        bgp_match(triples, [("?c", "inNation", "?n")], values={"?z": ["x"]})


def test_topk_plan_is_take_ordered(triples):
    q = bgp_aggregate(
        triples,
        [("?o", "price", "?p")],
        group_by=["?o"],
        aggs={"cents": "sum(CAST(p AS BIGINT))"},
        order_by=["cents DESC", "o ASC"],
        limit=2,
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert [r.o for r in q.collect()] == ["o2", "o1"]
