"""Fact versioning (SCD-2 intervals) + point-in-time snapshots."""

from prase_spark.temporal import fact_history, facts_asof


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts long"
    )


def test_fact_history_runs_collapse(spark):
    facts = _facts(
        spark,
        [
            # S1/p: v1 v1 v2 v2 v1 -> three versions (value REVISITS re-open)
            ("S1", "p", "v1", 10), ("S1", "p", "v1", 20),
            ("S1", "p", "v2", 30), ("S1", "p", "v2", 40),
            ("S1", "p", "v1", 50),
            # S2/p: single capture -> one open version
            ("S2", "p", "x", 15),
        ],
    )
    got = sorted(
        map(tuple, fact_history(facts).collect()),
        key=lambda r: (r[0], r[3]),
    )
    assert got == [
        ("S1", "p", "v1", 10, 30, False),
        ("S1", "p", "v2", 30, 50, False),
        ("S1", "p", "v1", 50, None, True),
        ("S2", "p", "x", 15, None, True),
    ]


def test_facts_asof_snapshot(spark):
    hist = fact_history(
        _facts(
            spark,
            [("S", "p", "a", 10), ("S", "p", "b", 30), ("S", "q", "z", 40)],
        )
    )
    at25 = {(r.subj, r.pred): r.obj for r in facts_asof(hist, 25).collect()}
    assert at25 == {("S", "p"): "a"}
    at40 = {(r.subj, r.pred): r.obj for r in facts_asof(hist, 40).collect()}
    assert at40 == {("S", "p"): "b", ("S", "q"): "z"}
    # boundary: a version starting exactly at ts is visible
    at30 = {(r.subj, r.pred): r.obj for r in facts_asof(hist, 30).collect()}
    assert at30[("S", "p")] == "b"


def test_fact_history_parallelism_invariant(spark):
    rows = [
        ("S%d" % (i % 7), "p%d" % (i % 2), "v%d" % (i // 20), i)
        for i in range(60)
    ]
    facts = _facts(spark, rows)
    one = sorted(map(tuple, fact_history(facts.coalesce(1)).collect()))
    many = sorted(map(tuple, fact_history(facts.repartition(9)).collect()))
    assert one == many


def test_kg_diff_multiset(spark):
    from prase_spark.temporal import kg_diff

    old = spark.createDataFrame(
        [
            ("S1", "p", "a"),            # unchanged
            ("S2", "p", "x"),            # value change -> removed
            ("S3", "p", "gone"),         # removed
            ("S4", "p", "dup"), ("S4", "p", "dup"),  # 2 copies -> 1 in new
        ],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [
            ("S1", "p", "a"),
            ("S2", "p", "y"),            # value change -> added
            ("S4", "p", "dup"),          # one copy fewer -> removed
            ("S5", "p", "brand"),        # added
        ],
        "subj string, pred string, obj string",
    )
    got = sorted(map(tuple, kg_diff(old, new).collect()))
    assert got == [
        ("S2", "p", "x", "removed"),
        ("S2", "p", "y", "added"),
        ("S3", "p", "gone", "removed"),
        ("S4", "p", "dup", "removed"),
        ("S5", "p", "brand", "added"),
    ]
