"""As-of join (prase_spark.asof) — DuckDB native ASOF JOIN as the
semantic oracle, inclusivity, tiebreak, null keys, name collisions."""

from __future__ import annotations

import duckdb
import pytest

from prase_spark.asof import asof_join

L = [(1, 100, "a"), (1, 205, "b"), (1, 50, "c"), (2, 100, "d"), (3, 100, "e"),
     (None, 100, "f")]
R = [(1, 100, 10), (1, 200, 20), (2, 90, 30), (None, 50, 40)]


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(L, "k INT, t LONG, tag STRING")
    right = spark.createDataFrame(R, "k INT, t LONG, v INT")
    return left, right


def duck_oracle():
    con = duckdb.connect()
    con.sql("CREATE TABLE l(k INT, t BIGINT, tag VARCHAR)")
    con.sql("CREATE TABLE r(k INT, t BIGINT, v INT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", L)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", R)
    return {
        row[0]: row[1]
        for row in con.sql(
            "SELECT l.tag, r.v FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }


def test_matches_duckdb_asof(frames):
    left, right = frames
    got = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    want = duck_oracle()
    assert got == want
    # spot semantics: inclusive match at equal ts, no match before first
    assert got["a"] == 10 and got["c"] is None and got["b"] == 20
    assert got["f"] is None  # null key matches nothing


def test_tiebreak_dedupes_equal_instants(spark):
    left = spark.createDataFrame([(1, 100)], "k INT, t LONG")
    right = spark.createDataFrame(
        [(1, 100, 7, "lo"), (1, 100, 9, "hi")], "k INT, t LONG, seq INT, v STRING"
    )
    row = asof_join(left, right, on="t", by="k", tiebreak_col="seq").first()
    assert (row["seq"], row["v"]) == (9, "hi")


def test_collision_suffix_and_right_cols(frames):
    left, right = frames
    out = asof_join(left, right, on="t", by="k", right_cols=["t", "v"])
    assert set(out.columns) == {"k", "t", "tag", "t_r", "v"}
    got = {r["tag"]: r["t_r"] for r in out.collect()}
    assert got["b"] == 200 and got["c"] is None


def test_partitioning_invariance(frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left, right, on="t", by="k").collect()), key=repr)
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(5), right.repartition(3), on="t", by="k"
            ).collect(),
        ),
        key=repr,
    )
    assert a == b
