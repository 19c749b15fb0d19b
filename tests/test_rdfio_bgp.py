"""N-Triples serialization round-trip + BGP pattern matching.

Oracle strategy: hand-pinned lines incl. every escape character, a
seeded random-literal round-trip (format -> parse == identity), and a
DuckDB SQL twin for the BGP join semantics.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from prase_spark.bgp import bgp_match
from prase_spark.rdfio import from_ntriples, to_ntriples

TRIPLES = [
    ("http://ex/a", "http://ex/knows", "http://ex/b", False),
    ("http://ex/a", "http://ex/name", 'Ann "The Hammer"', True),
    ("http://ex/b", "http://ex/note", "tab\there\nline2\r\\end", True),
    ("http://ex/b", "http://ex/name", "", True),
]
COLS = ["subj", "pred", "obj", "obj_is_lit"]


def test_to_ntriples_exact_lines(spark):
    got = {r["line"] for r in to_ntriples(spark.createDataFrame(TRIPLES, COLS)).collect()}
    assert got == {
        "<http://ex/a> <http://ex/knows> <http://ex/b> .",
        '<http://ex/a> <http://ex/name> "Ann \\"The Hammer\\"" .',
        '<http://ex/b> <http://ex/note> "tab\\there\\nline2\\r\\\\end" .',
        '<http://ex/b> <http://ex/name> "" .',
    }


def test_roundtrip_identity(spark):
    df = spark.createDataFrame(TRIPLES, COLS)
    back = from_ntriples(to_ntriples(df))
    assert {tuple(r) for r in back.collect()} == set(TRIPLES)


def test_roundtrip_random_literals(spark):
    import random

    rng = random.Random(7)
    alphabet = 'ab"\\\n\r\t xyz'
    rows = [
        (f"http://ex/e{i}", "http://ex/v",
         "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12))),
         True)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, COLS)
    back = from_ntriples(to_ntriples(df))
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_from_ntriples_drops_malformed_and_counts(spark):
    lines = spark.createDataFrame(
        [
            ("<http://ex/a> <http://ex/p> <http://ex/b> .",),
            ("# a comment",),
            ("",),
            ("   ",),
            ("<http://ex/a> <http://ex/p> no-brackets .",),
            ('<http://ex/a> <http://ex/p> "unterminated .',),
            ("<http://ex/a> <missing-object> .",),
        ],
        ["line"],
    )
    stats = {}
    out = from_ntriples(lines, stats_out=stats).collect()
    assert [tuple(r) for r in out] == [("http://ex/a", "http://ex/p", "http://ex/b", False)]
    assert stats["malformed"] == 3  # comments/blanks are not malformed


def _triples_df(spark):
    rows = [
        ("a", "type", "Person"), ("b", "type", "Person"), ("c", "type", "City"),
        ("a", "worksAt", "acme"), ("b", "worksAt", "acme"), ("b", "worksAt", "initech"),
        ("acme", "locatedIn", "berlin"), ("initech", "locatedIn", "tokyo"),
        ("a", "knows", "b"), ("b", "knows", "a"), ("a", "knows", "a"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"]), rows


def test_bgp_chain(spark):
    t, _ = _triples_df(spark)
    got = {
        tuple(r)
        for r in bgp_match(
            t,
            [("?x", "type", "Person"), ("?x", "worksAt", "?y"),
             ("?y", "locatedIn", "berlin")],
        ).collect()
    }
    # columns sorted: (x, y)
    assert got == {("a", "acme"), ("b", "acme")}


def test_bgp_matches_duckdb(spark):
    t, rows = _triples_df(spark)
    got = sorted(
        tuple(r)
        for r in bgp_match(
            t, [("?x", "knows", "?z"), ("?z", "worksAt", "?y")]
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{a}','{b}','{c}')" for a, b, c in rows)
        + ") v(subj, pred, obj)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT DISTINCT p1.subj AS x, p2.obj AS y, p1.obj AS z
            FROM t p1 JOIN t p2 ON p1.obj = p2.subj
            WHERE p1.pred = 'knows' AND p2.pred = 'worksAt'
            """
        ).fetchall()
    )
    assert got == want


def test_bgp_repeated_var_in_one_pattern(spark):
    t, _ = _triples_df(spark)
    got = {tuple(r) for r in bgp_match(t, [("?x", "knows", "?x")]).collect()}
    assert got == {("a",)}


def test_bgp_rejects_cartesian_and_degenerate(spark):
    t, _ = _triples_df(spark)
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(t, [("?x", "type", "Person"), ("?y", "type", "City")])
    with pytest.raises(ValueError, match="binds no variable"):
        bgp_match(t, [("a", "type", "Person")])
    with pytest.raises(ValueError, match="empty pattern list"):
        bgp_match(t, [])


def test_bgp_pushes_constant_filters_to_scan(spark, tmp_path):
    t, rows = _triples_df(spark)
    p = f"{tmp_path}/t.parquet"
    t.write.parquet(p)
    t2 = spark.read.parquet(p)
    out = bgp_match(t2, [("?x", "worksAt", "?y"), ("?y", "locatedIn", "berlin")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the predicate constants must reach the parquet scan, not a
    # post-scan filter only
    assert "PushedFilters" in plan and "worksAt" in plan


def test_blank_nodes_roundtrip_and_parse(spark):
    rows = [
        ("_:b0", "http://ex/p", "http://ex/x", False),
        ("http://ex/a", "http://ex/p", "_:b0", False),
        ("_:b1", "http://ex/name", 'val "q"', True),
    ]
    df = spark.createDataFrame(rows, COLS)
    lines = {r["line"] for r in to_ntriples(df).collect()}
    assert lines == {
        "_:b0 <http://ex/p> <http://ex/x> .",
        "<http://ex/a> <http://ex/p> _:b0 .",
        '_:b1 <http://ex/name> "val \\"q\\"" .',
    }
    back = from_ntriples(to_ntriples(df))
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_typed_and_tagged_literals_stripped(spark):
    lines = spark.createDataFrame(
        [
            ('<http://ex/a> <http://ex/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',),
            ('<http://ex/a> <http://ex/label> "chat"@fr .',),
            ('<http://ex/a> <http://ex/label> "plain" .',),
        ],
        ["line"],
    )
    stats = {}
    got = {tuple(r) for r in from_ntriples(lines, stats_out=stats).collect()}
    # suffix stripped to the lexical form — the same normalization the
    # engine's literal normalizer applies (reference objects/KG.py:71-87)
    assert got == {
        ("http://ex/a", "http://ex/age", "42", True),
        ("http://ex/a", "http://ex/label", "chat", True),
        ("http://ex/a", "http://ex/label", "plain", True),
    }
    assert stats["malformed"] == 0


def test_bgp_optional(spark):
    t, _ = _triples_df(spark)
    got = {
        tuple(r)
        for r in bgp_match(
            t,
            [("?x", "type", "Person")],
            optional=[("?x", "worksAt", "?w")],
        ).collect()
    }
    # a,b both work; optional binds w — cols sorted (w, x)... variable
    # order: sorted(bound) = [w, x]
    assert got == {("acme", "a"), ("acme", "b"), ("initech", "b")}

    # absent optional edge -> NULL binding, row survives
    got2 = {
        tuple(r)
        for r in bgp_match(
            t,
            [("?x", "type", "City")],
            optional=[("?x", "worksAt", "?w")],
        ).collect()
    }
    assert got2 == {(None, "c")}


def test_bgp_optional_rejects_disconnected(spark):
    t, _ = _triples_df(spark)
    with pytest.raises(ValueError, match="optional pattern"):
        bgp_match(t, [("?x", "type", "Person")], optional=[("?z", "type", "City")])


def test_bgp_filter_string_and_column(spark):
    from pyspark.sql import functions as F

    t, _ = _triples_df(spark)
    # knows pairs excluding self-loops (FILTER(?x != ?z))
    got = {
        tuple(r)
        for r in bgp_match(
            t, [("?x", "knows", "?z")], filters=["x <> z"]
        ).collect()
    }
    assert got == {("a", "b"), ("b", "a")}
    # same filter as a Column expression
    got_col = {
        tuple(r)
        for r in bgp_match(
            t, [("?x", "knows", "?z")], filters=[F.col("x") != F.col("z")]
        ).collect()
    }
    assert got_col == got


def test_bgp_filter_null_semantics_on_optional(spark):
    """SPARQL error-eliminates: a comparison over an unbound OPTIONAL
    variable removes the solution (SQL NULL comparison -> not TRUE)."""
    t, _ = _triples_df(spark)
    got = {
        tuple(r)
        for r in bgp_match(
            t,
            [("?x", "type", "City")],
            optional=[("?x", "worksAt", "?w")],
            filters=["w <> 'initech'"],
        ).collect()
    }
    assert got == set()  # w is NULL for the only City solution


def test_bgp_filter_matches_duckdb(spark):
    t, rows = _triples_df(spark)
    got = sorted(
        tuple(r)
        for r in bgp_match(
            t,
            [("?x", "knows", "?z"), ("?z", "worksAt", "?y")],
            filters=["x <> z", "y <> 'initech'"],
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{a}','{b}','{c}')" for a, b, c in rows)
        + ") v(subj, pred, obj)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT DISTINCT k.subj AS x, w.obj AS y, k.obj AS z
            FROM t k JOIN t w ON k.obj = w.subj
            WHERE k.pred = 'knows' AND w.pred = 'worksAt'
              AND k.subj <> k.obj AND w.obj <> 'initech'
            """
        ).fetchall()
    )
    assert got == want


def _path_triples(spark):
    rows = [
        ("a", "locatedIn", "b"), ("b", "locatedIn", "c"), ("c", "locatedIn", "d"),
        ("x", "locatedIn", "y"),
        ("a", "type", "Office"), ("x", "type", "Office"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_bgp_property_path_plus(spark):
    t = _path_triples(spark)
    got = {
        tuple(r) for r in bgp_match(t, [("?s", "locatedIn+", "?t")]).collect()
    }
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("x", "y"),
    }
    # constant endpoint + composition with a plain pattern
    got2 = {
        tuple(r)
        for r in bgp_match(
            t, [("?s", "type", "Office"), ("?s", "locatedIn+", "d")]
        ).collect()
    }
    assert got2 == {("a",)}


def test_bgp_property_path_cycle_safe(spark):
    t = spark.createDataFrame(
        [("a", "next", "b"), ("b", "next", "a"), ("b", "next", "c")],
        ["subj", "pred", "obj"],
    )
    got = {tuple(r) for r in bgp_match(t, [("a", "next+", "?d")]).collect()}
    assert got == {("a",), ("b",), ("c",)}


def test_bgp_property_path_rejects_star(spark):
    t = _path_triples(spark)
    with pytest.raises(ValueError, match="zero-or-more"):
        bgp_match(t, [("?s", "locatedIn*", "?d")])


def test_bgp_inverse_and_alternation_atoms(spark):
    t, _ = _triples_df(spark)
    # inverse: who is worked-at BY whom (employer ?e, person ?p)... cols
    # sorted (e, p)
    got = {
        tuple(r) for r in bgp_match(t, [("?e", "^worksAt", "?p")]).collect()
    }
    assert got == {("acme", "a"), ("acme", "b"), ("initech", "b")}
    # alternation: knows OR worksAt edges from a
    got2 = {
        tuple(r) for r in bgp_match(t, [("a", "knows|worksAt", "?y")]).collect()
    }
    assert got2 == {("a",), ("b",), ("acme",)}


def test_bgp_alternation_with_inverse_closure(spark):
    """(down|^up)+ mixed-direction reachability: up edges traversed
    backwards participate in the same closure as down edges."""
    t = spark.createDataFrame(
        [("a", "down", "b"), ("c", "up", "b"), ("c", "down", "d")],
        ["subj", "pred", "obj"],
    )
    got = {tuple(r) for r in bgp_match(t, [("a", "down|^up+", "?y")]).collect()}
    # a -down-> b -(^up)-> c -down-> d
    assert got == {("b",), ("c",), ("d",)}


def test_bgp_malformed_path_atom_rejected(spark):
    t, _ = _triples_df(spark)
    with pytest.raises(ValueError, match="malformed path atom"):
        bgp_match(t, [("?x", "knows|", "?y")])
    with pytest.raises(ValueError, match="malformed path atom"):
        bgp_match(t, [("?x", "^", "?y")])


# ---- UNION ----


def test_bgp_union_basic_and_bag(spark):
    from prase_spark.bgp import bgp_union

    t, _ = _triples_df(spark)
    # { ?x worksAt acme } UNION { ?x type City }
    groups = [
        [("?x", "worksAt", "acme")],
        [("?x", "type", "City")],
    ]
    got = sorted(r["x"] for r in bgp_union(t, groups).collect())
    assert got == ["a", "b", "c"]
    # bag semantics keeps per-branch duplicates AND cross-branch repeats
    groups_dup = [
        [("?x", "worksAt", "?w")],   # a, b, b (bag of solutions projects)
        [("?x", "type", "Person")],  # a, b
    ]
    bag = sorted(
        r["x"]
        for r in bgp_union(
            t, [[("?x", "worksAt", "?w")], [("?x", "type", "Person")]],
            distinct=False,
        ).select("x").collect()
    )
    assert bag == ["a", "a", "b", "b", "b"]
    del groups_dup


def test_bgp_union_null_pads_branch_only_vars(spark):
    from prase_spark.bgp import bgp_union

    t, _ = _triples_df(spark)
    # branch 2 binds ?w, branch 1 does not -> NULL w on branch-1 rows
    got = sorted(
        (r["x"], r["w"])
        for r in bgp_union(
            t,
            [[("?x", "type", "City")], [("?x", "worksAt", "?w")]],
        ).collect()
    )
    assert got == [
        ("a", "acme"), ("b", "acme"), ("b", "initech"), ("c", None)
    ]


def test_bgp_union_with_branch_filters_matches_duckdb(spark):
    from prase_spark.bgp import bgp_union

    t, rows = _triples_df(spark)
    got = sorted(
        (r["x"], r["y"])
        for r in bgp_union(
            t,
            [
                {"patterns": [("?x", "worksAt", "?y")],
                 "filters": ["y <> 'acme'"]},
                {"patterns": [("?x", "knows", "?y")],
                 "filters": ["x <> y"]},
            ],
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{a}','{b}','{c}')" for a, b, c in rows)
        + ") v(subj, pred, obj)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT subj AS x, obj AS y FROM t"
            " WHERE pred='worksAt' AND obj <> 'acme'"
            " UNION"
            " SELECT subj, obj FROM t WHERE pred='knows' AND subj <> obj"
        ).fetchall()
    )
    assert got == want


def test_bgp_union_rejects_single_group(spark):
    from prase_spark.bgp import bgp_union

    t, _ = _triples_df(spark)
    with pytest.raises(ValueError, match="UNION"):
        bgp_union(t, [[("?x", "type", "Person")]])
