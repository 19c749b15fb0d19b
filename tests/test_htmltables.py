"""HTML table extraction (WebTables-style) — prase_spark/htmltables.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prase_spark.htmltables import (
    parse_tables,
    table_cells,
    table_stats,
    tables_to_triples,
)

PAGE = """<html><body>
<table class="wikitable">
 <caption>People</caption>
 <thead><tr><th>Name</th><th> Born </th><th>Employer</th></tr></thead>
 <tbody>
  <tr><td><a href="/e/7">Person 7</a></td><td>1907</td><td><b>Org</b> 7</td></tr>
  <tr><td>Person 8</td><td>1908</td></tr>
  <tr><td>Person 9</td><td>1909</td><td>Org 9</td><td>EXTRA</td></tr>
  <tr><td></td><td>1910</td><td>Org 10</td></tr>
 </tbody>
</table>
<table><tr><td>plain a</td><td>x</td></tr><tr><td>plain b</td><td>y</td></tr></table>
<table><caption>empty</caption></table>
</body></html>"""


class TestParse:
    def test_header_detection_and_shape(self):
        tables = parse_tables(PAGE)
        assert len(tables) == 2  # the cell-less table is skipped
        t0, t1 = tables
        assert t0["headers"] == ["Name", "Born", "Employer"]
        assert t0["header_from_th"] and not t1["header_from_th"]
        assert t1["headers"] == ["col0", "col1"]
        assert len(t0["rows"]) == 4 and len(t1["rows"]) == 2

    def test_cell_text_strips_tags_and_collapses_ws(self):
        t0 = parse_tables(PAGE)[0]
        assert t0["rows"][0] == ["Person 7", "1907", "Org 7"]

    def test_ragged_rows_counted_padded_truncated(self):
        t0 = parse_tables(PAGE)[0]
        assert t0["n_ragged"] == 2
        assert t0["rows"][1] == ["Person 8", "1908", None]  # narrow -> NULL pad
        assert t0["rows"][2] == ["Person 9", "1909", "Org 9"]  # wide -> truncated

    def test_no_tables(self):
        assert parse_tables("<html><p>no tables</p></html>") == []

    def test_deterministic(self):
        assert parse_tables(PAGE) == parse_tables(PAGE)


@pytest.fixture()
def pages_df(spark):
    rows = [("u1", PAGE.encode()), ("u2", b"<html>none</html>"), ("u3", None)]
    return spark.createDataFrame(rows, "url string, html binary")


class TestSpark:
    def test_table_cells(self, pages_df):
        rows = table_cells(pages_df).collect()
        assert {r.url for r in rows} == {"u1"}
        got = {(r.table_idx, r.row_idx, r.col_idx): (r.header, r.value) for r in rows}
        assert got[(0, 0, 0)] == ("Name", "Person 7")
        assert got[(0, 1, 2)] == ("Employer", None)
        assert got[(1, 0, 0)] == ("col0", "plain a")
        assert len(rows) == 4 * 3 + 2 * 2

    def test_table_stats(self, pages_df):
        stats = {(r.url, r.table_idx): r for r in table_stats(pages_df).collect()}
        s0 = stats[("u1", 0)]
        assert (s0.n_cols, s0.n_rows, s0.n_ragged, s0.header_from_th) == (3, 4, 2, True)
        s1 = stats[("u1", 1)]
        assert (s1.n_cols, s1.n_rows, s1.header_from_th) == (2, 2, False)

    def test_tables_to_triples(self, pages_df):
        trips = {(r.subj, r.pred, r.obj) for r in tables_to_triples(pages_df).collect()}
        assert ("Person 7", "Born", "1907") in trips
        assert ("Person 7", "Employer", "Org 7") in trips
        assert ("Person 8", "Born", "1908") in trips
        # NULL employer cell dropped; empty-subject row dropped entirely
        assert not any(s == "Person 8" and p == "Employer" for s, p, _ in trips)
        assert not any(o == "Org 10" for _, _, o in trips)
        assert ("plain a", "col1", "x") in trips
        assert len(trips) == 2 + 1 + 2 + 2  # rows 7/8/9 + two plain rows

    def test_parallelism_invariance(self, pages_df):
        one = sorted(map(tuple, table_cells(pages_df.repartition(1)).collect()),
                     key=repr)
        many = sorted(map(tuple, table_cells(pages_df.repartition(7)).collect()),
                      key=repr)
        assert one == many

    def test_cells_plan_is_single_map_stage(self, pages_df):
        plan = table_cells(pages_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_triples_plan_no_cartesian(self, pages_df):
        plan = tables_to_triples(pages_df)._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
