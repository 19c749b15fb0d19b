"""bgp_construct: SPARQL CONSTRUCT over BGP solutions.

Load-bearing claims:
- template triples are built per solution with variables substituted
  and constants passed through, RDF set semantics (distinct);
- bag semantics under the hood: a solution reachable two ways still
  yields ONE constructed triple after distinct, but distinct=False
  keeps the bag;
- OPTIONAL-unbound template positions drop that template triple only
  (SPARQL incomplete-triple rule);
- unbound template variables are rejected eagerly.
"""

from __future__ import annotations

import pytest

from prase_spark.bgp import bgp_construct

KG = [
    ("c1", "inNation", "n1"),
    ("c2", "inNation", "n2"),
    ("o1", "placedBy", "c1"),
    ("o2", "placedBy", "c1"),      # two orders -> same (c1 livesIn n1)
    ("c1", "email", "e1"),
]


def _df(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def test_construct_basic_and_set_semantics(spark):
    got = {
        tuple(r)
        for r in bgp_construct(
            _df(spark),
            [("?c", "inNation", "?n"), ("?o", "placedBy", "?c")],
            [("?c", "livesIn", "?n"), ("?n", "hosts", "?c")],
        ).collect()
    }
    # only c1 has orders; two solutions (o1, o2) collapse to one triple
    assert got == {("c1", "livesIn", "n1"), ("n1", "hosts", "c1")}


def test_bag_semantics_when_not_distinct(spark):
    rows = bgp_construct(
        _df(spark),
        [("?c", "inNation", "?n"), ("?o", "placedBy", "?c")],
        [("?c", "livesIn", "?n")],
        distinct=False,
    ).collect()
    assert len(rows) == 2  # one per order


def test_optional_unbound_drops_template_triple(spark):
    got = {
        tuple(r)
        for r in bgp_construct(
            _df(spark),
            [("?c", "inNation", "?n")],
            [("?c", "livesIn", "?n"), ("?c", "contact", "?e")],
            optional=[("?c", "email", "?e")],
        ).collect()
    }
    assert got == {
        ("c1", "livesIn", "n1"),
        ("c2", "livesIn", "n2"),
        ("c1", "contact", "e1"),   # c2 has no email -> no contact triple
    }


def test_unbound_template_variable_rejected(spark):
    with pytest.raises(ValueError, match="not bound"):
        bgp_construct(
            _df(spark), [("?c", "inNation", "?n")], [("?c", "x", "?zz")]
        )
