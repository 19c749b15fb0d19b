"""KG build unit tests: dict-encode, INV-union, functionality (hand-checked
tiny KG per FIXTURES.md §4; reference objects/KG.py:145-235,
objects/Relation.py:45-49)."""

import pytest
from pyspark.sql import functions as F

from prase_spark.kgbuild import build_kg, kg_info, top_functionality
from prase_spark.schemas import RAW_TRIPLES

TINY = [
    # (subj, pred, obj, is_attr)
    ("A", "likes", "B", False),
    ("A", "likes", "C", False),
    ("B", "likes", "C", False),
    ("A", "likes", "B", False),        # duplicate: counted in frequency
    ("A", "name", "alice", True),
    ("B", "name", "alice", True),      # shared literal
    ("C", "name", "carol", True),
]


@pytest.fixture(scope="module")
def tiny_kg(spark):
    return build_kg(spark.createDataFrame(TINY, RAW_TRIPLES))


def test_node_id_space(tiny_kg):
    nodes = {r["name"]: (r["ent_id"], r["is_literal"]) for r in tiny_kg.nodes.collect()}
    # entities A,B,C then literals alice,carol — entities first, dense ids
    # (objects/KG.py:202-210,227-228)
    assert nodes["A"][0] == 0 and nodes["B"][0] == 1 and nodes["C"][0] == 2
    assert sorted(v[0] for v in nodes.values()) == [0, 1, 2, 3, 4]
    assert nodes["alice"] == (3, True) and nodes["carol"] == (4, True)


def test_predicate_id_space(tiny_kg):
    preds = {r["name"]: (r["pred_id"], r["is_attribute"], r["is_inv"]) for r in tiny_kg.predicates.collect()}
    # relations (incl INV) before attributes
    assert set(preds) == {"likes", "likes-(INV)", "name", "name-(INV)"}
    assert preds["likes"][0] < preds["name"][0]
    assert preds["likes-(INV)"] == (1, False, True)
    assert preds["name-(INV)"][1:] == (True, True)


def test_inv_doubling_and_counts(tiny_kg):
    info = kg_info(tiny_kg)
    assert info == {
        "relation_tuples": 4,
        "attribute_tuples": 3,
        "entities": 3,
        "literals": 2,
        "relations": 1,
        "attributes": 1,
    }


def test_functionality_exact(tiny_kg):
    preds = {r["name"]: r["pred_id"] for r in tiny_kg.predicates.collect()}
    fun = {r["pred_id"]: (r["functionality"], r["functionality_inv"]) for r in tiny_kg.functionality.collect()}
    # likes: 4 inserts (dup counted), heads {A,B}=2, tails {B,C}=2 -> 0.5, 0.5
    assert fun[preds["likes"]] == (0.5, 0.5)
    # likes-(INV): heads {B,C}, tails {A,B}, freq 4
    assert fun[preds["likes-(INV)"]] == (0.5, 0.5)
    # name: 3 inserts, heads {A,B,C}=3, tails {alice,carol}=2 -> 1.0, 2/3
    assert fun[preds["name"]] == (1.0, 2.0 / 3.0)
    assert fun[preds["name-(INV)"]] == (2.0 / 3.0, 1.0)


def test_literal_flags_on_triples(tiny_kg):
    rows = tiny_kg.triples.join(
        tiny_kg.predicates.select(F.col("pred_id").alias("pred"), "name"), "pred"
    ).collect()
    for r in rows:
        if r["name"] == "name":
            assert not r["subj_is_lit"] and r["obj_is_lit"]
        if r["name"] == "name-(INV)":
            assert r["subj_is_lit"] and not r["obj_is_lit"]
        if r["name"].startswith("likes"):
            assert not r["subj_is_lit"] and not r["obj_is_lit"]


def test_top_functionality(tiny_kg):
    top = top_functionality(tiny_kg, is_attribute=True, inverse=False, num=10).collect()
    assert top[0]["name"] == "name" and top[0]["func"] == 1.0


def test_duplicate_triples_preserved(tiny_kg):
    # 4 'likes' forward rows (duplicate kept) — frequency semantics
    preds = {r["name"]: r["pred_id"] for r in tiny_kg.predicates.collect()}
    n = tiny_kg.triples.filter(F.col("pred") == preds["likes"]).count()
    assert n == 4
