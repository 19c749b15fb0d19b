"""shapes: characteristic sets, VoID property partitions, SHACL-core.

Load-bearing claims:
- characteristic_sets groups subjects by their EXACT distinct-predicate
  set over the distinct triple store (duplicates neither add a
  predicate nor a countable triple), with exact subject/triple counts;
- property_partitions reproduces VoID triples/distinctSubjects/
  distinctObjects per predicate exactly;
- shacl_validate emits exactly the SHACL-core violation rows a
  hand-evaluated report contains: minCount counts a pathless focus as
  0, maxCount fires above the bound, inversePath counts object-side
  edges, pattern counts distinct offending values, class counts
  distinct untyped values — and a conformant graph yields an empty
  report.
"""

from __future__ import annotations

from prase_spark.shapes import (
    characteristic_sets,
    property_partitions,
    shacl_validate,
)


def _to_df(spark, triples):
    return spark.createDataFrame(
        [tuple(t) for t in triples], "subj string, pred string, obj string"
    )


KG = [
    # two orders, typed
    ("o1", "rdf:type", "Order"),
    ("o2", "rdf:type", "Order"),
    ("o1", "placedBy", "c1"),
    ("o1", "placedBy", "c2"),        # o1 has TWO buyers -> maxCount viol
    ("o2", "placedBy", "c9"),        # c9 untyped -> class viol
    ("o1", "ship", "n1"),
    ("o2", "ship", "nXX"),           # bad value -> pattern viol
    ("o2", "ship", "nXX"),           # duplicate assertion (must collapse)
    # customers, typed; c3 has no nation edge -> minCount viol
    ("c1", "rdf:type", "Customer"),
    ("c2", "rdf:type", "Customer"),
    ("c3", "rdf:type", "Customer"),
    ("c1", "inNation", "n1"),
    ("c2", "inNation", "n2"),
    # only c1 is served -> inverse minCount viols for c2, c3
    ("n1", "servedBy", "c1"),
]

SHAPES = [
    {
        "shape": "OrderShape",
        "target_class": ("rdf:type", "Order"),
        "constraints": [
            {"path": "placedBy", "min_count": 1, "max_count": 1},
            {"path": "ship", "pattern": "^n[0-9]+$"},
            {"path": "placedBy", "class": "Customer", "class_pred": "rdf:type"},
        ],
    },
    {
        "shape": "CustomerShape",
        "target_class": ("rdf:type", "Customer"),
        "constraints": [
            {"path": "inNation", "min_count": 1},
            {"path": "servedBy", "inverse": True, "min_count": 1},
        ],
    },
]


def test_characteristic_sets_exact(spark):
    rows = {
        r["preds"]: (r["n_subjects"], r["n_triples"])
        for r in characteristic_sets(_to_df(spark, KG)).collect()
    }
    assert rows == {
        "placedBy|rdf:type|ship": (2, 7),   # o1: 4 distinct, o2: 3 distinct
        "inNation|rdf:type": (2, 4),
        "rdf:type": (1, 1),                 # c3
        "servedBy": (1, 1),                 # n1
    }


def test_property_partitions_exact(spark):
    rows = {
        r["pred"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in property_partitions(_to_df(spark, KG)).collect()
    }
    assert rows == {
        "rdf:type": (5, 5, 2),
        "placedBy": (3, 2, 3),
        "ship": (2, 2, 2),      # duplicate (o2, ship, nXX) collapsed
        "inNation": (2, 2, 2),
        "servedBy": (1, 1, 1),
    }


def test_shacl_report_exact(spark):
    got = {
        (r["shape"], r["focus"], r["path"], r["constraint"]): r["n_bad"]
        for r in shacl_validate(_to_df(spark, KG), SHAPES).collect()
    }
    assert got == {
        ("OrderShape", "o1", "placedBy", "maxCount"): 2,
        ("OrderShape", "o2", "ship", "pattern"): 1,
        ("OrderShape", "o2", "placedBy", "class"): 1,
        ("CustomerShape", "c3", "inNation", "minCount"): 0,
        ("CustomerShape", "c2", "^servedBy", "minCount"): 0,
        ("CustomerShape", "c3", "^servedBy", "minCount"): 0,
    }


def test_conformant_graph_empty_report(spark):
    kg = [
        ("o1", "rdf:type", "Order"),
        ("o1", "placedBy", "c1"),
        ("o1", "ship", "n1"),
        ("c1", "rdf:type", "Customer"),
    ]
    shapes = [
        {
            "shape": "OrderShape",
            "target_class": ("rdf:type", "Order"),
            "constraints": [
                {"path": "placedBy", "min_count": 1, "max_count": 1},
                {"path": "ship", "pattern": "^n[0-9]+$"},
                {"path": "placedBy", "class": "Customer"},
            ],
        }
    ]
    assert shacl_validate(_to_df(spark, kg), shapes).count() == 0
