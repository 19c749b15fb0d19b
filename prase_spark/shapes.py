"""KG shape statistics and validation over the triple store.

Three operators a production KG-construction pipeline runs between
"entities are canonical" and "graph is published" — none exist in the
reference (its output is consumed by the alignment evaluator directly,
/root/reference/test.py:105-118), but any consumer of a 10^12-triple
store needs them:

- :func:`characteristic_sets` — the Neumann & Moerkotte (ICDE 2011)
  statistic: group subjects by their exact set of distinct predicates.
  This is THE cardinality-estimation structure for star-join planning
  over triple stores (RDF-3X); it is also the cheapest schema-discovery
  report for a freshly-constructed KG ("what does an entity of this
  shape look like, and how many are there").
- :func:`property_partitions` — VoID-vocabulary property partitions:
  per predicate, the triple count and distinct subject/object counts.
  The standard dataset-description block published next to any RDF dump.
- :func:`shacl_validate` — SHACL-core structural validation: per
  node shape (targetClass), check cardinality (sh:minCount /
  sh:maxCount, with sh:inversePath), value pattern (sh:pattern) and
  value class (sh:class) constraints, emitting the per-focus-node
  violation report SHACL engines produce.

Scale shape (the part that must hold at 10^12 triples):
- every operator starts from ONE projected scan of the triple table —
  characteristic sets project (subj, pred) only, dropping the object
  column before the shuffle;
- all counting is hash aggregation with map-side partial combine;
  per-subject predicate sets are bounded by the schema's predicate
  vocabulary (thousands), never by data volume;
- validation constraints pre-aggregate the edge side to one row per
  focus node BEFORE joining the focus set, so each constraint is one
  filtered scan + one hash agg + one equi-join — no windows, no
  all-pairs, and Catalyst pushes the predicate-constant filters into
  a predicate-partitioned store's pruning.

Every output value is a STRING or an exact BIGINT — the DuckDB twin
reproduces each number bit-for-bit, so the gates hash the full report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def characteristic_sets(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    sep: str = "|",
) -> DataFrame:
    """DataFrame[preds, n_subjects, n_triples]: one row per distinct
    characteristic set (the sorted set of predicates a subject uses,
    serialized ``sep``-joined), with the number of subjects having
    exactly that set and their total (distinct-)triple count.

    Defined over the DISTINCT triple set, matching the literature (a
    duplicate assertion neither adds a predicate nor a countable
    triple). The first aggregation shuffles only (subj, pred) pairs —
    the object column is pruned before the exchange; the second groups
    the per-subject rows (|subjects| << |triples|) by their set string.
    """
    t = triples.select(subj, pred, obj).distinct()
    per_subj = (
        t.select(subj, pred)
        .groupBy(subj)
        .agg(
            F.concat_ws(sep, F.sort_array(F.collect_set(pred))).alias("preds"),
            F.count("*").alias("nt"),
        )
    )
    return per_subj.groupBy("preds").agg(
        F.count("*").cast("bigint").alias("n_subjects"),
        F.sum("nt").cast("bigint").alias("n_triples"),
    )


def property_partitions(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """VoID property partitions: DataFrame[pred, n_triples,
    n_subjects, n_objects] over the distinct triple set — per
    predicate, void:triples / void:distinctSubjects /
    void:distinctObjects. One hash aggregation; the two distinct
    counts expand the same shuffle, never a second scan."""
    t = triples.select(subj, pred, obj).distinct()
    return t.groupBy(F.col(pred).alias("pred")).agg(
        F.count("*").cast("bigint").alias("n_triples"),
        F.countDistinct(subj).cast("bigint").alias("n_subjects"),
        F.countDistinct(obj).cast("bigint").alias("n_objects"),
    )


def shacl_validate(
    triples: DataFrame,
    shapes,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """SHACL-core validation report: DataFrame[shape, focus, path,
    constraint, n_bad] — one row per (focus node, violated constraint).

    ``shapes`` is a list of dicts::

        {"shape": "CustomerShape",
         "target_class": ("rdf:type", "Customer"),   # sh:targetClass
         "constraints": [
            {"path": "memberOf", "min_count": 1},          # sh:minCount
            {"path": "inNation", "max_count": 1},          # sh:maxCount
            {"path": "servedBy", "inverse": True,          # sh:inversePath
             "min_count": 1},
            {"path": "inNation", "pattern": "^n1?[0-9]$"}, # sh:pattern
            {"path": "placedBy", "class": "Customer",      # sh:class
             "class_pred": "rdf:type"},
         ]}

    Semantics per constraint kind (all over the distinct triple set):
    - ``min_count`` / ``max_count``: the focus node's edge count on
      ``path`` (absent path counts 0 for min_count); ``n_bad`` is the
      ACTUAL count, so the report carries the evidence, not just the
      verdict. ``inverse: True`` counts edges whose OBJECT is the
      focus (sh:inversePath).
    - ``pattern``: values on ``path`` not matching the (Java) regex;
      ``n_bad`` = number of distinct offending values for that focus.
    - ``class``: values on ``path`` lacking a ``(class_pred, class)``
      type assertion; ``n_bad`` = distinct untyped values per focus.

    A focus node violating k constraints yields k rows; a fully
    conformant graph yields an empty report. Scale: the edge side of
    every check aggregates to one row per focus before touching the
    focus set, and the class check's member set is a distinct
    projection joined left-anti on the value column.
    """
    t = triples.select(subj, pred, obj).distinct()
    reports = []
    for sh in shapes:
        name = sh["shape"]
        tc_pred, tc_obj = sh["target_class"]
        focus = (
            t.where((F.col(pred) == tc_pred) & (F.col(obj) == tc_obj))
            .select(F.col(subj).alias("focus"))
            .distinct()
        )
        for c in sh["constraints"]:
            path = c["path"]
            inv = bool(c.get("inverse", False))
            edges = t.where(F.col(pred) == F.lit(path)).select(
                F.col(obj if inv else subj).alias("focus"),
                F.col(subj if inv else obj).alias("value"),
            )
            pname = ("^" + path) if inv else path

            def _report(df, kind):
                reports.append(
                    df.select(
                        F.lit(name).alias("shape"),
                        "focus",
                        F.lit(pname).alias("path"),
                        F.lit(kind).alias("constraint"),
                        F.col("n_bad").cast("bigint").alias("n_bad"),
                    )
                )

            if "min_count" in c or "max_count" in c:
                ecnt = edges.groupBy("focus").agg(F.count("*").alias("n"))
                cnt = focus.join(ecnt, "focus", "left").select(
                    "focus", F.coalesce(F.col("n"), F.lit(0)).alias("n_bad")
                )
                if "min_count" in c:
                    _report(
                        cnt.where(F.col("n_bad") < int(c["min_count"])),
                        "minCount",
                    )
                if "max_count" in c:
                    _report(
                        cnt.where(F.col("n_bad") > int(c["max_count"])),
                        "maxCount",
                    )
            if "pattern" in c:
                bad = (
                    edges.where(~F.col("value").rlike(c["pattern"]))
                    .groupBy("focus")
                    .agg(F.countDistinct("value").alias("n_bad"))
                    .join(focus, "focus")
                )
                _report(bad, "pattern")
            if "class" in c:
                cls_pred = c.get("class_pred", "rdf:type")
                members = (
                    t.where(
                        (F.col(pred) == cls_pred)
                        & (F.col(obj) == F.lit(c["class"]))
                    )
                    .select(F.col(subj).alias("value"))
                    .distinct()
                )
                bad = (
                    edges.join(members, "value", "left_anti")
                    .groupBy("focus")
                    .agg(F.countDistinct("value").alias("n_bad"))
                    .join(focus, "focus")
                )
                _report(bad, "class")
    if not reports:
        raise ValueError("shapes declared no constraints")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
