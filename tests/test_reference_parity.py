"""Direct parity with the reference implementation (north_rule: match the
reference's emitted links at P/R >= 0.95).

Runs the actual PRASE-Python reference (read-only at /root/reference) on
the same synthetic two-KG fixture via its public API (test.py:10-71 usage),
then compares its emitted entity alignment against ours. The reference is
executed as a black-box oracle — no code is copied; skipped cleanly if the
reference tree is absent.
"""

import os
import sys

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)


def _write_fixture_tsvs(fx, tmp_path):
    """Materialize the fixture as the reference's TSV input format
    (rel_triples_*/attr_triples_*, test.py:10-34)."""
    paths = {}
    for side, raw in (("1", fx["raw_l"]), ("2", fx["raw_r"])):
        rows = raw.collect()
        rel = tmp_path / f"rel_triples_{side}"
        attr = tmp_path / f"attr_triples_{side}"
        with open(rel, "w", encoding="utf8") as fr, open(attr, "w", encoding="utf8") as fa:
            for r in rows:
                line = f"{r['subj']}\t{r['pred']}\t{r['obj']}\n"
                (fa if r["is_attr"] else fr).write(line)
        paths[side] = (str(rel), str(attr))
    return paths


def _run_reference(paths, gold_path, iterations=3, workers=2):
    """Drive the reference KG/KGs API; returns {name_l: (name_r, prob)}."""
    sys.path.insert(0, REFERENCE)
    try:
        from objects.KG import KG
        from objects.KGs import KGs

        def load(kg, rel_path, attr_path):
            with open(rel_path, encoding="utf8") as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) == 3:
                        kg.insert_relation_tuple(parts[0], parts[1], parts[2])
            with open(attr_path, encoding="utf8") as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) == 3:
                        kg.insert_attribute_tuple(parts[0], parts[1], parts[2])

        kg1, kg2 = KG(name="fx1"), KG(name="fx2")
        load(kg1, *paths["1"])
        load(kg2, *paths["2"])
        kg1.init()
        kg2.init()
        kgs = KGs(kg1=kg1, kg2=kg2, iteration=iterations, workers=workers)
        kgs.run(test_path=gold_path)  # run() evaluates after each iteration
        out = {}
        for ent in kgs.kg_l.entity_set:
            cp = kgs.sub_ent_match[ent.id]
            if cp is not None:
                out[ent.name] = (
                    kgs.kg_r.ent_lite_list_by_id[cp].name,
                    kgs.sub_ent_prob[ent.id],
                )
        return out
    finally:
        sys.path.remove(REFERENCE)
        for mod in list(sys.modules):
            if mod.startswith(("objects", "model")):
                del sys.modules[mod]


def test_alignment_matches_reference(spark, tmp_path):
    from prase_spark.config import ParisConfig
    from prase_spark.fixtures import two_kg_fixture
    from prase_spark.kgbuild import build_kg
    from prase_spark.pipeline import align

    fx = two_kg_fixture(spark, n_ent=120, seed=42)
    paths = _write_fixture_tsvs(fx, tmp_path)
    gold_path = tmp_path / "ent_links"
    with open(gold_path, "w", encoding="utf8") as f:
        for a, b in fx["gold_names"]:
            f.write(f"{a}\t{b}\n")
    ref = _run_reference(paths, str(gold_path), iterations=3)
    ref_pairs = {(l, r) for l, (r, p) in ref.items() if p >= 0.1}
    assert len(ref_pairs) > 60, "reference produced too few links to compare"

    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    run = align(spark, kg_l, kg_r, ParisConfig(iterations=3), checkpoint=False)
    names_l = {r["ent_id"]: r["name"] for r in kg_l.nodes.collect()}
    names_r = {r["ent_id"]: r["name"] for r in kg_r.nodes.collect()}
    ours = {
        (names_l[r["ent_id"]], names_r[r["counterpart_id"]])
        for r in run.state.matches_sub.collect()
        if not r["is_lit"] and r["prob"] >= 0.1
    }

    inter = len(ref_pairs & ours)
    precision = inter / len(ours) if ours else 0.0
    recall = inter / len(ref_pairs)
    assert precision >= 0.95, (precision, recall, len(ours), len(ref_pairs))
    assert recall >= 0.95, (precision, recall, len(ours), len(ref_pairs))
