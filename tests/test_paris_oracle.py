"""Value-level validation of the Spark PARIS DAG against the independent
pure-Python Jacobi oracle (tests/oracle_paris.py) on the synthetic two-KG
fixture — FIXTURES.md §4 item 2."""

import pytest
from pyspark.sql import functions as F

from prase_spark.config import ParisConfig
from prase_spark.fixtures import two_kg_fixture
from prase_spark.kgbuild import build_kg
from prase_spark.matching import bipartite_match
from prase_spark.paris import half_iteration, init_state, run_iteration
from prase_spark.seed import literal_seed_matches, max_merge
from tests.oracle_paris import (
    bipartite_oracle,
    half_iteration_oracle,
    max_merge_oracle,
)

CFG = ParisConfig()


@pytest.fixture(scope="module")
def setup(spark):
    fx = two_kg_fixture(spark, n_ent=80, seed=42)
    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    sub, sup = literal_seed_matches(kg_l, kg_r)
    sub, sup = sub.persist(), sup.persist()
    facts_l = [tuple(r) for r in kg_l.triples.collect()]
    facts_r = [tuple(r) for r in kg_r.triples.collect()]
    func_l = {r["pred_id"]: r["functionality"] for r in kg_l.functionality.collect()}
    func_r = {r["pred_id"]: r["functionality"] for r in kg_r.functionality.collect()}
    return {
        "kg_l": kg_l, "kg_r": kg_r, "sub": sub, "sup": sup,
        "facts_l": facts_l, "facts_r": facts_r, "func_l": func_l, "func_r": func_r,
    }


def df_matches_to_dict(df):
    return {r["ent_id"]: (r["counterpart_id"], r["prob"]) for r in df.collect()}


def df_rel_to_dict(df):
    return {
        (r["pred_id"], r["counterpart_pred_id"]): r["prob"] for r in df.collect()
    }


def assert_close_dicts(got, want, tol=1e-9, cp_agreement=1.0):
    """Key sets equal; probs within tol. Counterpart ids must agree on at
    least ``cp_agreement`` of keys — FP product-order noise can flip the
    argmax between two candidates whose scores tie to the last ulp, which
    is not a semantic difference."""
    assert set(got) == set(want), (
        f"key mismatch: extra={set(got)-set(want)} missing={set(want)-set(got)}"
    )
    disagree = 0
    for k, v in want.items():
        g = got[k]
        if isinstance(v, tuple):
            assert abs(g[1] - v[1]) < tol, f"{k}: prob {g[1]} != {v[1]}"
            if g[0] != v[0]:
                disagree += 1
        else:
            assert abs(g - v) < tol, f"{k}: {g} != {v}"
    tuples = sum(1 for v in want.values() if isinstance(v, tuple))
    if tuples:
        assert disagree <= (1.0 - cp_agreement) * tuples, (
            f"counterpart disagreement on {disagree}/{tuples} keys"
        )


def test_first_half_iteration_matches_oracle(spark, setup):
    st = setup
    rel_new, cands = half_iteration(
        st["kg_l"], st["kg_r"], st["sub"],
        spark.createDataFrame([], "pred_id LONG, counterpart_pred_id LONG, prob DOUBLE"),
        spark.createDataFrame([], "pred_id LONG, counterpart_pred_id LONG, prob DOUBLE"),
        CFG, init=True, ent_align=True,
    )
    o_rel, o_best = half_iteration_oracle(
        st["facts_l"], st["facts_r"], st["func_l"], st["func_r"],
        df_matches_to_dict(st["sub"]), {}, {},
        CFG.theta, CFG.epsilon, CFG.delta, CFG.const, init=True,
    )
    assert_close_dicts(df_rel_to_dict(rel_new), o_rel)
    got_best = {
        r["ent_id"]: (r["counterpart_id"], r["prob"]) for r in cands.collect()
    }
    assert_close_dicts(got_best, o_best, cp_agreement=0.97)


def test_full_iteration_matches_oracle(spark, setup):
    st = setup
    state = init_state(spark, st["sub"], st["sup"])
    new_state = run_iteration(st["kg_l"], st["kg_r"], state, CFG)

    # oracle replay of run_iteration
    sub0 = df_matches_to_dict(st["sub"])
    sup0 = df_matches_to_dict(st["sup"])
    o_rel_l, o_best = half_iteration_oracle(
        st["facts_l"], st["facts_r"], st["func_l"], st["func_r"], sub0, {}, {},
        CFG.theta, CFG.epsilon, CFG.delta, CFG.const, init=True,
    )
    merged = max_merge_oracle(sub0, o_best)
    lit_l = set(sub0)  # all seed rows are literals
    lit_r = set(sup0)
    o_sub, o_sup = bipartite_oracle(merged, sup0, lit_l, lit_r)
    o_rel_r, _ = half_iteration_oracle(
        st["facts_r"], st["facts_l"], st["func_r"], st["func_l"], o_sup, {}, {},
        CFG.theta, CFG.epsilon, CFG.delta, CFG.const, init=True, ent_align=False,
    )
    assert_close_dicts(df_rel_to_dict(new_state.rel_align_l), o_rel_l)
    assert_close_dicts(df_rel_to_dict(new_state.rel_align_r), o_rel_r)
    assert_close_dicts(df_matches_to_dict(new_state.matches_sub), o_sub, cp_agreement=0.97)
    assert_close_dicts(df_matches_to_dict(new_state.matches_sup), o_sup, cp_agreement=0.97)


def test_second_iteration_matches_oracle(spark, setup):
    """Non-init path: θ-filter against real rel-align probs."""
    st = setup
    state = init_state(spark, st["sub"], st["sup"])
    s1 = run_iteration(st["kg_l"], st["kg_r"], state, CFG).local_checkpoint()
    # iteration 2 still has init=True in the reference (iter_num <= 1,
    # objects/KGs.py:136); iterate once more to reach the non-init branch.
    s2 = run_iteration(st["kg_l"], st["kg_r"], s1, CFG).local_checkpoint()
    s3_rel, s3_cands = half_iteration(
        st["kg_l"], st["kg_r"], s2.matches_sub, s2.rel_align_l, s2.rel_align_r,
        CFG, init=False, ent_align=True,
    )
    o_rel, o_best = half_iteration_oracle(
        st["facts_l"], st["facts_r"], st["func_l"], st["func_r"],
        df_matches_to_dict(s2.matches_sub),
        df_rel_to_dict(s2.rel_align_l), df_rel_to_dict(s2.rel_align_r),
        CFG.theta, CFG.epsilon, CFG.delta, CFG.const, init=False,
    )
    assert_close_dicts(df_rel_to_dict(s3_rel), o_rel, tol=1e-8)
    got = {r["ent_id"]: (r["counterpart_id"], r["prob"]) for r in s3_cands.collect()}
    assert_close_dicts(got, o_best, tol=1e-8, cp_agreement=0.97)
