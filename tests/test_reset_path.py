"""J7 embedding-argmax reset wired into the PRASE loop."""

import pytest
from pyspark.sql import functions as F

from prase_spark.config import ParisConfig
from prase_spark.embed import resolve_embeddings
from prase_spark.fixtures import two_kg_fixture
from prase_spark.kgbuild import build_kg
from prase_spark.paris import init_state
from prase_spark.pipeline import prase_feedback_align
from prase_spark.seed import literal_seed_matches


def test_reset_from_embeddings(spark):
    fx = two_kg_fixture(spark, n_ent=60, seed=42)
    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    emb_l = resolve_embeddings(
        spark.createDataFrame(fx["emb_l_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_l.nodes,
    )
    emb_r = resolve_embeddings(
        spark.createDataFrame(fx["emb_r_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_r.nodes,
    )
    sub, sup = literal_seed_matches(kg_l, kg_r)
    prior = init_state(spark, sub, sup)
    n_lit = sub.count()
    run = prase_feedback_align(
        spark, kg_l, kg_r, ParisConfig(iterations=0),
        embeddings_l=emb_l, embeddings_r=emb_r,
        prior_state=prior, reset_from_embeddings=True,
    )
    m = run.state.matches_sub
    ents = m.filter("NOT is_lit")
    # every embedded entity got an argmax counterpart at prob 0.2 (J7)
    assert ents.count() == emb_l.count()
    assert ents.filter("prob <> 0.2").count() == 0
    # literal seeds preserved
    assert m.filter("is_lit").count() == n_lit


def test_reset_requires_embeddings(spark):
    fx = two_kg_fixture(spark, n_ent=20, seed=42)
    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    with pytest.raises(ValueError):
        prase_feedback_align(
            spark, kg_l, kg_r, ParisConfig(iterations=0),
            prior_state=init_state(spark, *literal_seed_matches(kg_l, kg_r)),
            reset_from_embeddings=True,
        )


def test_reset_lsh_path_no_cartesian(spark):
    """Forcing the LSH reset (the 10^12-row strategy) must produce a
    cartesian-free plan with the same (prob, literal-preserving) semantics
    as the exact path."""
    fx = two_kg_fixture(spark, n_ent=60, seed=42)
    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    emb_l = resolve_embeddings(
        spark.createDataFrame(fx["emb_l_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_l.nodes,
    )
    emb_r = resolve_embeddings(
        spark.createDataFrame(fx["emb_r_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_r.nodes,
    )
    sub, sup = literal_seed_matches(kg_l, kg_r)
    prior = init_state(spark, sub, sup)
    n_lit = sub.count()
    run = prase_feedback_align(
        spark, kg_l, kg_r, ParisConfig(iterations=0),
        embeddings_l=emb_l, embeddings_r=emb_r,
        prior_state=prior, reset_from_embeddings=True, reset_use_lsh=True,
    )
    m = run.state.matches_sub
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    ents = m.filter("NOT is_lit")
    # LSH blocks candidates; nearly every entity finds >=1 band collision
    assert ents.count() >= int(0.9 * emb_l.count())
    assert ents.filter("prob <> 0.2").count() == 0
    assert m.filter("is_lit").count() == n_lit


def test_reset_dispatcher_size_gate(spark):
    """embedding_reset_matches: brute force under the pair budget, LSH above."""
    from prase_spark.embed import embedding_reset_matches

    fx = two_kg_fixture(spark, n_ent=40, seed=42)
    kg_l, kg_r = build_kg(fx["raw_l"]), build_kg(fx["raw_r"])
    emb_l = resolve_embeddings(
        spark.createDataFrame(fx["emb_l_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_l.nodes,
    )
    emb_r = resolve_embeddings(
        spark.createDataFrame(fx["emb_r_names"], "name STRING, embedding ARRAY<FLOAT>"),
        kg_r.nodes,
    )
    sub_small, _ = embedding_reset_matches(emb_l, emb_r)  # 40x40 -> brute
    assert "CartesianProduct" in sub_small._jdf.queryExecution().executedPlan().toString()
    sub_big, sup_big = embedding_reset_matches(emb_l, emb_r, pair_budget=100)
    assert "CartesianProduct" not in sub_big._jdf.queryExecution().executedPlan().toString()
    # LSH recall vs brute-force argmax on the same inputs
    exact = {r["ent_id"]: r["counterpart_id"] for r in sub_small.collect()}
    approx = {r["ent_id"]: r["counterpart_id"] for r in sub_big.collect()}
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits >= int(0.9 * len(exact))
