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
