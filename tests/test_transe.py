"""Distributed TransE training (prase_spark.transe): deterministic
hash init, ranking improvement on a structured KG, negative-corruption
coverage, and integration with the existing embedding machinery."""

import pytest
from pyspark.sql import functions as F

from prase_spark.transe import (
    TransEModel,
    init_entity_embeddings,
    train_transe,
    transe_scores,
)

N = 30
DIM = 16


def _ring_triples(spark):
    """A 30-entity ring under relation 0 plus a 'sibling' relation 1
    linking i -> i+2: enough structure for TransE to separate true from
    corrupted triples quickly."""
    ring = spark.range(N).selectExpr("id AS subj", "CAST(0 AS LONG) AS pred", f"(id + 1) % {N} AS obj")
    sib = spark.range(N).selectExpr("id AS subj", "CAST(1 AS LONG) AS pred", f"(id + 2) % {N} AS obj")
    return ring.unionByName(sib)


def test_init_deterministic_unit_norm(spark):
    ents = spark.range(N).selectExpr("id AS ent_id")
    a = {r["id"]: r["embedding"] for r in init_entity_embeddings(ents, DIM, seed=7).collect()}
    b = {r["id"]: r["embedding"] for r in init_entity_embeddings(ents.repartition(5), DIM, seed=7).collect()}
    assert a == b  # hash init: identical at any partitioning
    for v in a.values():
        assert len(v) == DIM
        assert sum(x * x for x in v) == pytest.approx(1.0, rel=1e-9)
    c = {r["id"]: r["embedding"] for r in init_entity_embeddings(ents, DIM, seed=8).collect()}
    assert a[0] != c[0]  # seed actually varies the draw


def _mean_scores(spark, model, triples):
    pos = transe_scores(triples, model).agg(F.avg("score")).collect()[0][0]
    corrupted = triples.withColumn(
        "obj", F.pmod(F.col("obj") + 7, F.lit(N))
    )
    neg = transe_scores(corrupted, model).agg(F.avg("score")).collect()[0][0]
    return pos, neg


def test_training_improves_ranking(spark):
    trip = _ring_triples(spark)
    model = train_transe(trip, n_entities=N, dim=DIM, epochs=8, lr=0.08, seed=3)
    ents = model.entities.collect()
    assert len(ents) == N
    for r in ents:  # unit-sphere projection held through training
        assert sum(x * x for x in r["embedding"]) == pytest.approx(1.0, rel=1e-6)
    init = TransEModel(
        entities=init_entity_embeddings(
            spark.range(N).selectExpr("id AS ent_id"), DIM, seed=3
        ),
        relations=model.relations,  # scores only need SOME relation table
        dim=DIM,
    )
    pos0, neg0 = _mean_scores(spark, init, trip)
    pos1, neg1 = _mean_scores(spark, model, trip)
    # at hash init, true and corrupted triples are indistinguishable;
    # after training the margin must open decisively
    assert abs(neg0 - pos0) < 0.5
    assert neg1 - pos1 > 0.5
    assert pos1 < pos0  # true triples actually got cheaper


def test_trained_vectors_feed_existing_ann_stack(spark):
    """The trained table is drop-in for the repo's embedding machinery
    (schema contract: dense id + array<double>)."""
    from prase_spark.datapipe.simsearch import cosine_topk

    model = train_transe(_ring_triples(spark), n_entities=N, dim=DIM, epochs=2, lr=0.05)
    emb = model.entities.selectExpr("id AS vec_id", "embedding")
    queries = emb.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    top = cosine_topk(emb, queries, k=3)
    assert top.count() == 3  # self + 2 nearest, no schema friction


def test_input_validation(spark):
    trip = _ring_triples(spark)
    with pytest.raises(ValueError, match="epochs"):
        train_transe(trip, n_entities=N, epochs=0)
    with pytest.raises(ValueError, match="n_entities"):
        train_transe(trip, n_entities=1)
    with pytest.raises(ValueError, match="dim"):
        init_entity_embeddings(spark.range(2).selectExpr("id AS ent_id"), dim=0)


def test_e2e_prase_with_self_trained_embeddings(spark):
    """The full PRASE loop with NO external vectors: train TransE on each
    KG's own relation facts, feed the trained tables to align()'s
    fusion-active iterations, and hold alignment quality on the fixture
    gold. Closes the north-star loop — probabilistic reasoning +
    semantic embedding module, both in-Spark."""
    from pyspark.sql import functions as F

    from prase_spark.config import ParisConfig
    from prase_spark.evaluate import evaluate_alignment
    from prase_spark.fixtures import two_kg_fixture
    from prase_spark.kgbuild import build_kg
    from prase_spark.pipeline import align

    f = two_kg_fixture(spark, n_ent=60, seed=11)
    kg_l, kg_r = build_kg(f["raw_l"]), build_kg(f["raw_r"])

    def trained(kg):
        n = kg.nodes.agg(F.max("ent_id")).collect()[0][0] + 1
        rel = kg.triples.filter(~F.col("obj_is_lit"))
        m = train_transe(rel, n_entities=int(n), dim=8, epochs=3, lr=0.08)
        return m.entities.selectExpr("id AS ent_id", "embedding")

    emb_l, emb_r = trained(kg_l), trained(kg_r)
    run = align(
        spark, kg_l, kg_r, ParisConfig(iterations=2),
        embeddings_l=emb_l, embeddings_r=emb_r, checkpoint=False,
    )
    l_ids = {r["name"]: r["ent_id"] for r in kg_l.nodes.filter("NOT is_literal").collect()}
    r_ids = {r["name"]: r["ent_id"] for r in kg_r.nodes.filter("NOT is_literal").collect()}
    gold = spark.createDataFrame(
        [(l_ids[a], r_ids[b]) for a, b in f["gold_names"] if a in l_ids and b in r_ids],
        "ent_l LONG, ent_r LONG",
    )
    ev = evaluate_alignment(run.state.matches_sub, gold, thresholds=[0.5])[0]
    # the fixture aligns near-perfectly under plain PARIS; fused scores
    # from self-trained vectors must not wreck it
    assert ev["precision"] >= 0.9 and ev["recall"] >= 0.8, ev


def test_gcn_propagate_smooths_neighbors(spark):
    from prase_spark.transe import gcn_propagate

    ents = spark.range(N).selectExpr("id AS ent_id")
    emb = init_entity_embeddings(ents, DIM, seed=5)  # (id, embedding)
    edges = _ring_triples(spark).filter("pred = 0")

    def mean_neighbor_cos(e):
        rows = {r["id"]: r["embedding"] for r in e.collect()}
        tot = 0.0
        for i in range(N):
            a, b = rows[i], rows[(i + 1) % N]
            tot += sum(x * y for x, y in zip(a, b))
        return tot / N

    before = mean_neighbor_cos(emb)
    after1 = mean_neighbor_cos(gcn_propagate(emb, edges, hops=1))
    after3 = mean_neighbor_cos(gcn_propagate(emb, edges, hops=3))
    # smoothing monotonically pulls ring neighbors together
    assert after1 > before + 0.05
    assert after3 > after1
    # isolated entity keeps its exact vector
    iso = spark.createDataFrame([(99, [1.0] + [0.0] * (DIM - 1))], "id LONG, embedding ARRAY<DOUBLE>")
    out = gcn_propagate(emb.unionByName(iso), edges, hops=1)
    v = out.filter("id = 99").collect()[0]["embedding"]
    assert v[0] == pytest.approx(1.0) and sum(v[1:]) == pytest.approx(0.0)


def test_deterministic_mode_bit_identical_any_partitioning(spark):
    """deterministic=True: sorted-fold gradient reduce -> the trained
    vectors AND the per-epoch margin-violation counts are bit-identical
    at any input partitioning (the transe_margin_counts gate contract)."""
    trip = _ring_triples(spark)
    sa, sb = {}, {}
    ma = train_transe(trip, n_entities=N, dim=DIM, epochs=4, lr=0.08,
                      seed=3, deterministic=True, stats_out=sa)
    mb = train_transe(trip.repartition(7), n_entities=N, dim=DIM, epochs=4,
                      lr=0.08, seed=3, deterministic=True, stats_out=sb)
    assert sa["violations"] == sb["violations"]
    assert len(sa["violations"]) == 4
    va = {r["id"]: r["embedding"] for r in ma.entities.collect()}
    vb = {r["id"]: r["embedding"] for r in mb.entities.collect()}
    assert va == vb  # bit-identical, not approx
    # the integer surface is meaningful: training reduces violations
    assert sa["violations"][-1] < sa["violations"][0]
    assert all(v >= 0 for v in sa["violations"])


def test_stats_out_fast_path_epoch0_exact(spark):
    """stats_out works on the default (posexplode/groupBy-sum) path too;
    epoch 0's count is computed from the pure-hash init, so it must equal
    the deterministic path's epoch-0 count exactly."""
    trip = _ring_triples(spark)
    s_fast, s_det = {}, {}
    train_transe(trip, n_entities=N, dim=DIM, epochs=1, lr=0.08, seed=3,
                 stats_out=s_fast)
    train_transe(trip, n_entities=N, dim=DIM, epochs=1, lr=0.08, seed=3,
                 deterministic=True, stats_out=s_det)
    assert s_fast["violations"] == s_det["violations"]
