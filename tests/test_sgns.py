"""SGNS trainer: ranking-property verification (the transcendental
discipline — sigmoid training cannot cross-engine hash, so pytest pins
what matters: learned similarity structure, loss direction, and the
end-to-end walks -> skipgram -> SGNS chain on a clustered graph)."""

from __future__ import annotations

import pytest

from prase_spark.sgns import sgns_similarity, train_sgns
from prase_spark.walks import random_walks, skipgram_pairs


def _two_clique_edges():
    # two 5-cliques bridged by one weak edge
    left = [f"a{i}" for i in range(5)]
    right = [f"b{i}" for i in range(5)]
    edges = []
    for grp in (left, right):
        for i, u in enumerate(grp):
            for v in grp[i + 1 :]:
                edges += [(u, v), (v, u)]
    edges += [("a0", "b0"), ("b0", "a0")]
    return edges


def test_sgns_separates_two_cliques(spark):
    edges = spark.createDataFrame(_two_clique_edges(), "src STRING, dst STRING")
    walks = random_walks(edges, walk_length=6, walks_per_node=4)
    pairs = skipgram_pairs(walks, window=2)
    model = train_sgns(
        pairs, dim=16, epochs=12, lr=0.02, negatives=2, cnt_cap=5, seed=1
    )
    # average several pairs: single init cosines scatter ~1/sqrt(dim),
    # so the learned structure is asserted on the mean
    intra = sum(
        sgns_similarity(model, a, b)
        for a, b in [("a1", "a2"), ("a3", "a4"), ("b1", "b3")]
    ) / 3
    inter = sum(
        sgns_similarity(model, a, b)
        for a, b in [("a1", "b2"), ("a3", "b4"), ("a2", "b3")]
    ) / 3
    assert intra > inter
    # and the vectors are unit-normalized
    row = model.vectors.filter("node = 'a1'").collect()[0]
    assert abs(sum(x * x for x in row["embedding"]) - 1.0) < 1e-9


def test_sgns_training_moves_positives_together(spark):
    # a tiny corpus where x always co-occurs with y and never with z:
    # training must raise sim(x, y) above sim(x, z)
    pairs = spark.createDataFrame(
        [("x", "y", 8), ("y", "x", 8), ("z", "q", 8), ("q", "z", 8)],
        "center STRING, context STRING, cnt LONG",
    )
    model = train_sgns(pairs, dim=8, epochs=6, lr=0.2, negatives=2, seed=3)
    assert sgns_similarity(model, "x", "y") > sgns_similarity(model, "x", "z")


def test_sgns_zero_epochs_is_init_and_validation(spark):
    pairs = spark.createDataFrame(
        [("x", "y", 1)], "center STRING, context STRING, cnt LONG"
    )
    model = train_sgns(pairs, dim=8, epochs=0, seed=7)
    assert model.vectors.count() == 2
    with pytest.raises(ValueError):
        train_sgns(pairs, dim=0)
    with pytest.raises(ValueError):
        train_sgns(pairs, epochs=-1)
