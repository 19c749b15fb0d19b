"""Distributed skip-gram-with-negative-sampling training (SGNS /
word2vec, Mikolov et al. 2013) over a walk corpus — the trainer that
turns walks.random_walks / node2vec_walks output into node embeddings,
closing the third in-engine embedding loop next to TransE (facts) and
GCN (propagation).

Formulation (the standard SGNS objective): for a (center, context)
pair with label y in {1, 0},

    s = W[center] . C[context],   g = (sigmoid(s) - y) * weight
    grad_W[center] += g * C[context],  grad_C[context] += g * W[center]

Positives come from the co-occurrence table weighted by their count
(clipped at ``cnt_cap`` so a tight clique cannot dominate the epoch);
each positive draws ``negatives`` corrupted contexts.

Determinism without RNG state (transe.py doctrine, identical on any
executor layout):
- dense vocab ids via ids.assign_dense_ids over the sorted node set;
- init from xxhash64(id, dim, seed) grids (transe._hash_unit_vectors);
- negative j for (c, x) in epoch e = pmod(xxhash64(c, x, j, e, seed),
  n_nodes) — reproducible pseudo-draws, fresh per epoch.

Scale shape: per epoch, two hash joins of the (positive + negative)
pair stream against the two embedding tables (dense-id keys), dot +
sigmoid + gradient scale inside codegen, the gradient stream reduced
per id with posexplode -> groupBy(id, dim) native sum (map-side
combine; transe._sum_vectors), one update join per table, and a
localCheckpoint to truncate lineage. Nothing collects to the driver.
Float sums reduce in shuffle order, so training is deterministic up to
float-add commutativity — pytest asserts RANKING properties (intra- vs
inter-cluster similarity), the repo's transcendental discipline; no SQL
gate (sigmoid/exp cannot cross-engine hash).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.ids import assign_dense_ids
from prase_spark.transe import _hash_unit_vectors, _sum_vectors

__all__ = ["SGNSModel", "train_sgns", "sgns_similarity"]


class SGNSModel(NamedTuple):
    """(node, id, embedding array<double>) input-vector table (the W
    matrix — what consumers use), plus the context table and dim."""

    vectors: DataFrame
    context: DataFrame
    dim: int


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_sgns(
    pairs: DataFrame,
    dim: int = 32,
    epochs: int = 3,
    lr: float = 0.05,
    negatives: int = 2,
    cnt_cap: int = 10,
    seed: int = 0,
) -> SGNSModel:
    """Train on a (center, context, cnt) co-occurrence table
    (walks.skipgram_pairs output). Returns unit-normalized center
    vectors keyed by BOTH the original node value and its dense id."""
    if dim < 1 or epochs < 0 or negatives < 0:
        raise ValueError(
            f"bad hyperparams: dim={dim}, epochs={epochs}, negatives={negatives}"
        )
    p = pairs.select(
        F.col("center"), F.col("context"),
        F.least(F.col("cnt").cast("double"), F.lit(float(cnt_cap))).alias("w"),
    )
    nodes = (
        p.select(F.col("center").alias("node"))
        .union(p.select("context"))
        .distinct()
    )
    vocab = assign_dense_ids(nodes, ["node"], id_col="nid").persist()
    n_nodes = vocab.count()

    enc = (
        p.join(vocab.selectExpr("node AS center", "nid AS cid"), "center")
        .join(vocab.selectExpr("node AS context", "nid AS xid"), "context")
        .select("cid", "xid", "w")
        .localCheckpoint()
    )
    W = _hash_unit_vectors(vocab.select("nid"), "nid", dim, seed, "sgns_w")
    C = _hash_unit_vectors(vocab.select("nid"), "nid", dim, seed, "sgns_c")

    for epoch in range(epochs):
        pos = enc.select("cid", "xid", "w", F.lit(1.0).alias("y"))
        stream = pos
        for j in range(negatives):
            neg = enc.select(
                "cid",
                F.pmod(
                    F.xxhash64(
                        "cid", "xid", F.lit(j), F.lit(epoch), F.lit(int(seed))
                    ),
                    F.lit(int(n_nodes)),
                ).alias("xid"),
                "w",
                F.lit(0.0).alias("y"),
            )
            stream = stream.unionByName(neg)
        scored = (
            stream.join(W.selectExpr("id AS cid", "embedding AS wv"), "cid")
            .join(C.selectExpr("id AS xid", "embedding AS cv"), "xid")
            .withColumn("s", _dot("wv", "cv"))
            .withColumn("g", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y")) * F.col("w"))
        )
        grad_w = scored.select(
            F.col("cid").alias("id"),
            F.transform("cv", lambda x: x * F.col("g")).alias("g"),
        )
        grad_c = scored.select(
            F.col("xid").alias("id"),
            F.transform("wv", lambda x: x * F.col("g")).alias("g"),
        )
        gw = _sum_vectors(grad_w)
        gc = _sum_vectors(grad_c)
        W = (
            W.join(gw, W["id"] == gw["id"], "left")
            .select(
                W["id"],
                F.when(
                    gw["g"].isNull(), W["embedding"]
                ).otherwise(
                    F.zip_with(
                        W["embedding"], gw["g"], lambda e, g: e - F.lit(lr) * g
                    )
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        C = (
            C.join(gc, C["id"] == gc["id"], "left")
            .select(
                C["id"],
                F.when(
                    gc["g"].isNull(), C["embedding"]
                ).otherwise(
                    F.zip_with(
                        C["embedding"], gc["g"], lambda e, g: e - F.lit(lr) * g
                    )
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    unit = W.select(
        "id", F.col("embedding").alias("__e"), norm.alias("__n")
    ).select(
        "id",
        F.transform(
            "__e", lambda x: x / F.greatest(F.col("__n"), F.lit(1e-12))
        ).alias("embedding"),
    )
    # materialize the deliverable, then release the vocab pin (the r4
    # IVF-unpersist advisory class: trainers must not leak cached RDDs
    # into a long-lived session)
    vectors = vocab.join(unit, vocab["nid"] == unit["id"]).select(
        "node", "nid", "embedding"
    ).localCheckpoint()
    vocab.unpersist()
    return SGNSModel(vectors=vectors, context=C, dim=dim)


def sgns_similarity(model: SGNSModel, a: str, b: str) -> float:
    """Driver-side cosine between two nodes' trained vectors (unit
    vectors, so a plain dot) — a test/debug convenience, not a scan
    path; use embed.cosine_expr for table-scale scoring."""
    rows = {
        r["node"]: r["embedding"]
        for r in model.vectors.filter(F.col("node").isin([a, b])).collect()
    }
    va, vb = rows[a], rows[b]
    return float(sum(x * y for x, y in zip(va, vb)))
