"""Survivorship: merge a canonical entity's conflicting attribute
claims into one golden record (the MDM "golden record" step; rule
taxonomy per Bleiholder & Naumann, "Data Fusion", CSUR 2009).

Where this sits: alignment + connected components collapse mentions
into canonical entity ids (matching.canonical_entity_ids); the triples
those mentions carried now DISAGREE — three crawls say a company's HQ
is in three cities. Materializing a clean KG needs one decision per
(entity, predicate): that decision is survivorship. truth.py's
truth_discovery estimates per-SOURCE trust; this module CONSUMES such
weights (or plain vote counts) to pick per-attribute winners.

Semantics (deterministic, exact integers):
- every claim row votes with weight 1, or with its source's integer
  trust (``trust_e12`` from truth_discovery) when ``trust`` is given;
- per (subj, pred): the golden object is the max by
  (total weight desc, obj asc) — a total order, so the winner is a
  pure function of the claim multiset (value-hashable, partition- and
  engine-independent);
- ``mode="majority"`` keeps only the winner; ``mode="all"`` keeps every
  distinct object with its weight (multi-valued predicates — set-typed
  attributes shouldn't vote each other out).

Scale shape: one canon-map join (canonical ids are the alignment
output, broadcastable for bounded merges, hash-joined otherwise), one
weight aggregation per (subj, pred, obj) — map-side combinable — and a
max_by per (subj, pred): hash aggregates end to end, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_record(
    triples: DataFrame,
    canon: DataFrame | None = None,
    trust: DataFrame | None = None,
    mode: str = "majority",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(subj, pred, obj, weight): the fused KG. ``canon`` (node, canon)
    rewrites subjects onto canonical ids first (subjects without an
    entry keep their own id — singleton entities are their own
    canonical). ``trust`` (source, trust_e12) switches votes from
    counts to integer trust mass; claims then need a ``source``
    column."""
    if mode not in ("majority", "all"):
        raise ValueError(f"mode must be 'majority' or 'all', got {mode}")
    t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"), F.col(obj).alias("obj"),
        *([F.col("source")] if trust is not None else []),
    )
    if canon is not None:
        c = canon.select(F.col("node").alias("subj"), F.col("canon"))
        t = (
            t.join(c, "subj", "left")
            .withColumn("subj", F.coalesce(F.col("canon"), F.col("subj")))
            .drop("canon")
        )
    if trust is not None:
        t = t.join(
            F.broadcast(trust.select("source", "trust_e12")), "source"
        ).withColumn("__w", F.col("trust_e12"))
    else:
        t = t.withColumn("__w", F.lit(1).cast("long"))
    votes = t.groupBy("subj", "pred", "obj").agg(F.sum("__w").alias("weight"))
    if mode == "all":
        return votes
    # winner = (weight DESC, obj ASC): min_by on (-weight, obj) — weight
    # is a non-negative long, so negation is exact and the struct order
    # is the documented total order
    return votes.groupBy("subj", "pred").agg(
        F.expr("min_by(obj, struct(-weight, obj))").alias("obj"),
        F.max("weight").alias("weight"),
    )
