"""Seed alignments.

- Literal-value seed join (objects/KGs.py:53-58): literals of KG_l equi-join
  literals of KG_r on normalized value, prob=1.0 both directions.
- External seed-link load (objects/KGs.py:481-512): name-resolved pairs with
  optional prob rescale/range-filter, max-merged into the match state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.kgbuild import KGFrames


def literal_seed_matches(kg_l: KGFrames, kg_r: KGFrames) -> tuple[DataFrame, DataFrame]:
    """Initial (sub, sup) match state from shared literal values.

    The reference's ``literal_dict_by_value`` keeps one literal per value
    (last insert wins, objects/KG.py:140); we pick min ent_id per value for
    determinism. Returns (matches_sub, matches_sup) with columns
    (ent_id, counterpart_id, prob, is_lit).

    Scale note: this is a plain equi-join on the value column; hub literal
    values (years, country names) are exactly the AQE-skew-join case — the
    per-value dedup below also caps the blowup at 1 row per value per side.
    """
    lit_l = (
        kg_l.literals()
        .groupBy("value")
        .agg(F.min("ent_id").alias("l_id"))
    )
    lit_r = (
        kg_r.literals()
        .groupBy("value")
        .agg(F.min("ent_id").alias("r_id"))
    )
    # All left literals sharing the value map to the canonical right literal
    # (reference maps *every* left literal via the value dict).
    all_lit_l = kg_l.literals().select("value", F.col("ent_id").alias("l_id"))
    sub = (
        all_lit_l.join(lit_r, "value")
        .select(
            F.col("l_id").alias("ent_id"),
            F.col("r_id").alias("counterpart_id"),
            F.lit(1.0).alias("prob"),
            F.lit(True).alias("is_lit"),
        )
    )
    all_lit_r = kg_r.literals().select("value", F.col("ent_id").alias("r_id"))
    sup = (
        all_lit_r.join(lit_l, "value")
        .select(
            F.col("r_id").alias("ent_id"),
            F.col("l_id").alias("counterpart_id"),
            F.lit(1.0).alias("prob"),
            F.lit(True).alias("is_lit"),
        )
    )
    return sub, sup


def max_merge(prev: DataFrame, update: DataFrame) -> DataFrame:
    """Keep per ent_id the (counterpart, prob) with the larger prob; the new
    value wins ties — mirrors ``set_counterpart_id_and_prob``'s
    ``prob < curr -> keep curr`` (model/PARIS.py:9-13, objects/KGs.py:70-80,
    243-249)."""
    p = prev.select(
        "ent_id",
        F.col("counterpart_id").alias("p_cp"),
        F.col("prob").alias("p_prob"),
        F.col("is_lit").alias("p_lit"),
    )
    u = update.select(
        "ent_id",
        F.col("counterpart_id").alias("u_cp"),
        F.col("prob").alias("u_prob"),
        F.col("is_lit").alias("u_lit"),
    )
    take_new = F.col("p_prob").isNull() | (F.col("u_prob") >= F.col("p_prob"))
    return (
        p.join(u, "ent_id", "full_outer")
        .select(
            "ent_id",
            F.when(F.col("u_prob").isNotNull() & take_new, F.col("u_cp"))
            .otherwise(F.col("p_cp"))
            .alias("counterpart_id"),
            F.when(F.col("u_prob").isNotNull() & take_new, F.col("u_prob"))
            .otherwise(F.col("p_prob"))
            .alias("prob"),
            F.coalesce("p_lit", "u_lit").alias("is_lit"),
        )
    )


def load_seed_links(
    links: DataFrame,
    kg_l: KGFrames,
    kg_r: KGFrames,
    prob_scale: float = 1.0,
    init_value: float | None = None,
    threshold_min: float = 0.0,
    threshold_max: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Resolve name-level seed links to id-level match updates (S5,
    objects/KGs.py:481-512). ``links``: (name_l, name_r[, prob]).

    Returns (sub_update, sup_update) ready for :func:`max_merge` (or a
    forced overwrite when the caller passes force=True semantics by merging
    with ``force_merge``)."""
    cols = links.columns
    prob_col = F.col("prob").cast("double") if "prob" in cols else F.lit(1.0)
    if init_value is not None:
        prob_col = F.lit(float(init_value))
    resolved = (
        links.withColumn("prob", prob_col)
        .filter(F.col("prob").between(threshold_min, threshold_max))
        .withColumn("prob", F.col("prob") * F.lit(float(prob_scale)))
        .join(
            kg_l.nodes.select(F.col("name").alias("name_l"), F.col("ent_id").alias("l_id"),
                              F.col("is_literal").alias("l_lit")),
            "name_l",
        )
        .join(
            kg_r.nodes.select(F.col("name").alias("name_r"), F.col("ent_id").alias("r_id"),
                              F.col("is_literal").alias("r_lit")),
            "name_r",
        )
    )
    sub = resolved.select(
        F.col("l_id").alias("ent_id"),
        F.col("r_id").alias("counterpart_id"),
        "prob",
        F.col("l_lit").alias("is_lit"),
    )
    sup = resolved.select(
        F.col("r_id").alias("ent_id"),
        F.col("l_id").alias("counterpart_id"),
        "prob",
        F.col("r_lit").alias("is_lit"),
    )
    return sub, sup


def rescale_probs(matches: DataFrame, weight: float) -> DataFrame:
    """P11 ``reset_ent_align_prob(lambda x: w*x)`` (objects/KGs.py:514-520):
    rescale entity-match probs; literal seed rows keep prob (the reference
    iterates entity_set only)."""
    return matches.withColumn(
        "prob",
        F.when(F.col("is_lit"), F.col("prob")).otherwise(
            F.col("prob") * F.lit(float(weight))
        ),
    )


def force_merge(prev: DataFrame, update: DataFrame) -> DataFrame:
    """Overwrite semantics of ``load_ent_links(force=True)``
    (objects/KGs.py:70-80 with force): update rows replace prev rows."""
    upd = update.groupBy("ent_id").agg(
        F.max_by(F.struct("counterpart_id", "prob", "is_lit"), F.struct("prob", "counterpart_id")).alias("s")
    ).select("ent_id", "s.counterpart_id", "s.prob", "s.is_lit")
    return prev.join(upd.select("ent_id"), "ent_id", "left_anti").unionByName(upd)


def name_seed_matches(
    kg_l: KGFrames,
    kg_r: KGFrames,
    threshold: float = 0.5,
    prob_scale: float = 1.0,
    name_norm=None,
    **block_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Entity-NAME blocking seed (beyond-reference): when the two KGs share
    no literal values (literal_seed_matches comes up empty — common across
    vocabularies), bootstrap the match state from near-duplicate entity
    surface forms instead: nameblock.name_candidates over the NORMALIZED
    local names (char-n-gram minhash LSH between the KGs, exact jaccard
    verify — never an all-pairs name comparison).

    Output shape mirrors literal_seed_matches — (sub, sup) with columns
    (ent_id, counterpart_id, prob, is_lit) — but is_lit=False (these are
    entity hypotheses, not literal anchors) and prob = jaccard *
    prob_scale, max-merged per entity (best counterpart; ties -> min id).
    The counterpart side resolves to the MIN ent_id per normalized name
    (same canonical-representative rule as the literal seed). Feed the
    result to init_state / prase_feedback_align exactly like seed links.
    """
    from prase_spark.nameblock import name_candidates
    from prase_spark.normalize import normalize_uri

    norm = name_norm or normalize_uri
    ents_l = kg_l.nodes.filter(~F.col("is_literal")).select(
        "ent_id", norm(F.col("name")).alias("name")
    )
    ents_r = kg_r.nodes.filter(~F.col("is_literal")).select(
        "ent_id", norm(F.col("name")).alias("name")
    )
    pairs = name_candidates(
        ents_l, ents_r, threshold=threshold, **block_kwargs
    ).localCheckpoint()  # read by both directions below
    min_l = ents_l.groupBy("name").agg(F.min("ent_id").alias("cp_id"))
    min_r = ents_r.groupBy("name").agg(F.min("ent_id").alias("cp_id"))

    def one_side(ents, own_col, cp_col, cp_min):
        joined = (
            ents.join(pairs, ents["name"] == pairs[own_col])
            .join(cp_min, pairs[cp_col] == cp_min["name"])
            .select(
                ents["ent_id"].alias("ent_id"),
                cp_min["cp_id"].alias("counterpart_id"),
                (F.col("jaccard") * F.lit(prob_scale)).alias("prob"),
            )
        )
        best = joined.groupBy("ent_id").agg(
            F.max_by(
                F.struct("counterpart_id", "prob"),
                F.struct("prob", (-F.col("counterpart_id")).alias("nc")),
            ).alias("b")
        )
        return best.select(
            "ent_id",
            F.col("b.counterpart_id").alias("counterpart_id"),
            F.col("b.prob").alias("prob"),
            F.lit(False).alias("is_lit"),
        )

    sub = one_side(ents_l, "name_l", "name_r", min_r)
    sup = one_side(ents_r, "name_r", "name_l", min_l)
    return sub, sup


def seed_from_page_clusters(
    clusters: DataFrame,
    page_entities: DataFrame,
    url_col: str = "url",
    cluster_col: str = "cluster",
    ent_col: str = "ent",
    kg_col: str = "kg",
) -> DataFrame:
    """(ent1, ent2, prob=1.0) — cross-KG seed alignment mined from
    same-document page clusters: if a KG-1 entity's page and a KG-2
    entity's page sit in one cluster (hreflang language variants via
    :func:`prase_spark.linkgraph.hreflang_clusters`, or page-identity
    groups via :func:`prase_spark.datapipe.urlnorm.page_identity`), the
    entities are declared equivalent by the publisher — exactly the
    trust level of the reference's external seed file
    (objects/KGs.py:481-512), so the pairs feed
    :func:`load_seed_alignment`'s max-merge unchanged.

    ``page_entities``: (url, ent, kg∈{1,2}) — which entity each crawled
    page describes (from extraction subjects or mention linking).
    Scale shape: two broadcast-sized projections joined on cluster id;
    a legitimate cluster is a handful of language variants, so the
    within-cluster pairing never blows up — cap cluster size upstream
    (the hreflang/page-identity DEPLOY guard) before trusting a
    template-bug mega-cluster as seed evidence."""
    m = clusters.join(page_entities, url_col)
    left = m.where(F.col(kg_col) == 1).select(
        F.col(cluster_col).alias("__c"), F.col(ent_col).alias("ent1")
    )
    right = m.where(F.col(kg_col) == 2).select(
        F.col(cluster_col).alias("__c"), F.col(ent_col).alias("ent2")
    )
    return (
        left.join(right, "__c")
        .select("ent1", "ent2")
        .distinct()
        .withColumn("prob", F.lit(1.0))
    )
