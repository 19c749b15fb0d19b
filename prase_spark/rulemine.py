"""AMIE-style horn-rule mining over KG relation triples.

A constructed KG is validated and densified by the logical rules it
satisfies: `placedBy(x,z) ∧ inNation(z,y) ⇒ shipNation(x,y)` found with
90% confidence both audits the extraction (the 10% counterexamples are
review candidates) and predicts missing facts. The reference builds and
aligns KGs (objects/KGs.py) but never mines their regularities; this is
the AMIE operator family (Galárraga et al., WWW 2013) re-expressed as
Spark joins + hash aggregations.

Rule language (bounded, closed, connected — the AMIE core):

- **equiv**:   ``p(x, y) ⇒ q(x, y)``         (subsumption / synonymy)
- **inverse**: ``p(y, x) ⇒ q(x, y)``         (inverse predicates)
- **chain**:   ``p(x, z) ∧ q(z, y) ⇒ r(x, y)`` (composition, incl.
  transitivity when ``p = q = r``)

Measures (all AMIE-standard, all exact integers here):

- ``support``  = #distinct (x, y) with body(x, y) ∧ head(x, y);
- ``hc_e6``    = head coverage: support / head_size(q), scaled 10^6;
- ``conf_e6``  = PCA confidence: support / #distinct (x, y) with
  body(x, y) ∧ ∃y′ head(x, y′), scaled 10^6 — the partial-
  completeness-assumption denominator that made AMIE practical on
  open-world KGs (a missing head fact only counts against the rule
  when the subject is known to have SOME head edge).

Scale shape (the 100-TB read):

- every candidate family is computed with ONE equi-join + ONE hash
  aggregation over distinct triples — no rule-space enumeration, no
  driver-side search: candidates ARE the join results, so only rules
  with nonzero support ever materialize;
- the chain body join on the shared variable z is the one quadratic
  hazard (a hub entity contributes in_deg × out_deg body pairs); it is
  degree-capped with dropped-node telemetry (``stats_out``), the
  ``cap_band_buckets`` doctrine — recall on hub-adjacent rules is
  traded for a bounded join, exactly like every banded self-join in
  ``datapipe/``;
- PCA denominators are computed only for rules that already pass
  ``min_support``: the surviving (body, head) predicate pairs are a
  small broadcast table, so the second pass over body pairs is one
  broadcast join + one aggregation;
- shuffles carry (pred, entity) keys only — never literals, never
  page text; scaled divisions are BIGINT-exact (keep support below
  ~9.2e12 so ``support * 10^6`` fits in int64 — at that support the
  rule is long since proven).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("prase_spark")

#: confidence / head-coverage fixed-point scale: 1.0 == 10^6.
CONF_SCALE = 10**6

#: backstop on the chain join's shared variable: a node with more than
#: this many in- OR out-edges is excluded from chain bodies (telemetry
#: via stats_out). 10^4 bounds any node's body contribution at 10^8.
DEFAULT_MAX_NODE_DEGREE = 10_000


def _pair_counts(body: DataFrame, heads: DataFrame, body_keys: list[str]):
    """support per (body preds, head pred): body pairs ⋈ head pairs on
    (x, y). Both inputs are distinct, so count(*) == countDistinct."""
    return (
        body.join(heads, ["x", "y"])
        .groupBy(*body_keys, "hpred")
        .agg(F.count("*").alias("support"))
    )


def _pca_denoms(
    body: DataFrame, cand: DataFrame, hx: DataFrame, body_keys: list[str]
) -> DataFrame:
    """#distinct body pairs (x, y) whose x has SOME head edge, per
    surviving candidate rule. ``cand`` is the small post-min_support
    (body preds, hpred) table — broadcast fan-out, then one agg."""
    return (
        body.join(F.broadcast(cand), body_keys)
        .join(hx, ["hpred", "x"])
        .groupBy(*body_keys, "hpred")
        .agg(F.count("*").alias("pca_body"))
    )


def mine_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_conf_e6: int = 0,
    max_node_degree: int | None = DEFAULT_MAX_NODE_DEGREE,
    stats_out: dict | None = None,
) -> DataFrame:
    """Mine equiv / inverse / chain rules from ``(subj, pred, obj)``.

    Returns one row per rule with measures::

        (rule, body1, body2, head, support, pca_body, head_size,
         conf_e6, hc_e6)

    ``body2`` is NULL for the single-atom families. ``rule`` ∈
    {'equiv', 'inverse', 'chain'}; read 'equiv' rows as
    ``body1(x,y) ⇒ head(x,y)``, 'inverse' as ``body1(y,x) ⇒
    head(x,y)``, 'chain' as ``body1(x,z) ∧ body2(z,y) ⇒ head(x,y)``.
    Output is deterministic (exact integer measures; no floats).
    """
    t = triples.select("subj", "pred", "obj").distinct().persist()

    heads = t.select(
        F.col("subj").alias("x"), F.col("obj").alias("y"),
        F.col("pred").alias("hpred"),
    )
    # ∃-witness table for PCA denominators + per-pred head sizes
    hx = t.select(F.col("pred").alias("hpred"), F.col("subj").alias("x")).distinct()
    hsize = t.groupBy(F.col("pred").alias("hpred")).agg(
        F.count("*").alias("head_size")
    )

    fwd = t.select(
        F.col("subj").alias("x"), F.col("obj").alias("y"),
        F.col("pred").alias("body1"),
    )
    rev = t.select(
        F.col("obj").alias("x"), F.col("subj").alias("y"),
        F.col("pred").alias("body1"),
    )

    # chain bodies: degree-cap the shared variable z, then p ⋈ q on z
    chain_t = t
    if max_node_degree is not None:
        deg = (
            t.select(F.col("subj").alias("node"))
            .union(t.select(F.col("obj").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__deg"))
        )
        hot = deg.filter(F.col("__deg") > max_node_degree)
        if stats_out is not None:
            agg = hot.agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("__deg"), F.lit(0)).alias("edges"),
            ).first()
            stats_out["chain_hot_nodes"] = int(agg["n"])
            stats_out["chain_hot_edges"] = int(agg["edges"])
            if agg["n"]:
                logger.warning(
                    "rulemine: %d nodes above degree %d excluded from "
                    "chain bodies (%d edge slots) — hub-adjacent chain "
                    "rules lose support",
                    agg["n"], max_node_degree, agg["edges"],
                )
        hot_nodes = hot.select("node")
        chain_t = (
            t.join(hot_nodes, t["subj"] == hot_nodes["node"], "left_anti")
            .join(hot_nodes, F.col("obj") == hot_nodes["node"], "left_anti")
        )
    p_edges = chain_t.select(
        F.col("subj").alias("x"), F.col("obj").alias("z"),
        F.col("pred").alias("body1"),
    )
    q_edges = chain_t.select(
        F.col("subj").alias("z"), F.col("obj").alias("y"),
        F.col("pred").alias("body2"),
    )
    chain_body = (
        p_edges.join(q_edges, "z")
        .select("body1", "body2", "x", "y")
        .distinct()
    )

    families = [
        ("equiv", fwd, ["body1"]),
        ("inverse", rev, ["body1"]),
        ("chain", chain_body, ["body1", "body2"]),
    ]
    outs = []
    for rule, body, keys in families:
        sup = _pair_counts(body, heads, keys)
        if rule == "equiv":
            sup = sup.filter(F.col("body1") != F.col("hpred"))
        sup = sup.filter(F.col("support") >= min_support)
        cand = sup.select(*keys, "hpred")
        pca = _pca_denoms(body, cand, hx, keys)
        m = (
            sup.join(pca, [*keys, "hpred"])
            .join(F.broadcast(hsize), "hpred")
            .select(
                F.lit(rule).alias("rule"),
                F.col("body1"),
                (F.col("body2") if rule == "chain" else F.lit(None).cast("string")).alias("body2"),
                F.col("hpred").alias("head"),
                "support",
                "pca_body",
                "head_size",
                F.expr(f"(support * {CONF_SCALE}) DIV pca_body").alias("conf_e6"),
                F.expr(f"(support * {CONF_SCALE}) DIV head_size").alias("hc_e6"),
            )
        )
        outs.append(m)
    res = outs[0].unionByName(outs[1]).unionByName(outs[2])
    return res.filter(F.col("conf_e6") >= min_conf_e6)
