"""P/R/F1 evaluation sweep (objects/KGs.py:281-331, A9).

The reference rescans the match array once per threshold; we aggregate prob
histograms once and sweep driver-side — one Spark job for the whole grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_alignment(
    matches_sub: DataFrame,
    gold: DataFrame,
    thresholds: list[float] | None = None,
) -> list[dict]:
    """``gold``: (ent_l, ent_r) id pairs. Predicted pairs are entity matches
    with prob ≥ threshold (objects/KGs.py:305-311). Returns one dict per
    threshold with precision/recall/f1 (0.0 where undefined)."""
    thresholds = thresholds if thresholds is not None else [0.1 * i for i in range(10)]
    pred = matches_sub.filter(~F.col("is_lit")).select(
        F.col("ent_id").alias("ent_l"), F.col("counterpart_id").alias("ent_r"), "prob"
    )

    # Bucket probs to the threshold grid BEFORE collecting: fused scores are
    # near-continuous doubles, so a raw groupBy("prob") collect is
    # O(#matched entities) driver rows. bucket(p) = max{t in grid : t <= p}
    # preserves every sweep sum exactly (p >= t  <=>  bucket(p) >= t for
    # t in the grid), and the collect is <= len(thresholds)+1 rows.
    bucket = F.lit(float("-inf"))
    for t in sorted(thresholds):
        bucket = F.when(F.col("prob") >= F.lit(float(t)), F.lit(float(t))).otherwise(bucket)

    # ONE aggregation for both histograms: tag each predicted pair with its
    # gold membership (left join against the deduped gold set — the
    # reference's gold is a dict, so set semantics) and count/count-nonnull
    # per bucket. Two separate histogram jobs would re-run the prediction
    # DAG per iteration of the PRASE loop.
    g = gold.select("ent_l", "ent_r").distinct().withColumn("__g", F.lit(1))
    hist_rows = (
        pred.join(g, ["ent_l", "ent_r"], "left")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("pred_cnt"), F.count("__g").alias("correct_cnt"))
        .collect()
    )
    pred_hist = [(r["bucket"], r["pred_cnt"]) for r in hist_rows]
    correct_hist = [(r["bucket"], r["correct_cnt"]) for r in hist_rows]
    # recall denominator from the SAME deduped frame the numerator joins
    # against — raw gold.count() over-counts repeated gold rows, deflating
    # recall/F1 when the gold file contains duplicate pairs.
    total = g.count()
    out = []
    for t in thresholds:
        predict_num = sum(c for p, c in pred_hist if p >= t)
        correct_num = sum(c for p, c in correct_hist if p >= t)
        precision = correct_num / predict_num if predict_num else 0.0
        recall = correct_num / total if total else 0.0
        f1 = (
            2.0 * precision * recall / (precision + recall)
            if precision > 0.0 and recall > 0.0
            else 0.0
        )
        out.append(
            {
                "threshold": t,
                "predicted": predict_num,
                "correct": correct_num,
                "gold": total,
                "precision": precision,
                "recall": recall,
                "f1": f1,
            }
        )
    return out


def embed_align_split(
    matches_sub: DataFrame, gold: DataFrame, threshold: float = 0.0
) -> tuple[DataFrame, DataFrame]:
    """S10 (objects/KGs.py:333-371): predicted matches ≥ threshold become
    train links; gold pairs whose left entity was NOT predicted become
    test/valid links (left anti-join)."""
    predicted = matches_sub.filter(
        (~F.col("is_lit")) & (F.col("prob") >= threshold)
    ).select(F.col("ent_id").alias("ent_l"), F.col("counterpart_id").alias("ent_r"))
    visited = predicted.select("ent_l").distinct()
    test = gold.join(visited, "ent_l", "left_anti")
    return predicted, test


def blocking_metrics(
    candidates: DataFrame,
    gold: DataFrame,
    left: DataFrame,
    right: DataFrame,
    id_left: str = "l_id",
    id_right: str = "r_id",
) -> DataFrame:
    """Blocking-quality report (Christen 2012) for ANY candidate
    generator in the package (name blocking, LSH/minhash bands,
    deletion-neighborhood fuzzy join): one row with

    - ``n_left`` / ``n_right`` / ``total_pairs`` — the cross-product a
      blocker avoids (total_pairs = n_left*n_right as BIGINT; at
      >3x10^9 rows per side widen to DECIMAL before multiplying);
    - ``n_candidates`` / ``n_gold`` / ``n_true_candidates`` — exact
      distinct-pair counts;
    - ``rr_e6`` reduction ratio, ``pc_e6`` pairs completeness (blocking
      recall), ``pq_e6`` pairs quality (blocking precision) — each an
      exact integer-division micro-unit, so the whole report value-hashes.

    Plan: three distinct-count aggregations plus one semi-join count,
    assembled by one-row cross joins (no data-scale exchange beyond
    the distincts the inputs require). Zero denominators report 0 —
    "found nothing" beats a divide error mid-report.
    """
    c = candidates.select(id_left, id_right).distinct()
    g = gold.select(id_left, id_right).distinct()
    nc = c.agg(F.count("*").cast("bigint").alias("n_candidates"))
    ng = g.agg(F.count("*").cast("bigint").alias("n_gold"))
    nt = (
        c.join(g, [id_left, id_right], "left_semi")
        .agg(F.count("*").cast("bigint").alias("n_true_candidates"))
    )
    nl = left.agg(F.countDistinct(id_left).cast("bigint").alias("n_left"))
    nr = right.agg(F.countDistinct(id_right).cast("bigint").alias("n_right"))
    row = nl.crossJoin(nr).crossJoin(nc).crossJoin(ng).crossJoin(nt)
    # SQL `div` = exact integer division (the package's scaled-integer
    # sink doctrine); CASE guards report 0 on empty denominators
    return row.select(
        "n_left",
        "n_right",
        F.expr("CAST(n_left * n_right AS BIGINT)").alias("total_pairs"),
        "n_candidates",
        "n_gold",
        "n_true_candidates",
        F.expr(
            "CAST(CASE WHEN n_left * n_right > 0 THEN "
            "1000000 - (1000000 * n_candidates) div (n_left * n_right) "
            "ELSE 0 END AS BIGINT)"
        ).alias("rr_e6"),
        F.expr(
            "CAST(CASE WHEN n_gold > 0 THEN "
            "(1000000 * n_true_candidates) div n_gold ELSE 0 END AS BIGINT)"
        ).alias("pc_e6"),
        F.expr(
            "CAST(CASE WHEN n_candidates > 0 THEN "
            "(1000000 * n_true_candidates) div n_candidates "
            "ELSE 0 END AS BIGINT)"
        ).alias("pq_e6"),
    )


def cluster_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Clustering-quality report for the canonicalization layer: compare
    a predicted clustering (e.g. connected-components canonical ids,
    label-propagation communities, dedup clusters) against a gold
    clustering of the SAME items. One row with exact-integer surfaces:

    - pairwise counts (Menestrina et al. 2010): ``tp_pairs`` (item pairs
      co-clustered in both), ``pred_pairs`` / ``gold_pairs``, and
      ``pair_prec_e6`` / ``pair_rec_e6`` / ``pair_f1_e6`` micro-units;
    - B-cubed (Bagga & Baldwin 1998): per-item precision n_ij/|P_j| and
      recall n_ij/|G_i| averaged over items —
      ``bcubed_prec_e6`` = (sum over cells of (10^6*n_ij^2) div |P_j|)
      div N, same shape for recall. Floor-per-cell-then-floor is the
      pinned convention (documented so the DuckDB twin is exact).

    Items are matched on ``id_col`` with an INNER join: both sides must
    cluster the same universe (evaluate coverage separately — silently
    scoring half-covered predictions hides deletion bugs).

    Plan: one equi-join, one contingency groupBy (map-side combinable),
    two marginal groupBys REUSING the contingency table (never re-scan
    the items), assembled by one-row cross joins. Counts use
    ``n*(n-1) DIV 2`` on BIGINT — exact to 3x10^9 items per cell."""
    p = pred.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("pc"))
    g = gold.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("gc"))
    j = p.join(g, "id")
    cont = j.groupBy("pc", "gc").agg(F.count("*").alias("n_ij")).persist()

    psz = cont.groupBy("pc").agg(F.sum("n_ij").alias("n_p"))
    gsz = cont.groupBy("gc").agg(F.sum("n_ij").alias("n_g"))

    tp = cont.agg(
        F.expr("CAST(sum((n_ij * (n_ij - 1)) DIV 2) AS BIGINT)").alias("tp_pairs")
    )
    pp = psz.agg(
        F.expr("CAST(sum((n_p * (n_p - 1)) DIV 2) AS BIGINT)").alias("pred_pairs")
    )
    gp = gsz.agg(
        F.expr("CAST(sum((n_g * (n_g - 1)) DIV 2) AS BIGINT)").alias("gold_pairs")
    )
    n = j.agg(F.count("*").cast("bigint").alias("n_items"))
    bp = (
        cont.join(psz, "pc")
        .agg(
            F.expr(
                "CAST(sum((1000000 * n_ij * n_ij) DIV n_p) AS BIGINT)"
            ).alias("__bp_sum")
        )
    )
    br = (
        cont.join(gsz, "gc")
        .agg(
            F.expr(
                "CAST(sum((1000000 * n_ij * n_ij) DIV n_g) AS BIGINT)"
            ).alias("__br_sum")
        )
    )
    row = n.crossJoin(tp).crossJoin(pp).crossJoin(gp).crossJoin(bp).crossJoin(br)
    return row.select(
        "n_items",
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        F.expr(
            "CAST(CASE WHEN pred_pairs > 0 THEN (1000000 * tp_pairs) DIV "
            "pred_pairs ELSE 0 END AS BIGINT)"
        ).alias("pair_prec_e6"),
        F.expr(
            "CAST(CASE WHEN gold_pairs > 0 THEN (1000000 * tp_pairs) DIV "
            "gold_pairs ELSE 0 END AS BIGINT)"
        ).alias("pair_rec_e6"),
        F.expr(
            "CAST(CASE WHEN pred_pairs > 0 AND gold_pairs > 0 AND "
            "(1000000 * tp_pairs) DIV pred_pairs + (1000000 * tp_pairs) "
            "DIV gold_pairs > 0 THEN "
            "(2 * ((1000000 * tp_pairs) DIV pred_pairs) * "
            "((1000000 * tp_pairs) DIV gold_pairs)) DIV "
            "((1000000 * tp_pairs) DIV pred_pairs + "
            "(1000000 * tp_pairs) DIV gold_pairs) ELSE 0 END AS BIGINT)"
        ).alias("pair_f1_e6"),
        F.expr(
            "CAST(CASE WHEN n_items > 0 THEN __bp_sum DIV n_items "
            "ELSE 0 END AS BIGINT)"
        ).alias("bcubed_prec_e6"),
        F.expr(
            "CAST(CASE WHEN n_items > 0 THEN __br_sum DIV n_items "
            "ELSE 0 END AS BIGINT)"
        ).alias("bcubed_rec_e6"),
    )
