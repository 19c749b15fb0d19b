"""Checkpoint / resume for the PARIS fixpoint (S7/S8).

The reference serializes name-level state to a TSV (objects/KGs.py:411-479);
we persist id-level state as parquet per iteration — both a resume point and
the mandatory lineage truncation for iterative self-joins (SURVEY.md §7.4).
At cluster scale the same directory layout lands on object storage / an
Iceberg checkpoint table; content is identical.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from prase_spark.paris import AlignState

_TABLES = ("matches_sub", "matches_sup", "rel_align_l", "rel_align_r")


def _iter_dir(base: str, iter_num: int) -> str:
    return os.path.join(base, f"iter={iter_num:04d}")


def save_state(state: AlignState, base_dir: str) -> str:
    """Write all four state tables + metadata; returns the iteration dir."""
    out = _iter_dir(base_dir, state.iter_num)
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for name in _TABLES:
        getattr(state, name).write.mode("overwrite").parquet(os.path.join(tmp, name))
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf8") as f:
        json.dump({"iter_num": state.iter_num, "has_load": state.has_load}, f)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.rename(tmp, out)  # atomic-ish publish: readers never see partial state
    return out


def load_state(spark: SparkSession, base_dir: str, iter_num: int | None = None) -> AlignState:
    """Load the latest (or a specific) checkpoint. Restored state behaves
    like the reference's ``load_params`` with has_load=True
    (objects/KGs.py:440-441): the θ-bootstrap is disabled on resume."""
    if iter_num is None:
        iters = sorted(
            int(d.split("=")[1])
            for d in os.listdir(base_dir)
            if d.startswith("iter=") and not d.endswith(".tmp")
        )
        if not iters:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
        iter_num = iters[-1]
    src = _iter_dir(base_dir, iter_num)
    with open(os.path.join(src, "meta.json"), encoding="utf8") as f:
        meta = json.load(f)
    frames = {name: spark.read.parquet(os.path.join(src, name)) for name in _TABLES}
    return AlignState(
        matches_sub=frames["matches_sub"],
        matches_sup=frames["matches_sup"],
        rel_align_l=frames["rel_align_l"],
        rel_align_r=frames["rel_align_r"],
        iter_num=meta["iter_num"],
        has_load=True,
    )


def export_params(
    state: AlignState,
    kg_l_nodes, kg_r_nodes, kg_l_preds, kg_r_preds,
):
    """Name-level parameter export mirroring ``save_params``
    (objects/KGs.py:411-438): one DataFrame (side, name_l, name_r, prob)
    covering entity/literal matches (both sides) and rel-align rows > 0."""
    from pyspark.sql import functions as F

    def ent_rows(matches, nodes_l, nodes_r, side):
        nl = nodes_l.select(F.col("ent_id"), F.col("name").alias("name_l"))
        nr = nodes_r.select(
            F.col("ent_id").alias("counterpart_id"), F.col("name").alias("name_r")
        )
        return (
            matches.join(nl, "ent_id")
            .join(nr, "counterpart_id")
            .select(F.lit(side).alias("side"), "name_l", "name_r", "prob")
        )

    def rel_rows(rel, preds_l, preds_r, side):
        pl = preds_l.select(F.col("pred_id"), F.col("name").alias("name_l"))
        pr = preds_r.select(
            F.col("pred_id").alias("counterpart_pred_id"), F.col("name").alias("name_r")
        )
        return (
            rel.filter(F.col("prob") > 0.0)
            .join(F.broadcast(pl), "pred_id")
            .join(F.broadcast(pr), "counterpart_pred_id")
            .select(F.lit(side).alias("side"), "name_l", "name_r", "prob")
        )

    return (
        ent_rows(state.matches_sub, kg_l_nodes, kg_r_nodes, "L")
        .unionByName(ent_rows(state.matches_sup, kg_r_nodes, kg_l_nodes, "R"))
        .unionByName(rel_rows(state.rel_align_l, kg_l_preds, kg_r_preds, "L"))
        .unionByName(rel_rows(state.rel_align_r, kg_r_preds, kg_l_preds, "R"))
    )


def roundtrip_state(state: AlignState, base_dir: str) -> AlignState:
    """Persist + reload: truncates lineage so iteration N+1's plan does not
    embed iterations 1..N (the Spark analog of the reference's per-iteration
    gc.collect(), objects/KGs.py:99)."""
    save_state(state, base_dir)
    spark = state.matches_sub.sparkSession
    loaded = load_state(spark, base_dir, state.iter_num)
    loaded.has_load = state.has_load
    return loaded
