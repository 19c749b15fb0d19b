"""Skyline (Pareto frontier) over quality dimensions (Börzsönyi et al.,
ICDE 2001) — the multi-criteria selection operator curation actually
needs: "keep documents not dominated on (quality, -dup_score,
-toxicity, length)" has no single-threshold formulation; the skyline IS
that answer, and per-group skylines (per language, per source) are the
budget-free alternative to hand-tuned weighted scores.

Semantics: all dimensions MAXIMIZE (callers negate/invert to flip; the
sampling.temperature_weights quantization doctrine — direction handling
belongs to the caller). Point p dominates q iff p >= q on every
dimension and p > q on at least one; the skyline is the dominated-free
subset. The skyline SET is unique — independent of scan order or
partitioning — so the operator is value-hashable with no tie rules
needed (fully-equal points do not dominate each other; all are kept).

Scale shape (the two-phase distributed-skyline classic): each partition
computes its LOCAL skyline in one Arrow batch pass (numpy dominance
scan — the sanctioned mapInPandas hatch, since per-partition pruning is
inherently sequential), and because any globally-dominating point
survives its own partition's skyline, the global skyline equals the
skyline of the union of local skylines — computed in a second,
single-partition pass over the (drastically smaller) survivors. A
skyline that does NOT shrink the data (near-total incomparability,
e.g. 20+ dimensions) is the caller's modeling smell, not an operator
regime this implementation hides.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

#: survivors above this bound trigger another fan-in round instead of a
#: direct single-partition pass (a 10^6-row * few-doubles frame is a
#: comfortable one-task batch; the repo-wide funnel-guard doctrine)
DEFAULT_MAX_GLOBAL_ROWS = 1_000_000


def _local_skyline(cols):
    import numpy as np
    import pandas as pd

    def fn(batches):
        parts = [pdf for pdf in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        m = pdf[list(cols)].to_numpy()
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        # sort by sum desc: likely dominators first, so the kept set
        # stays small while scanning (pure optimization — the skyline
        # set is order-independent)
        order = np.argsort(-m.sum(axis=1), kind="stable")
        kept_rows = []
        kept_idx = []
        for i in order:
            row = m[i]
            if kept_rows:
                k = np.asarray(kept_rows)
                dominated = ((k >= row).all(axis=1) & (k > row).any(axis=1)).any()
                if dominated:
                    keep[i] = False
                    continue
            kept_rows.append(row)
            kept_idx.append(i)
        yield pdf.iloc[sorted(kept_idx)]

    return fn


def skyline(
    df: DataFrame,
    cols: list[str],
    max_global_rows: int = DEFAULT_MAX_GLOBAL_ROWS,
    stats_out: dict | None = None,
) -> DataFrame:
    """The dominated-free subset of ``df`` under maximize-all dominance
    over ``cols`` (numeric, non-null). Local skylines per partition, then
    the global skyline over their union.

    The global phase is GUARDED (the repo's funnel doctrine — r5 shipped
    this as the one unguarded single-partition pass): survivors are
    counted per round, and while they exceed ``max_global_rows`` the
    local pass re-runs at a decreasing partition count (the survivor set
    shrinks monotonically — a local skyline of a skyline only removes
    points) instead of concentrating a near-incomparable corpus on one
    task. ``stats_out`` receives ``skyline_rounds`` and
    ``survivors_per_round`` telemetry."""
    if not cols:
        raise ValueError("skyline needs at least one dimension column")
    local = df.mapInPandas(_local_skyline(cols), df.schema).localCheckpoint()
    survivors = local.count()
    rounds = [survivors]
    n_part = max(1, local.rdd.getNumPartitions())
    while survivors > max_global_rows and n_part > 1:
        n_part = max(1, n_part // 8)
        local = (
            local.repartition(n_part)
            .mapInPandas(_local_skyline(cols), df.schema)
            .localCheckpoint()
        )
        prev, survivors = survivors, local.count()
        rounds.append(survivors)
        if survivors >= prev and n_part > 1:
            # no shrink at this width: near-total incomparability; one
            # more halving round cannot help either — go global with a
            # loud warning rather than looping
            logger.warning(
                "skyline: %d survivors did not shrink below max_global_rows=%d "
                "(near-incomparable dimensions) — final single-partition pass "
                "over %d rows",
                survivors, max_global_rows, survivors,
            )
            break
    if stats_out is not None:
        stats_out["skyline_rounds"] = len(rounds)
        stats_out["survivors_per_round"] = rounds
    return local.repartition(1).mapInPandas(_local_skyline(cols), df.schema)
