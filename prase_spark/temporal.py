"""Temporal KG — fact versioning from recrawl captures.

A crawl re-fetches pages; extracted facts change between captures. The
temporal layer turns the capture-stamped fact stream (subj, pred, obj,
ts) into VERSIONED facts (subj, pred, obj, valid_from, valid_to,
is_current) — run-length collapsed intervals, the SCD-2 shape — so the
KG can answer point-in-time queries ("what did the web say on date D")
and feed freshness-aware alignment. Beyond-reference surface (the
reference's KG dumps are single-snapshot TSVs, objects/KGs.py:55-88);
the north rule's input schema carries ``warc_ts`` for exactly this.

Scale shape: two windows partitioned on the FACT key (subj, pred) —
per-key cardinality is the fact's capture count, bounded by recrawl
rate × change rate, not corpus size; dedupe per-capture-day upstream if
a hot fact (site chrome re-asserted by millions of pages) would
concentrate a key. Ties on ts within a key must be resolved upstream
(two captures of one fact at one instant have no defined order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_history(
    facts: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred"),
    val_col: str = "obj",
    ts_col: str = "ts",
) -> DataFrame:
    """(key..., val, valid_from, valid_to, is_current) — one row per
    VALUE RUN of each fact key, gaps-and-islands over the capture
    stream: a null-safe lag comparison marks island STARTS (a capture
    whose value differs from the key's previous capture); start rows
    carry (value, valid_from=ts) directly, and ``valid_to`` = the next
    start (NULL while current). Re-captures asserting an unchanged
    value extend the open interval instead of minting a version — the
    property that keeps history size proportional to CHANGE volume, not
    crawl volume.

    Plan shape: both windows partition on the fact key and the
    island-start filter preserves that partitioning, so the whole
    operator runs behind ONE hash exchange (pinned in
    tests/test_plan_hygiene.py)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(val_col).over(w)
    starts = (
        facts.withColumn("__chg", ~F.col(val_col).eqNullSafe(prev))
        .where("__chg")
        .select(*keys, val_col, F.col(ts_col).alias("valid_from"))
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return starts.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    ).withColumn("is_current", F.col("valid_to").isNull())


def facts_asof(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot of a :func:`fact_history` frame: the fact
    versions valid at ``ts`` (valid_from ≤ ts < valid_to, open
    intervals included). A partition-prunable filter — persist history
    partitioned/sorted on valid_from and the snapshot never scans
    closed-before-ts versions."""
    t = F.lit(ts)
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")


def kg_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred", "obj"),
) -> DataFrame:
    """(key..., change ∈ {added, removed}) — multiset difference between
    two KG snapshots (successive crawls): a triple is ``added`` when the
    new snapshot carries more copies than the old, ``removed`` when
    fewer; equal multiplicity (the overwhelmingly common case) emits
    nothing, so the output is change-volume-sized. ONE hash aggregation
    over the union of ±1-tagged rows — map-side combinable, no join, no
    window; the 100-TB cost is the two scans plus a shuffle of
    (triple-key, ±count) rows. A value CHANGE surfaces as one removed +
    one added row for the same (subj, pred); feed successive diffs to
    :func:`fact_history` via capture stamps for interval semantics."""
    keys = list(key_cols)
    tagged = (
        old.select(*keys).withColumn("__s", F.lit(-1))
        .unionByName(new.select(*keys).withColumn("__s", F.lit(1)))
    )
    d = tagged.groupBy(*keys).agg(F.sum("__s").alias("__d"))
    return d.where(F.col("__d") != 0).select(
        *keys,
        F.when(F.col("__d") > 0, F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("change"),
    )
