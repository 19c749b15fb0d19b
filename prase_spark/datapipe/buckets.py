"""Band-bucket hygiene for LSH candidate generation.

Every LSH family here (minhash bands, simhash bands, hyperplane bands)
generates candidates by self-joining a banded table on (band, band_key).
The join cost per bucket is |bucket|², so ONE degenerate bucket — a
boilerplate shingle signature, a corpus of near-empty documents, a pile of
zero vectors — can turn the "scale-safe" banded join quadratic. Two tools:

- ``cap_band_buckets``: drop rows of buckets larger than a threshold
  before the self-join (pairs in a skipped bucket can still surface via
  the other bands; exactness of VERIFICATION is never affected — only
  candidate recall for members of pathological buckets).
- ``bucket_stats``: top-k largest buckets — the telemetry a 100-TB
  operator reads before a degenerate bucket hurts.

No reference analog (the reference never blocks; its candidate structures
are in-memory dicts, objects/KGs.py) — this is the distributed-scale
machinery the banded joins require.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("prase_spark.datapipe")

# Backstop, not a tuning knob: 10^4 rows/bucket caps any single bucket's
# candidate contribution at 10^8 pairs. Healthy banded workloads sit orders
# of magnitude below this; only degenerate content reaches it.
DEFAULT_MAX_BUCKET = 10_000

_BAND_COLS = ("band", "band_key")


def bucket_stats(
    banded: DataFrame, band_cols: tuple[str, ...] = _BAND_COLS, top_k: int = 10
) -> list[dict]:
    """Top-k largest band buckets as [{band, band_key, rows}, ...].
    One aggregation job; collects <= top_k rows."""
    rows = (
        banded.groupBy(*band_cols)
        .agg(F.count("*").alias("rows"))
        .orderBy(F.desc("rows"), *band_cols)
        .limit(top_k)
        .collect()
    )
    return [{c: r[c] for c in (*band_cols, "rows")} for r in rows]


def cap_band_buckets(
    banded: DataFrame,
    max_bucket_size: int | None,
    band_cols: tuple[str, ...] = _BAND_COLS,
    stats_out: dict | None = None,
    label: str = "lsh",
) -> DataFrame:
    """Guard a banded table before its candidate self-join: drop all rows
    of buckets with more than ``max_bucket_size`` members.

    ``max_bucket_size=None`` disables the cap (stats still collected when
    requested). When ``stats_out`` (a dict) is passed it is filled EAGERLY
    with ``largest_buckets`` / ``capped_buckets`` / ``capped_rows`` — one
    small extra aggregation job; skipped buckets are also logged. Without
    ``stats_out`` the cap is fully lazy (the count aggregate fuses into
    the anti-join's plan)."""
    if stats_out is not None:
        stats_out["largest_buckets"] = bucket_stats(banded, band_cols)
    if max_bucket_size is None:
        if stats_out is not None:
            stats_out["capped_buckets"] = 0
            stats_out["capped_rows"] = 0
        return banded
    counts = banded.groupBy(*band_cols).agg(F.count("*").alias("__rows"))
    hot = counts.filter(F.col("__rows") > max_bucket_size)
    if stats_out is not None:
        agg = hot.agg(
            F.count("*").alias("b"), F.coalesce(F.sum("__rows"), F.lit(0)).alias("r")
        ).first()
        stats_out["capped_buckets"] = int(agg["b"])
        stats_out["capped_rows"] = int(agg["r"])
        if agg["b"]:
            logger.warning(
                "%s: skipped %d band buckets larger than %d rows (%d rows total) — "
                "members may still pair via other bands",
                label, agg["b"], max_bucket_size, agg["r"],
            )
    # no broadcast hint: healthy runs have ~0 hot buckets (AQE broadcasts
    # the empty side); a pathological run with millions of hot buckets must
    # not OOM the driver on a forced broadcast
    return banded.join(hot.select(*band_cols), list(band_cols), "left_anti")
