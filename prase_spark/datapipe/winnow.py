"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): position-robust local fingerprints
with a guaranteed detection window.

Where this sits among the dedup fingerprinting schemes already here:
fingerprint_documents (textstats) hashes whole docs — exact-dup only;
minhash sketches the SET of shingles — global similarity, no locality;
substrdedup finds exact duplicated SPANS — precise but span-aligned;
cdc_chunks cuts content-defined blocks — edit-stable storage units.
Winnowing is the guarantee-carrying middle ground: from every window
of ``w`` consecutive k-gram hashes select the minimum (ties -> the
RIGHTMOST occurrence, the MOSS rule), and any shared substring of
length >= w + k - 1 between two documents is GUARANTEED to contribute
at least one common fingerprint — the property plagiarism/reuse
detectors are built on, with density ~2/(w+1) instead of every gram.

Determinism: k-gram hashes are poly_hash61 over the shared tokens()
normalization (single-space rejoin), selection is a pure function of
the hash sequence, and the (position, fingerprint) set is DISTINCT per
doc — value-hashable, and the DuckDB twin replays the same windows via
frame minima + a rightmost-position join.

Scale shape: one Generate per doc (its gram-hash array), selection in
a single codegen transform/aggregate pass (n windows x w scans per
doc, w is small), no shuffle until the caller aggregates fingerprints
— matching on fingerprints is then a plain equi-join, bucketable by
the existing band machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.hashing import poly_hash61
from prase_spark.datapipe.textstats import tokens


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(<key_col>, pos, fp): the winnowed fingerprint set — ``fp`` the
    selected k-gram's poly hash, ``pos`` its 1-based gram position in
    the normalized text. Documents shorter than k grams contribute
    their single whole-string gram; shorter than one window fall back
    to their global minimum (the algorithm's natural degenerate case:
    one window spanning everything)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    norm = F.concat_ws(" ", tokens(text_col))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    gram_idx = F.sequence(F.lit(1), n_grams)
    hashes = F.transform(
        gram_idx, lambda i: poly_hash61(F.substr(norm, i, F.lit(k)))
    )
    base = docs.select(
        F.col(key_col).alias("key"), hashes.alias("h")
    ).where(F.size("h") > 0)
    n_win = F.greatest(F.size("h") - (w - 1), F.lit(1))
    win_w = F.least(F.lit(w), F.size("h"))
    # per window start i (1-based): slice, min, rightmost position of min
    sel = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.struct(
            (
                i
                + F.array_max(
                    F.zip_with(
                        F.slice(F.col("h"), i, win_w),
                        F.sequence(F.lit(0), win_w - 1),
                        lambda v, p: F.when(
                            v == F.array_min(F.slice(F.col("h"), i, win_w)), p
                        ).otherwise(F.lit(-1)),
                    )
                )
            ).alias("pos"),
            F.array_min(F.slice(F.col("h"), i, win_w)).alias("fp"),
        ),
    )
    return (
        base.select("key", F.explode(sel).alias("s"))
        .select(
            F.col("key").alias(key_col),
            F.col("s.pos").cast("long").alias("pos"),
            F.col("s.fp").alias("fp"),
        )
        .distinct()
    )
