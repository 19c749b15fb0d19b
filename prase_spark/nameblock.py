"""Name-similarity candidate blocking for cross-KG entity linking.

The reference seeds alignment exclusively from EXACT literal equality
(objects/KGs.py:53-58) — web-scale KGs with divergent vocabularies or
noisy surface forms need LINGUISTIC blocking: entities whose NAMES are
near-duplicate character strings become candidate pairs. Re-expresses the
dedup machinery across two sides: character-n-gram shingles -> minhash ->
banded LSH join BETWEEN the KGs -> exact char-n-gram Jaccard verify.
Never an all-pairs name comparison: the cross join is replaced by the
band equi-join, whose per-bucket volume is capped by the shared guard
(buckets.cap_band_buckets).

Scale posture matches minhash_dedup: shingle tables pinned once, band
keys are exact sorted minhash-slot strings (engine-replicable, unbounded
keyspace), verification is per-pair array intersection independent of
shingle document frequency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets
from prase_spark.datapipe.dedup import exact_jaccard, minhash_band_table

# side tags keep the union shingle-set table's keys disjoint; \x1f never
# appears in KG surface forms
_L, _R = "L\x1f", "R\x1f"


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-gram shingles of a string column (native).
    Strings shorter than ``n`` yield the whole string as one shingle."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substr(c, i, F.lit(n))))


def char_shingle_table(
    df: DataFrame, name_col: str = "name", key_col: str = "name", n: int = 3
) -> DataFrame:
    """(key, shingle) exploded char n-grams — the cross-KG analog of
    dedup.shingle_table (which shingles WORDS of documents)."""
    return df.select(
        F.col(key_col).alias("key"), F.explode(char_shingles(name_col, n)).alias("shingle")
    )


def name_candidates(
    names_l: DataFrame,
    names_r: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    hash_fn=None,
    name_col: str = "name",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """Cross-KG candidate pairs (name_l, name_r, jaccard) with exact
    char-n-gram Jaccard >= threshold, blocked by shared minhash bands.

    Both sides are deduplicated on the name (one signature per distinct
    surface form — a name repeated across 10^6 mentions costs one row
    here; fan the result back out by joining on the name). The threshold
    comparison is a single division of identical integers in any engine,
    so the pair set is engine-exact; banding recall is 1-(1-j^r)^b on the
    SAME hash family everywhere (misses are deterministic, not noise).
    Defaults r=2 slots/band × 16 bands: >=0.999 recall at jaccard 0.6 —
    names are short, so the extra low-similarity candidates r=2 admits
    are cheap to verify; for LONG strings prefer minhash_lsh_pairs'
    4-slot bands."""
    # side tag goes on the KEY only — shingles come from the RAW surface
    # form (tag-boundary n-grams would dilute the jaccard)
    l_names = names_l.select(F.col(name_col).alias("name")).distinct().select(
        F.concat(F.lit(_L), "name").alias("key"), "name"
    )
    r_names = names_r.select(F.col(name_col).alias("name")).distinct().select(
        F.concat(F.lit(_R), "name").alias("key"), "name"
    )
    sh_l = char_shingle_table(l_names, name_col="name", key_col="key", n=n).localCheckpoint()
    sh_r = char_shingle_table(r_names, name_col="name", key_col="key", n=n).localCheckpoint()
    banded_l = cap_band_buckets(
        minhash_band_table(sh_l, num_hashes, bands, seed, hash_fn),
        max_bucket_size, stats_out=stats_out, label="nameblock_l",
    )
    banded_r = cap_band_buckets(
        minhash_band_table(sh_r, num_hashes, bands, seed, hash_fn),
        max_bucket_size, label="nameblock_r",
    )
    cand = (
        banded_l.select(F.col("key").alias("key_a"), "band", "band_key")
        .join(banded_r.select(F.col("key").alias("key_b"), "band", "band_key"),
              ["band", "band_key"])
        .select("key_a", "key_b")
        .distinct()
        .localCheckpoint()
    )
    verified = exact_jaccard(sh_l.unionByName(sh_r), cand).filter(
        F.col("jaccard") >= threshold
    )
    strip = len(_L)
    return verified.select(
        F.col("key_a").substr(F.lit(strip + 1), F.length("key_a")).alias("name_l"),
        F.col("key_b").substr(F.lit(strip + 1), F.length("key_b")).alias("name_r"),
        "jaccard",
    )
