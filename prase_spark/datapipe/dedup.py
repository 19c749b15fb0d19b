"""Deduplication suite for web-scale corpora.

- exact_dedup: hash-groupBy on normalized text (SQL-expressible).
- fingerprint_dedup: 64-bit token-stream fingerprint groupBy.
- minhash_lsh_pairs / minhash_dedup: shingle -> minhash -> band -> bucket
  join; near-dup pairs verified by exact Jaccard; clusters via
  connected-components; keep min doc_id per cluster.
- simhash_pairs: 64-bit simhash + banded hamming blocking.
- ngram_jaccard_pairs: exact n-gram Jaccard on blocked candidates (the
  small-scale oracle for the MinHash path).
- embedding near-dup: see simsearch.cosine_topk / lsh paths.

Scale posture: everything is shingle-explode + groupBy + equi-join; no
cross joins; candidate generation is banded so the shuffle is
O(docs x bands), not O(docs^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens
from prase_spark.matching import connected_components

# Mersenne prime for the universal-hash family; fits comfortably in a long.
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep min key per exact text value. One shuffle (hash agg)."""
    return (
        df.groupBy(text_col)
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("dup_count"))
        .select(key_col, text_col, "dup_count")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (native)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def shingle_table(df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(key, shingle) exploded — the base for minhash + exact jaccard."""
    return df.select(
        F.col(key_col).alias("key"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    ).distinct()


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(key, h, minhash) — one universal-hash family member per h:
    ((a_h * x + b_h) mod p); x = xxhash64(shingle). All native exprs:
    the per-h expansion is an explode of a literal parameter array, the
    min is a hash aggregation. No Python, no UDF."""
    import random

    rng = random.Random(seed)
    params = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]
    param_rows = F.array(
        *[
            F.struct(F.lit(h).alias("h"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for h, (a, b) in enumerate(params)
        ]
    )
    x = (F.xxhash64("shingle").cast("decimal(38,0)") % _MERSENNE + _MERSENNE) % _MERSENNE
    return (
        shingles.withColumn("x", x)
        .withColumn("p", F.explode(param_rows))
        .select(
            "key",
            F.col("p.h").alias("h"),
            ((F.col("p.a").cast("decimal(38,0)") * F.col("x") + F.col("p.b")) % _MERSENNE)
            .cast("long")
            .alias("hv"),
        )
        .groupBy("key", "h")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs (key_a < key_b) sharing ≥1 LSH band."""
    sigs = minhash_signatures(shingle_table(df, text_col, key_col, shingle_n), num_hashes, seed)
    rows_per_band = num_hashes // bands
    banded = (
        sigs.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy("key", "band")
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "h", "minhash"))))).alias("band_key"))
    )
    a = banded.select(F.col("key").alias("key_a"), "band", "band_key")
    b = banded.select(F.col("key").alias("key_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )


def exact_jaccard(
    shingles: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Exact Jaccard for candidate pairs via shingle co-occurrence counts:
    |A∩B| from a self-join on shingle restricted to candidates, |A∪B| from
    per-doc set sizes. Returns (key_a, key_b, jaccard)."""
    sizes = shingles.groupBy("key").agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col("key").alias("key_a"), "shingle")
    sb = shingles.select(F.col("key").alias("key_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .join(pairs, ["key_a", "key_b"], "left_semi")
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("key", "key_a").withColumnRenamed("sz", "sz_a"), "key_a")
        .join(sizes.withColumnRenamed("key", "key_b").withColumnRenamed("sz", "sz_b"), "key_b")
        .select(
            "key_a",
            "key_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ≥ threshold. Candidates are
    blocked by shared shingles (never all-pairs), so this is exact AND
    shuffle-bounded; it doubles as the oracle for the MinHash path."""
    sh = shingle_table(df, text_col, key_col, shingle_n)
    sa = sh.select(F.col("key").alias("key_a"), "shingle")
    sb = sh.select(F.col("key").alias("key_b"), "shingle")
    cand = (
        sa.join(sb, "shingle").filter(F.col("key_a") < F.col("key_b")).select("key_a", "key_b").distinct()
    )
    return exact_jaccard(sh, cand).filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact-Jaccard verify ->
    connected components -> keep min key per cluster.
    Returns (doc_id, cluster_id, keep)."""
    sh = shingle_table(df, text_col, key_col, shingle_n)
    cand = minhash_lsh_pairs(df, text_col, key_col, num_hashes, bands, shingle_n, seed)
    verified = exact_jaccard(sh, cand).filter(F.col("jaccard") >= threshold)
    comp = connected_components(verified, src="key_a", dst="key_b")
    all_keys = df.select(F.col(key_col).alias("node"))
    labeled = all_keys.join(comp, "node", "left").select(
        F.col("node").alias(key_col),
        F.coalesce("component", F.col("node")).alias("cluster_id"),
    )
    return labeled.withColumn(
        "keep", F.col(key_col) == F.min(key_col).over(Window.partitionBy("cluster_id"))
    )


def simhash64(col: Column | str, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles — pure native bit arithmetic:
    per-shingle xxhash64, sum of per-bit +/-1 votes via explode-free
    aggregate over the shingle array."""
    grams = word_shingles(col, shingle_n)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, hv: acc
            + F.when(hv.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, vote in enumerate(bit_votes):
        bit = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, i))
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-dup candidates by SimHash banding (4 bands of 16 bits: any pair
    within hamming distance 3 shares ≥1 exact band), verified by true
    hamming distance ≤ max_hamming."""
    sh = df.select(F.col(key_col).alias("key"), simhash64(text_col, shingle_n).alias("sig"))
    bands = []
    for b in range(4):
        bands.append(
            sh.select(
                "key",
                "sig",
                F.lit(b).alias("band"),
                F.shiftrightunsigned("sig", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
        )
    banded = bands[0]
    for other in bands[1:]:
        banded = banded.unionByName(other)
    a = banded.select(F.col("key").alias("key_a"), F.col("sig").alias("sig_a"), "band", "band_key")
    b = banded.select(F.col("key").alias("key_b"), F.col("sig").alias("sig_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("key_a", "key_b", "hamming")
