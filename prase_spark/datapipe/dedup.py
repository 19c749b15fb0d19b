"""Deduplication suite for web-scale corpora.

- exact_dedup: hash-groupBy on exact text (SQL-expressible); the
  fingerprint variant (textstats.fingerprint64 groupBy) dedups on the
  normalized token stream.
- minhash_lsh_pairs / minhash_dedup: shingle -> minhash -> band -> bucket
  join; near-dup pairs verified by exact Jaccard; clusters via
  connected-components; keep min doc_id per cluster.
- simhash_signature_table / simhash_pairs: 64-bit simhash + banded
  hamming blocking.
- ngram_jaccard_pairs: exact n-gram Jaccard on blocked candidates (the
  small-scale oracle for the MinHash path), stop-shingle df cap for
  boilerplate-heavy corpora.
- embedding-cosine near-dup: simsearch.embedding_neardup (hyperplane-LSH
  blocked); ANN via simsearch.cosine_topk/lsh_topk/ivf_topk.

Scale posture: everything is shingle-explode + groupBy + equi-join; no
cross joins; candidate generation is banded so the shuffle is
O(docs x bands), not O(docs^2); verification is per-pair array
intersection, independent of shingle document frequency; composite
pipelines pin every intermediate exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import logging

from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets
from prase_spark.datapipe.textstats import tokens
from prase_spark.matching import connected_components

logger = logging.getLogger("prase_spark.datapipe")

# Mersenne prime for the universal-hash family. 2^31-1 keeps the whole
# (a*x + b) mod p chain in overflow-safe LONG arithmetic under ANSI mode
# (a, x < 2^31 -> a*x < 2^62): the previous 2^61-1 modulus forced
# decimal(38,0) — BigDecimal-backed at that precision, measured ~8x slower
# per signature on KB-scale docs. A 31-bit minhash space is ample: LSH
# banding compares equality of 4-slot signatures (~124 bits per band) and
# near-dup verification is exact regardless.
_MERSENNE = (1 << 31) - 1


def exact_dedup(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", hash_fn=None
) -> DataFrame:
    """Keep min key per exact text value.

    Groups on xxhash64(text) — NOT on the text itself: with multi-KB
    documents as the grouping key, every shuffle-side key comparison and
    sort touches the full text; an 8-byte hash key moves the text as
    payload only. Collision-SAFE, not collision-assuming: within each hash
    group the distinct texts are counted, and the (astronomically rare at
    64 bits, but nonzero at 10^12 docs) colliding groups are re-grouped on
    the exact text — so the result is byte-exact dedup at hash-group cost.
    ``hash_fn``: pluggable for tests (deliberately-colliding hash)."""
    hash_fn = hash_fn or F.xxhash64
    hashed = df.select(
        F.col(key_col).alias(key_col),
        F.col(text_col).alias(text_col),
        hash_fn(F.col(text_col)).alias("__h"),
    )
    # collision detection via min(text)==max(text): plain partial-aggregable
    # order stats (a count(DISTINCT text) would Expand and re-group on the
    # full text — exactly the shuffle shape this rewrite removes).
    # NULL-text handling: min/max skip NULLs, so an all-NULL group compares
    # NULL==NULL -> NULL and would fall out of BOTH filters; count(text)
    # disambiguates — all-NULL groups are trivially uniform, and a group
    # mixing NULL with non-NULL texts (possible only under a hash
    # collision, since xxhash64 maps NULL to the constant seed hash) goes
    # through the exact-text regroup, whose groupBy keeps NULL as a group.
    grouped = hashed.groupBy("__h").agg(
        F.min_by(F.struct(key_col, text_col), F.col(key_col)).alias("rep"),
        F.count("*").alias("dup_count"),
        F.when(F.count(text_col) == 0, F.lit(True))
        .when(
            F.count(text_col) == F.count("*"), F.min(text_col) == F.max(text_col)
        )
        .otherwise(F.lit(False))
        .alias("__uniform"),
    )
    safe = grouped.filter(F.col("__uniform")).select(
        F.col(f"rep.{key_col}").alias(key_col),
        F.col(f"rep.{text_col}").alias(text_col),
        "dup_count",
    )
    unsafe_h = grouped.filter(~F.col("__uniform")).select("__h")
    unsafe = (
        hashed.join(unsafe_h, "__h", "left_semi")
        .groupBy(text_col)
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("dup_count"))
        .select(key_col, text_col, "dup_count")
    )
    return safe.unionByName(unsafe)


def word_shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Callers must bind ``toks`` to a real column (projection
    below), never pass ``tokens(text)`` inline: higher-order functions are
    interpreted (no codegen subexpression elimination), so a captured
    tokenizer expression is re-evaluated per lambda element — measured 14x
    slower on 300-char docs."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (native). Prefer
    shingle_table / word_shingles_of in hot paths (see note there)."""
    return word_shingles_of(tokens(col), n)


def shingle_table(df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(key, shingle) exploded, distinct per key — the base for minhash +
    exact jaccard. The tokenizer runs once per row in the projection BELOW
    the explode (the Generate bars projection collapse), not per shingle.

    Per-key distinctness comes from word_shingles_of's array_distinct, NOT
    from a DataFrame distinct(): a global distinct would re-shuffle the
    largest table in the dedup pipeline for rows that are already unique
    (``key_col`` must be a key of ``df``, which every caller guarantees)."""
    toked = df.select(F.col(key_col).alias("key"), tokens(text_col).alias("__toks"))
    return toked.select(
        "key", F.explode(word_shingles_of(F.col("__toks"), n)).alias("shingle")
    )


def minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """The seeded universal-hash family (a_h, b_h) — shared with the DuckDB
    oracle generator so both engines use identical parameters."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42, hash_fn=None
) -> DataFrame:
    """(key, h, minhash) — one universal-hash family member per h:
    ((a_h * x + b_h) mod p); x = hash(shingle). All native exprs:
    the per-h expansion is an explode of a literal parameter array, the
    min is a hash aggregation. No Python, no UDF.

    ``hash_fn``: Column->Column string hash; default F.xxhash64 (fast
    path). Pass hashing.poly_hash61 for the DuckDB-replicable variant the
    correctness gate verifies value-for-value."""
    hash_fn = hash_fn or F.xxhash64
    params = minhash_params(num_hashes, seed)
    param_rows = F.array(
        *[
            F.struct(F.lit(h).alias("h"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for h, (a, b) in enumerate(params)
        ]
    )
    x = F.pmod(hash_fn(F.col("shingle")), F.lit(_MERSENNE))
    return (
        shingles.withColumn("x", x)
        .withColumn("p", F.explode(param_rows))
        .select(
            "key",
            F.col("p.h").alias("h"),
            ((F.col("p.a") * F.col("x") + F.col("p.b")) % _MERSENNE).alias("hv"),
        )
        .groupBy("key", "h")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_wide_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 42, hash_fn=None
) -> DataFrame:
    """(key, m0..m{num_hashes-1}) wide signature rows from a (key,
    shingle) table: ``num_hashes`` min-aggregates in ONE groupBy(key) —
    no parameter-family explode, so the shuffle is O(docs × columns).
    This is also the durable **signature store** format for incremental
    dedup (datapipe.incremental): one row per corpus document, banding
    derivable by projection (no re-tokenization of the corpus)."""
    hash_fn = hash_fn or F.xxhash64
    params = minhash_params(num_hashes, seed)
    x = F.pmod(hash_fn(F.col("shingle")), F.lit(_MERSENNE))
    hx = sh.select("key", x.alias("x"))
    return hx.groupBy("key").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % _MERSENNE).alias(f"m{h}")
            for h, (a, b) in enumerate(params)
        ]
    )


def band_keys_of_wide(
    mins: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(key, band, band_key) from wide signature rows. The band key is
    the sorted ``h:minhash`` concat string (exact, engine-replicable)."""
    if bands > num_hashes:
        raise ValueError(
            f"bands ({bands}) must be <= num_hashes ({num_hashes}): each band "
            "needs at least one signature slot"
        )
    rows_per_band = num_hashes // bands
    # ceil-divide so remainder slots (num_hashes % bands != 0) still form a
    # final partial band instead of silently dropping out of candidate
    # generation (matches the long-format banding h // rows_per_band)
    n_groups = -(-num_hashes // rows_per_band)
    band_structs = []
    for b in range(n_groups):
        slots = range(b * rows_per_band, min((b + 1) * rows_per_band, num_hashes))
        entries = F.sort_array(
            F.array(*[F.concat_ws(":", F.lit(str(h)), F.col(f"m{h}")) for h in slots])
        )
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws(",", entries).alias("band_key"))
        )
    return mins.select(
        "key", F.explode(F.array(*band_structs)).alias("s")
    ).select("key", "s.band", "s.band_key")


def minhash_band_table(
    sh: DataFrame, num_hashes: int = 64, bands: int = 16, seed: int = 42, hash_fn=None
) -> DataFrame:
    """(key, band, band_key) from a (key, shingle) table — the shared
    banded-signature builder behind minhash_lsh_pairs (self-join dedup)
    and nameblock.name_candidates (cross-KG join). Composition of
    :func:`minhash_wide_signatures` + :func:`band_keys_of_wide`."""
    return band_keys_of_wide(
        minhash_wide_signatures(sh, num_hashes, seed, hash_fn), num_hashes, bands
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn=None,
    shingles: DataFrame | None = None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (key_a < key_b) sharing ≥1 LSH band.
    ``shingles``: optionally reuse a precomputed (persisted) shingle table
    so composite pipelines don't re-tokenize the corpus.

    ``max_bucket_size`` guards the banded self-join against degenerate
    buckets (e.g. millions of near-empty docs sharing one signature);
    ``stats_out`` surfaces bucket telemetry — see buckets.cap_band_buckets.

    The band key is the sorted ``h:minhash`` concat string itself (exact —
    no second hashing layer, so the band join is engine-replicable; a band
    key is ~4 slot strings, well under typical URI key widths).

    Signatures are computed as ``num_hashes`` min-aggregates in ONE
    groupBy(key) over the shingle rows — value-identical to the long-format
    minhash_signatures (pytest-pinned) but without exploding the parameter
    family, so the shuffle is O(docs × num_hashes columns) instead of
    O(shingles × num_hashes rows)."""
    sh = shingles if shingles is not None else shingle_table(df, text_col, key_col, shingle_n)
    banded = minhash_band_table(sh, num_hashes, bands, seed, hash_fn)
    banded = cap_band_buckets(banded, max_bucket_size, stats_out=stats_out, label="minhash_lsh")
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
    """Exact Jaccard for candidate pairs — per-pair set intersection, NO
    shingle co-occurrence join.

    The obvious verify plan (self-join the shingle table on ``shingle``,
    then semi-filter to candidates) costs Σ df(shingle)² regardless of how
    few candidates LSH produced: Catalyst cannot push a pair-semi below the
    shingle join, and one boilerplate shingle in 10⁸ docs is a 10¹⁶-row
    partition. Instead each doc's shingle set is packed into one array
    (bounded by tokens/doc), the candidate pairs pull both arrays via two
    key equi-joins, and |A∩B| is a native ``array_intersect`` — total cost
    O(|pairs| × shingles/doc), independent of shingle document frequency.
    Returns (key_a, key_b, jaccard)."""
    sets_ = shingles.groupBy("key").agg(
        F.collect_set("shingle").alias("shset"), F.count("*").alias("sz")
    )
    cand_keys_a = pairs.select(F.col("key_a").alias("key")).distinct()
    cand_keys_b = pairs.select(F.col("key_b").alias("key")).distinct()
    sets_a = sets_.join(cand_keys_a, "key", "left_semi").select(
        F.col("key").alias("key_a"), F.col("shset").alias("set_a"), F.col("sz").alias("sz_a")
    )
    sets_b = sets_.join(cand_keys_b, "key", "left_semi").select(
        F.col("key").alias("key_b"), F.col("shset").alias("set_b"), F.col("sz").alias("sz_b")
    )
    return (
        pairs.join(sets_a, "key_a")
        .join(sets_b, "key_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
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
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ≥ threshold. Candidates are
    blocked by shared shingles (never all-pairs), so this is exact AND
    shuffle-bounded; it doubles as the oracle for the MinHash path.

    ``max_shingle_df`` (the stop-shingle cap) applies to candidate
    GENERATION only — verification always scores the complete shingle sets,
    so any emitted jaccard is exact; a pair sharing nothing but >max_df
    boilerplate shingles is skipped (its jaccard is dominated by stop
    shingles anyway). The default is FINITE: one shingle shared by d docs
    is d² candidate rows, so an uncapped default is quadratic on
    boilerplate-heavy corpora; dropped shingles are logged. Pass None for
    fully exact generation at small scale."""
    sh = shingle_table(df, text_col, key_col, shingle_n)
    # pin the shingle table (read by candidate gen AND by the verify's set
    # packing) and the candidate pairs (read 3x inside exact_jaccard — two
    # key semi-joins + the pair join; unpinned, the whole candidate DAG
    # would re-run per read)
    sh = sh.localCheckpoint()
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .localCheckpoint()
        )
        n_hot = hot.count()
        if n_hot:
            logger.warning(
                "ngram_jaccard_pairs: dropped %d stop-shingles with df > %d from "
                "candidate generation (verification stays exact)",
                n_hot, max_shingle_df,
            )
        gen = sh.join(hot.select("shingle"), "shingle", "left_anti")
    else:
        gen = sh
    sa = gen.select(F.col("key").alias("key_a"), "shingle")
    sb = gen.select(F.col("key").alias("key_b"), "shingle")
    cand = (
        sa.join(sb, "shingle").filter(F.col("key_a") < F.col("key_b")).select("key_a", "key_b").distinct()
    ).localCheckpoint()
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
    hash_fn=None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact-Jaccard verify ->
    connected components -> keep min key per cluster.
    Returns (doc_id, cluster_id, keep).

    Each intermediate is materialized exactly once: the shingle table feeds
    both the signature pass and the verify's set packing, and the candidate
    pairs are read 3x inside exact_jaccard — left lazy, the candidate DAG
    (tokenize -> minhash -> band join) would re-run per consumer.

    ``max_bucket_size`` / ``stats_out``: band-bucket guard + telemetry
    (buckets.cap_band_buckets) on the LSH candidate join."""
    sh = shingle_table(df, text_col, key_col, shingle_n).localCheckpoint()
    cand = minhash_lsh_pairs(
        df, text_col, key_col, num_hashes, bands, shingle_n, seed, hash_fn,
        shingles=sh, max_bucket_size=max_bucket_size, stats_out=stats_out,
    ).localCheckpoint()
    verified = exact_jaccard(sh, cand).filter(F.col("jaccard") >= threshold).localCheckpoint()
    comp = connected_components(verified, src="key_a", dst="key_b")
    all_keys = df.select(F.col(key_col).alias("node"))
    labeled = all_keys.join(comp, "node", "left").select(
        F.col("node").alias(key_col),
        F.coalesce("component", F.col("node")).alias("cluster_id"),
    )
    # connected_components labels every node with the MIN member id of its
    # component (and unmatched keys label themselves), so the per-cluster
    # min IS the cluster_id — the representative test needs no window
    # shuffle over the full corpus (r6: one Exchange + Sort removed from
    # the plan tail).
    return labeled.withColumn("keep", F.col(key_col) == F.col("cluster_id"))


def keep_best(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str = "quality",
    key_col: str = "doc_id",
) -> DataFrame:
    """Re-pick each near-dup cluster's representative by QUALITY instead of
    min id: keep the highest-``score_col`` member, ties -> lowest key (so
    exact copies resolve to the earliest document — what a training-data
    pipeline wants when deduping a crawl against a quality model).

    ``clusters``: (key_col, cluster_id[, keep]) from :func:`minhash_dedup`
    or simsearch.embedding_neardup; ``scores``: (key_col, score_col).
    One equi-join + one hash aggregation (max_by over a broadcastable
    per-cluster best table is NOT used: best is joined back by cluster_id,
    O(rows) shuffle, no per-cluster collect). ``key_col`` must be numeric
    (the tie-break negates it).

    ``scores`` need not cover every key: unscored members lose to any
    scored member, and a cluster with NO scored member falls back to the
    min-key rule — no cluster ever vanishes from the output (the join to
    scores is LEFT, so coverage gaps degrade, never drop)."""
    joined = clusters.select(key_col, "cluster_id").join(
        scores.select(key_col, score_col), key_col, "left"
    )
    best = joined.groupBy("cluster_id").agg(
        F.max_by(
            F.col(key_col),
            F.struct(
                F.col(score_col).isNotNull().cast("int").alias("scored"),
                F.coalesce(F.col(score_col).cast("double"), F.lit(0.0)).alias("s"),
                (-F.col(key_col)).alias("nk"),
            ),
        ).alias("best_key")
    )
    return (
        clusters.select(key_col, "cluster_id")
        .join(best, "cluster_id")
        .withColumn("keep", F.col(key_col) == F.col("best_key"))
        .drop("best_key")
    )


def simhash64(col: Column | str, shingle_n: int = 2, hash_fn=None) -> Column:
    """64-bit SimHash over word shingles — pure native bit arithmetic:
    per-shingle hash, sum of per-bit +/-1 votes via explode-free
    aggregate over the shingle array. ``hash_fn`` defaults to xxhash64;
    hashing.poly_hash61 makes the signature DuckDB-replicable (its bits
    61-63 are then constant-zero — see hashing.py)."""
    hash_fn = hash_fn or F.xxhash64
    grams = word_shingles(col, shingle_n)
    hashes = F.transform(grams, lambda g: hash_fn(g))
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


def simhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 2,
    hash_fn=None,
) -> DataFrame:
    """(key, sig): SimHash signatures computed scale-properly — shingles
    exploded to rows (tokenizer + hash run once per shingle), 64 bit votes
    summed in one vectorized hash aggregate, signature assembled from the
    votes. Value-identical to simhash64 (pytest-pinned)."""
    hash_fn = hash_fn or F.xxhash64
    toked = df.select(F.col(key_col).alias("key"), tokens(text_col).alias("__toks"))
    ex = toked.select(
        "key", F.explode(word_shingles_of(F.col("__toks"), shingle_n)).alias("shingle")
    )
    hx = ex.select("key", hash_fn(F.col("shingle")).alias("h"))
    votes = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))) != 0, 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = hx.groupBy("key").agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return agg.select("key", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    hash_fn=None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup candidates by SimHash banding (4 bands of 16 bits: any pair
    within hamming distance 3 shares ≥1 exact band), verified by true
    hamming distance ≤ max_hamming.

    Empty/whitespace/NULL docs are NOT dropped: the shingle fallback gives
    them the '' shingle, so they all share one signature and pair with each
    other at hamming 0 (value-identical to the array-aggregate simhash64
    path; pytest-pinned).

    SCALE BOUND: the hamming≤3 pigeonhole forces exactly 4 bands over 64
    bits, capping the keyspace at 2^16 buckets/band — at ~10^7+ docs the
    AVERAGE bucket exceeds 10^2 rows and candidate volume grows as
    n²/2^16, so this variant is for corpora ≤ ~10^7 docs. Beyond that use
    minhash_lsh_pairs (unbounded band keyspace) or a Manku-style permuted
    multi-table scheme. ``max_bucket_size`` (default 10^4) bounds any
    single bucket's contribution regardless; ``stats_out`` surfaces the
    top buckets (buckets.cap_band_buckets)."""
    # Signatures via explode + ONE vectorized hash aggregate (the
    # array-aggregate simhash64 evaluates its captured shingle-hash array
    # once per bit in interpreted HOF mode — see simhash_signature_table).
    # Band fan-out is an explode above the signature, so the Generate bars
    # projection collapse and the signature is never re-evaluated per band.
    sh = simhash_signature_table(df, text_col, key_col, shingle_n, hash_fn)
    banded = sh.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(3)))).withColumn(
        "band_key",
        F.expr("shiftrightunsigned(sig, band * 16)").bitwiseAND(F.lit(0xFFFF)),
    )
    banded = cap_band_buckets(banded, max_bucket_size, stats_out=stats_out, label="simhash")
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


def simhash_pairs_manku(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    hash_fn=None,
    n_blocks: int | None = None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via Manku-style block-combination tables —
    the ≥10^7-doc replacement for the 4×16-bit banding in simhash_pairs
    (Manku, Jain & Das Sarma, WWW'07 §3: near-duplicate detection for web
    crawling; re-derived here, no code consulted).

    The 64-bit signature splits into B = max_hamming+3 blocks; a pair
    within hamming distance k=max_hamming differs in at most k blocks, so
    it AGREES on some (B-k)-block combination — one table per combination
    (C(B,k) tables; B=6,k=3 → 20 tables) keyed on the concatenated bits of
    its B-k blocks (~64·(B-k)/B ≈ 32 bits). Same exact-recall guarantee as
    banding, but the band keyspace grows from 2^16 to ~2^32 buckets: at
    10^9 docs the average bucket falls from ~15k rows (10^12 candidate
    pairs/band) to <1 row. Shuffle cost is 20 signature rows/doc instead
    of 4 — linear, and the price of staying subquadratic.

    Output is VALUE-IDENTICAL to simhash_pairs (both blockers are exact
    for hamming ≤ k and verification computes true hamming) — pinned by
    pytest and by sharing simhash_pairs' DuckDB gate oracle."""
    from itertools import combinations

    if max_hamming < 1:
        raise ValueError("max_hamming must be >= 1")
    b_total = n_blocks or (max_hamming + 3)
    if b_total <= max_hamming:
        raise ValueError(f"n_blocks ({b_total}) must exceed max_hamming ({max_hamming})")
    sizes = [64 // b_total + (1 if i < 64 % b_total else 0) for i in range(b_total)]
    offsets = [sum(sizes[:i]) for i in range(b_total)]

    def block(i: int) -> Column:
        return F.expr(f"shiftrightunsigned(sig, {offsets[i]})").bitwiseAND(
            F.lit((1 << sizes[i]) - 1)
        )

    tables = list(combinations(range(b_total), b_total - max_hamming))
    structs = []
    for t, combo in enumerate(tables):
        key = F.lit(0).cast("long")
        shift = 0
        for i in combo:
            key = key.bitwiseOR(F.shiftleft(block(i), shift))
            shift += sizes[i]
        structs.append(F.struct(F.lit(t).alias("band"), key.alias("band_key")))

    sh = simhash_signature_table(df, text_col, key_col, shingle_n, hash_fn)
    banded = sh.select(
        "key", "sig", F.explode(F.array(*structs)).alias("s")
    ).select("key", "sig", "s.band", "s.band_key")
    banded = cap_band_buckets(banded, max_bucket_size, stats_out=stats_out, label="simhash_manku")
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


def hamming_pairs(
    df: DataFrame,
    hash_col: str = "ahash",
    key_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """(key_a, key_b, hamming): near-identical pairs among PRECOMPUTED
    64-bit hashes (perceptual image hashes from multimodal.media_ahash,
    or any 64-bit signature) — the banding/verify half of simhash_pairs
    factored out for hash-valued inputs. Pigeonhole: 4 exact 16-bit
    bands catch every pair within hamming <= 3; candidates verify with
    a native ``bit_count(a XOR b)``. Buckets cap at ``max_bucket_size``
    with counted-drop telemetry (the banded-join doctrine)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(f"max_hamming must be in [0, 3], got {max_hamming}")
    h = df.select(F.col(key_col).alias("key"), F.col(hash_col).alias("sig")).where(
        F.col(hash_col).isNotNull()
    )
    bands = None
    for b in range(4):
        part = h.select(
            "key",
            "sig",
            F.lit(b).alias("band"),
            F.expr(f"CAST((sig >> {16 * b}) & 65535 AS INT)").alias("band_key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    bands = cap_band_buckets(
        bands, max_bucket_size, stats_out=stats_out, label="hamming"
    )
    a = bands.select(
        F.col("key").alias("key_a"), F.col("sig").alias("sig_a"), "band", "band_key"
    )
    b2 = bands.select(
        F.col("key").alias("key_b"), F.col("sig").alias("sig_b"), "band", "band_key"
    )
    cand = (
        a.join(b2, ["band", "band_key"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.select(
        "key_a",
        "key_b",
        F.expr("CAST(bit_count(sig_a ^ sig_b) AS INT)").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
