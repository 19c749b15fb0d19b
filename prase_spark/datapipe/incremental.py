"""Incremental deduplication: screen a NEW crawl batch against an
EXISTING corpus without re-clustering the corpus.

The production shape at 100 TB: the corpus is petabytes and already
deduplicated; each day delivers a new batch that must be checked against
it. Re-running the full self-join dedup is O(corpus) per day — instead
the corpus is distilled ONCE into compact per-document stores (a 64-bit
text hash per doc for exact dedup; a wide MinHash signature row per doc
for near-dup), and each batch probes those. Batch-side cost is
O(batch); corpus-side cost is one scan of the store (no shuffle of the
corpus — the batch side is broadcast into the band join).

Store formats (persist these as tables, append kept batch rows daily):
- exact:  (key, text_hash)            — hash_store()
- near:   (key, m0..m{H-1})           — dedup.minhash_wide_signatures
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets
from prase_spark.datapipe.dedup import (
    band_keys_of_wide,
    minhash_wide_signatures,
    shingle_table,
)


def hash_store(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """(key, text_hash): the exact-dedup corpus store — one 8-byte hash
    per document."""
    hash_fn = hash_fn or F.xxhash64
    return docs.select(
        F.col(key_col).alias("key"), hash_fn(F.col(text_col)).alias("text_hash")
    )


def minhash_store(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    seed: int = 42,
    shingle_n: int = 3,
    hash_fn=None,
) -> DataFrame:
    """Wide MinHash signature store (key, m0..m{num_hashes-1}) for the
    corpus — one row per document, ~8*num_hashes bytes each; banding for
    the probe join is a projection of this table, so the corpus text is
    never re-read."""
    sh = shingle_table(docs, text_col, key_col, shingle_n)
    return minhash_wide_signatures(sh, num_hashes, seed, hash_fn)


def incremental_exact(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """(key, dup_of): for each new doc, the min-key corpus doc with the
    same text hash (NULL = novel). One broadcast-able aggregation of the
    store per distinct hash + one join — the corpus text never moves."""
    hash_fn = hash_fn or F.xxhash64
    canon = store.groupBy("text_hash").agg(F.min("key").alias("dup_of"))
    return (
        new_docs.select(
            F.col(key_col).alias("key"), hash_fn(F.col(text_col)).alias("text_hash")
        )
        .join(canon, "text_hash", "left")
        .select("key", "dup_of")
    )


def incremental_minhash(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    threshold_pct: int = 50,
    hash_fn=None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """(key, dup_of, est_pct) for every NEW doc: ``dup_of`` = the corpus
    document (from a :func:`minhash_store` built with the SAME
    num_hashes/seed/shingle_n/hash_fn) whose signature-estimated Jaccard
    is highest (ties -> min corpus key), NULL when no corpus doc reaches
    ``threshold_pct``. ``est_pct = (100 * matching_slots) DIV num_hashes``
    — an exact integer in both engines, so the whole operator is
    value-gateable.

    Plan shape: batch signatures are computed batch-side only; the band
    join BROADCASTS the (small) batch band table against the corpus
    store's projected bands — the corpus never shuffles. The estimate
    join touches only candidate pairs. Corpus-side degenerate buckets
    (e.g. a boilerplate signature shared by millions of stored docs) are
    capped with the standard bucket guard + telemetry."""
    new_sh = shingle_table(new_docs, text_col, key_col, shingle_n)
    new_sigs = minhash_wide_signatures(new_sh, num_hashes, seed, hash_fn).persist()
    new_bands = band_keys_of_wide(new_sigs, num_hashes, bands)

    store_bands = cap_band_buckets(
        band_keys_of_wide(store, num_hashes, bands),
        max_bucket_size,
        stats_out=stats_out,
        label="incremental_minhash",
    )
    cand = (
        F.broadcast(new_bands.select(F.col("key").alias("new_key"), "band", "band_key"))
        .join(store_bands.select(F.col("key").alias("corpus_key"), "band", "band_key"),
              ["band", "band_key"])
        .select("new_key", "corpus_key")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"n.m{h}") == F.col(f"c.m{h}"), 1).otherwise(0)
        for h in range(num_hashes)
    )
    est = (
        cand.join(new_sigs.alias("n"), F.col("new_key") == F.col("n.key"))
        .join(store.alias("c"), F.col("corpus_key") == F.col("c.key"))
        .select(
            "new_key",
            "corpus_key",
            matches.alias("__matches"),
        )
        .selectExpr(
            "new_key",
            "corpus_key",
            f"CAST(100 * __matches AS BIGINT) DIV {num_hashes} AS est_pct",
        )
        .filter(F.col("est_pct") >= threshold_pct)
    )
    best = est.groupBy("new_key").agg(
        F.min_by(
            F.struct("corpus_key", "est_pct"),
            # highest estimate wins; ties -> min corpus key. min_by over
            # (-est_pct, corpus_key) keeps the tie-break valid for ANY
            # orderable key type — negating a string corpus_key (the old
            # max_by formulation) silently cast to NULL, breaking the
            # documented determinism for URL/string doc ids.
            F.struct((-F.col("est_pct")).alias("neg_est"), F.col("corpus_key")),
        ).alias("b")
    )
    out = (
        new_docs.select(F.col(key_col).alias("key"))
        .join(best, F.col("key") == F.col("new_key"), "left")
        .select(
            "key",
            F.col("b.corpus_key").alias("dup_of"),
            F.coalesce(F.col("b.est_pct"), F.lit(0).cast("long")).alias("est_pct"),
        )
    )
    return out
