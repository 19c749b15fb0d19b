"""Structured Streaming ingest: incremental page -> triple extraction.

The reference is batch-only (test.py:10-55); this is the SURVEY.md §2.7
extension for continuous crawls: ``readStream`` over the page store ->
the same Arrow-batched extractor -> append sink, with exactly-once
bookkeeping from the stream checkpoint. ``Trigger.AvailableNow`` gives
catch-up batch runs over whatever snapshots have landed (the Iceberg
incremental-read pattern); a processing-time trigger gives a live tail.

The extraction function is the SAME pure row-local code as the batch path
(extract.py), so the byte-identical-text-per-url invariant carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prase_spark.extract import extract_triples
from prase_spark.schemas import PAGES


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_extract_triples(pages_stream: DataFrame) -> DataFrame:
    """Streaming DF -> (url, subj, pred, obj, is_attr); stateless map, so
    no watermark is required."""
    return extract_triples(pages_stream)


def run_extraction_stream(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Launch the ingest stream; with ``available_now`` it drains all
    pending files and terminates (incremental batch)."""
    triples = stream_extract_triples(stream_pages(spark, pages_path))
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_first_seen(df: DataFrame, key_col: str = "url") -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): emit
    each key's row only the FIRST time the key is seen over the stream's
    lifetime — cross-micro-batch exact dedup, the streaming twin of
    datapipe.dedup.exact_dedup for continuous crawl ingest (a re-crawled
    url must not re-enter the corpus).

    State per key is a single seen flag (bounded: one tiny state row per
    distinct key, RocksDB/HDFS-backed at cluster scale, restored from the
    stream checkpoint on restart). Within a batch, ties break
    deterministically by the row's full string sort order. Output schema ==
    input schema."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = df.schema
    cols = df.columns

    def dedup(key, pdfs, state: GroupState):
        def sort_rows(pdf):
            return pdf.sort_values(by=cols, key=lambda s: s.astype(str), kind="mergesort")

        if state.exists:
            for _ in pdfs:  # drain the iterator per the API contract
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = sort_rows(pdf).head(1)
            best = cand if best is None else sort_rows(pd.concat([best, cand])).head(1)
        if best is not None:
            state.update((1,))
            yield best

    return df.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen INT",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_dedup_stream(
    spark: SparkSession,
    docs_path: str,
    out_path: str,
    store_path: str,
    checkpoint_path: str,
    threshold: float = 0.8,
    available_now: bool = True,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn=None,
):
    """Continuous near-dup-aware corpus ingest: the streaming twin of
    datapipe.incremental for a crawl that never stops.

    Per micro-batch (foreachBatch):
    1. the batch self-deduplicates (dedup.minhash_dedup — full
       exact-Jaccard verify + connected components WITHIN the batch);
    2. surviving representatives probe the PERSISTED corpus signature
       store (incremental.incremental_minhash — the corpus text is never
       re-read, the store never shuffles; batch bands broadcast);
    3. admitted docs land under ``out_path/batch=<id>`` and their wide
       signatures under ``store_path/batch=<id>`` — a replayed batch
       after failure OVERWRITES its own directories instead of appending
       duplicates, so the sink is idempotent on top of the stream
       checkpoint's exactly-once file progress.

    Threshold semantics: in-batch clusters use exact Jaccard >=
    ``threshold``; cross-batch probing uses the signature ESTIMATE >=
    round(threshold*100)% — the store carries only signatures by design
    (that is what keeps it ~0.5 KB/doc at petabyte corpus scale), and at
    64 hashes the estimator's σ is ~0.06; a borderline miss is re-caught
    by the next offline compaction pass."""
    from prase_spark.datapipe.dedup import minhash_dedup
    from prase_spark.datapipe.incremental import incremental_minhash, minhash_store

    threshold_pct = int(round(threshold * 100))
    schema = spark.read.parquet(docs_path).schema

    def process(batch_df: DataFrame, batch_id: int):
        batch_df = batch_df.persist()
        try:
            sess = batch_df.sparkSession
            clusters = minhash_dedup(
                batch_df, threshold, text_col, key_col,
                num_hashes, bands, shingle_n, seed, hash_fn,
            )
            reps = batch_df.join(
                clusters.filter(F.col("keep")).select(key_col), key_col
            )
            try:
                # Exclude THIS batch's store partition from the probe: on a
                # foreachBatch replay (crash after the store write but before
                # the checkpoint commit), store/batch=<id> already holds this
                # batch's own signatures — probing against them would flag
                # every representative as a 100% self-match and silently drop
                # the whole batch. Filtering on the hive partition column
                # keeps the read partition-pruned (the failed dir is skipped
                # at the scan, not post-filtered).
                store = (
                    sess.read.parquet(store_path)
                    .filter(F.col("batch") != F.lit(int(batch_id)))
                    .drop("batch")
                )
            except Exception:
                store = None  # first batch: no store yet
            if store is not None:
                flags = incremental_minhash(
                    reps, store, text_col, key_col, num_hashes, bands,
                    seed, shingle_n, threshold_pct, hash_fn,
                )
                novel_keys = flags.filter(F.col("dup_of").isNull()).select(
                    F.col("key").alias(key_col)
                )
                novel = reps.join(novel_keys, key_col)
            else:
                novel = reps
            novel = novel.persist()
            novel.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
            minhash_store(
                novel, text_col, key_col, num_hashes, seed, shingle_n, hash_fn
            ).write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")
            novel.unpersist()
        finally:
            batch_df.unpersist()

    writer = (
        spark.readStream.schema(schema)
        .parquet(docs_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cc_state(spark: SparkSession, state_path: str, exclude_batch: int | None = None) -> DataFrame:
    """Reconstruct the current canonical-ID mapping (node, component) from
    a snapshot+delta store written by :func:`run_incremental_cc_stream`.

    Last-writer-wins per node over the hive-partitioned delta log
    (``state_path/delta/batch=<id>``): a node's component is the one from
    the highest batch that touched it — exactly one hash aggregation on
    the node key, no join. ``exclude_batch`` drops one partition at the
    SCAN (partition-pruned, not post-filtered) so a replayed micro-batch
    never reads its own failed attempt's output.
    """
    df = spark.read.parquet(f"{state_path}/delta")
    if exclude_batch is not None:
        df = df.filter(F.col("batch") != F.lit(int(exclude_batch)))
    return df.groupBy("node").agg(
        F.max_by("component", F.col("batch")).alias("component")
    )


def compact_cc_state(spark: SparkSession, state_path: str, target_path: str) -> int:
    """Offline compaction for the delta log: materialize the merged
    mapping into a FRESH state dir (``target_path/delta/batch=0``) the
    caller atomically swaps in. Keeps :func:`read_cc_state`'s per-read
    cost O(live nodes) instead of O(sum of delta rows ever written);
    at 10^12 mentions this runs as a periodic batch job off the hot path.
    Returns the number of live mapping rows written.
    """
    merged = read_cc_state(spark, state_path)
    merged.write.mode("overwrite").parquet(f"{target_path}/delta/batch=0")
    return spark.read.parquet(f"{target_path}/delta/batch=0").count()


def run_incremental_cc_stream(
    spark: SparkSession,
    edges_path: str,
    state_path: str,
    checkpoint_path: str,
    src: str = "src",
    dst: str = "dst",
    available_now: bool = True,
    metrics_out: dict | None = None,
):
    """Continuous canonical-entity-ID maintenance: the streaming twin of
    matching.incremental_components for a sameAs-evidence feed that never
    stops (each PARIS/embedding pass over a fresh crawl slice emits new
    equivalence edges; the canonical mapping must absorb them without a
    full recompute).

    Per micro-batch (foreachBatch):
    1. the current mapping is reconstructed from the delta log
       (:func:`read_cc_state`), EXCLUDING this batch's own partition so a
       replay after a mid-batch crash is idempotent (same doctrine as
       run_incremental_dedup_stream's store probe);
    2. incremental_components merges the batch edges — the mapping only
       streams (broadcast-the-batch joins; the touched-component relabel
       is batch-bounded), never shuffles;
    3. ONLY the delta (relabelled old nodes + brand-new nodes — O(touched),
       not O(corpus)) lands under ``state_path/delta/batch=<id>``,
       mode=overwrite, so the sink is idempotent on top of the stream
       checkpoint's exactly-once file progress. A 10^12-row mapping is
       never rewritten per batch; run :func:`compact_cc_state` off the
       hot path when the log grows.

    ``metrics_out`` (test hook) accumulates per-batch
    ``{batch_id: {"delta_rows": n, "touched_components": m}}`` lineage.
    """
    from prase_spark.matching import incremental_components

    schema = spark.read.parquet(edges_path).schema

    def process(batch_df: DataFrame, batch_id: int):
        sess = batch_df.sparkSession
        try:
            mapping = read_cc_state(sess, state_path, exclude_batch=batch_id)
        except Exception:  # first batch: no delta log yet — empty mapping
            # typed after the edge endpoints (ids may be long OR string)
            mapping = batch_df.select(
                F.col(src).alias("node"), F.col(src).alias("component")
            ).limit(0)
        stats: dict = {}
        _, delta = incremental_components(
            mapping, batch_df, src=src, dst=dst, stats_out=stats, with_delta=True
        )
        delta = delta.persist()
        try:
            delta.write.mode("overwrite").parquet(
                f"{state_path}/delta/batch={batch_id}"
            )
            if metrics_out is not None:
                metrics_out[int(batch_id)] = {
                    "delta_rows": delta.count(),
                    "touched_components": stats.get("touched_components"),
                }
        finally:
            delta.unpersist()

    writer = (
        spark.readStream.schema(schema)
        .parquet(edges_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation pattern over an event stream (late data handled
    by watermark) — the standard stateful-op shape for pipeline metrics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("events"), F.sum("value").alias("value_sum"))
    )
