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


def streaming_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation pattern over an event stream (late data handled
    by watermark) — the standard stateful-op shape for pipeline metrics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("events"), F.sum("value").alias("value_sum"))
    )
