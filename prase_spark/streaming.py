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


def streaming_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation pattern over an event stream (late data handled
    by watermark) — the standard stateful-op shape for pipeline metrics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("events"), F.sum("value").alias("value_sum"))
    )
