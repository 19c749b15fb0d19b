"""Structured Streaming ingest: streamed extraction == batch extraction."""

from prase_spark.extract import extract_triples
from prase_spark.fixtures import pages_fixture
from prase_spark.streaming import run_extraction_stream, streaming_event_counts


def test_stream_extraction_matches_batch(spark, tmp_path):
    pages, _ = pages_fixture(spark, n_pages=30)
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.write.parquet(src)

    q = run_extraction_stream(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {tuple(r) for r in extract_triples(pages).collect()}
    assert streamed == batch

    # incremental restart: nothing new -> no duplicate output (exactly-once)
    q2 = run_extraction_stream(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == batch


def test_streaming_event_counts_shape(spark):
    # windowed-agg plan compiles against a static frame (same expressions
    # run under a stream with watermark state)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = streaming_event_counts(ev).collect()
    assert len(out) > 0
    cols = set(streaming_event_counts(ev).columns)
    assert cols == {"window", "event_type", "events", "value_sum"}
