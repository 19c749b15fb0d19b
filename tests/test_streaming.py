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


def test_streaming_windowed_counts_watermark(spark, tmp_path):
    """streaming_event_counts as a REAL stream: append-mode windows
    finalize only once the (checkpoint-persisted) watermark passes, and
    data later than the watermark is DROPPED, never re-opening an emitted
    window."""
    import datetime as dt

    from pyspark.sql import functions as F

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = streaming_event_counts(stream, window="1 hour", watermark="2 hours")
        flat = agg.select(
            F.col("window.start").alias("ws"), "event_type", "events", "value_sum"
        )
        q = (
            flat.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def t(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    def emitted():
        try:
            return {
                (r["ws"].hour, r["event_type"]): (r["events"], r["value_sum"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return {}

    write([(t(10, 0), "a", 1.0), (t(10, 30), "a", 2.0), (t(11, 15), "b", 5.0)])
    run()  # watermark advances to 9:15 — nothing finalized yet
    assert emitted() == {}

    write([(t(14, 0), "b", 1.0)])
    run()  # watermark -> 12:00: the 10:00 and 11:00 windows finalize
    assert emitted() == {(10, "a"): (2, 3.0), (11, "b"): (1, 5.0)}

    # LATE: 10:20 is behind the persisted 12:00 watermark -> dropped; the
    # already-emitted 10:00 window must not change or re-emit
    write([(t(10, 20), "a", 100.0)])
    run()
    assert emitted() == {(10, "a"): (2, 3.0), (11, "b"): (1, 5.0)}


def test_stream_first_seen_cross_batch_dedup(spark, tmp_path):
    """applyInPandasWithState operator: a key emitted in an earlier
    micro-batch (or earlier run — state restored from checkpoint) is
    suppressed forever."""
    from prase_spark.streaming import stream_first_seen, stream_pages

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    pages1, _ = pages_fixture(spark, n_pages=10)
    pages1.write.parquet(src)  # urls page/0..9
    pages2, _ = pages_fixture(spark, n_pages=20)
    pages2.filter("url like '%page/1_'").write.mode("append").parquet(src)  # 10..19 new
    pages1.limit(5).write.mode("append").parquet(src)  # re-crawl dups of 0..9

    def run():
        stream = stream_pages(spark, src, max_files_per_trigger=1)
        deduped = stream_first_seen(stream.select("url", "text"), key_col="url")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.select("url").distinct().count() == 20

    # restart with ONLY duplicate urls landing: state survives the restart,
    # nothing new is emitted
    pages1.limit(7).write.mode("append").parquet(src)
    run()
    assert spark.read.parquet(out).count() == 20


def test_incremental_dedup_stream_two_waves(spark, tmp_path):
    """Wave 1: two in-batch near-dups -> one representative admitted and
    its signature stored. Wave 2: a verbatim re-crawl of wave 1's text is
    rejected against the STORE; a novel doc is admitted. Replaying the
    drained stream changes nothing (idempotent)."""
    from prase_spark.streaming import run_incremental_dedup_stream

    long_a = (
        "spark shuffles partition data across executors during wide "
        "transformations while the scheduler assigns tasks to cores and the "
        "memory manager spills sorted runs to local disk under pressure"
    )
    src = str(tmp_path / "docs")
    out = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    wave1 = spark.createDataFrame(
        [(10, long_a), (11, long_a.replace("cores", "slots"))],  # near-dups
        "doc_id LONG, text STRING",
    )
    wave1.write.parquet(src)
    q = run_incremental_dedup_stream(spark, src, out, store, ckpt, threshold=0.5)
    q.awaitTermination(180)
    admitted = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert admitted == {10}  # min-key representative of the in-batch pair
    assert spark.read.parquet(store).count() == 1  # one signature row

    wave2 = spark.createDataFrame(
        [(20, long_a), (21, "a completely novel document about inverted indexes")],
        "doc_id LONG, text STRING",
    )
    wave2.write.mode("append").parquet(src)
    q2 = run_incremental_dedup_stream(spark, src, out, store, ckpt, threshold=0.5)
    q2.awaitTermination(180)
    admitted = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert admitted == {10, 21}  # 20 rejected against the store
    assert spark.read.parquet(store).count() == 2

    # drained replay: no new batches, nothing changes
    q3 = run_incremental_dedup_stream(spark, src, out, store, ckpt, threshold=0.5)
    q3.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {10, 21}


def test_incremental_dedup_stream_midbatch_failure_replay(spark, tmp_path):
    """Crash-replay semantics (ADVICE r4): if an attempt of batch N wrote
    store/batch=N but died BEFORE the checkpoint commit, the replayed
    attempt must NOT probe against its own half-written signatures — that
    would 100%-self-match every representative and silently drop the whole
    batch. Simulated by pre-planting wave 2's own signatures under
    store/batch=1 before the batch-1 replay runs."""
    from prase_spark.datapipe.incremental import minhash_store
    from prase_spark.streaming import run_incremental_dedup_stream

    long_a = (
        "spark shuffles partition data across executors during wide "
        "transformations while the scheduler assigns tasks to cores and the "
        "memory manager spills sorted runs to local disk under pressure"
    )
    novel_b = (
        "a completely novel document about inverted indexes and bloom "
        "filters that shares no shingles with the first crawl wave at all"
    )
    src = str(tmp_path / "docs")
    out = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    wave1 = spark.createDataFrame([(10, long_a)], "doc_id LONG, text STRING")
    wave1.write.parquet(src)
    q = run_incremental_dedup_stream(spark, src, out, store, ckpt, threshold=0.5)
    q.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {10}

    # simulate the failed first attempt of batch 1: its store write landed,
    # the checkpoint commit did not
    wave2 = spark.createDataFrame([(21, novel_b)], "doc_id LONG, text STRING")
    minhash_store(wave2).write.mode("overwrite").parquet(f"{store}/batch=1")
    # out/batch=1 may or may not have landed before the crash; plant it too
    # (the replay must overwrite, not double-append)
    wave2.write.mode("overwrite").parquet(f"{out}/batch=1")

    wave2.write.mode("append").parquet(src)
    q2 = run_incremental_dedup_stream(spark, src, out, store, ckpt, threshold=0.5)
    q2.awaitTermination(180)
    # the batch's doc survives the replay: it must NOT match its own
    # pre-crash signature, and it is genuinely novel vs batch 0's store
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {10, 21}
    assert spark.read.parquet(store).count() == 2


def _cc_state(spark, state):
    from prase_spark.streaming import read_cc_state

    return {
        (r["node"], r["component"]) for r in read_cc_state(spark, state).collect()
    }


def test_incremental_cc_stream_two_waves(spark, tmp_path):
    """Wave 1 builds {1,2,3} + {10,11}; wave 2's single edge (3,10) must
    merge the two components transitively and introduce a new node 20 —
    with the state store only ever holding O(touched) delta rows per
    batch, reconstructed last-writer-wins by read_cc_state."""
    from prase_spark.streaming import run_incremental_cc_stream

    src = str(tmp_path / "edges")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    wave1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src LONG, dst LONG"
    )
    wave1.write.parquet(src)
    metrics: dict = {}
    q = run_incremental_cc_stream(spark, src, state, ckpt, metrics_out=metrics)
    q.awaitTermination(180)
    assert _cc_state(spark, state) == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    wave2 = spark.createDataFrame([(3, 10), (20, 20)], "src LONG, dst LONG")
    wave2.write.mode("append").parquet(src)
    metrics2: dict = {}
    q2 = run_incremental_cc_stream(spark, src, state, ckpt, metrics_out=metrics2)
    q2.awaitTermination(180)
    assert _cc_state(spark, state) == {
        (1, 1), (2, 1), (3, 1), (10, 1), (11, 1), (20, 20)
    }
    # the batch-1 delta is O(touched): relabelled 10,11 + new node 20 —
    # NOT a rewrite of the full 6-row mapping
    (bid,) = metrics2.keys()
    assert metrics2[bid]["delta_rows"] == 3
    assert metrics2[bid]["touched_components"] == 1  # comp 10 -> 1

    # drained replay: no new batches, state unchanged
    q3 = run_incremental_cc_stream(spark, src, state, ckpt)
    q3.awaitTermination(180)
    assert _cc_state(spark, state) == {
        (1, 1), (2, 1), (3, 1), (10, 1), (11, 1), (20, 20)
    }


def test_incremental_cc_stream_midbatch_failure_replay(spark, tmp_path):
    """Crash-replay semantics: an attempt of batch 1 wrote its delta but
    died before the checkpoint commit. The replay must NOT read its own
    half-written delta as prior state (that would make the merge a no-op
    relabel against already-merged labels); it must recompute from
    batch-0 state only and overwrite. Simulated by planting a WRONG delta
    under delta/batch=1 before the replay runs."""
    from prase_spark.streaming import run_incremental_cc_stream

    src = str(tmp_path / "edges")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, 2), (10, 11)], "src LONG, dst LONG").write.parquet(src)
    q = run_incremental_cc_stream(spark, src, state, ckpt)
    q.awaitTermination(180)
    assert _cc_state(spark, state) == {(1, 1), (2, 1), (10, 10), (11, 10)}

    # failed first attempt of batch 1: a bogus delta landed (wrong labels)
    spark.createDataFrame(
        [(10, 99), (11, 99)], "node LONG, component LONG"
    ).write.mode("overwrite").parquet(f"{state}/delta/batch=1")

    wave2 = spark.createDataFrame([(2, 10)], "src LONG, dst LONG")
    wave2.write.mode("append").parquet(src)
    q2 = run_incremental_cc_stream(spark, src, state, ckpt)
    q2.awaitTermination(180)
    # replay overwrote the bogus partition; labels are the true merge
    assert _cc_state(spark, state) == {(1, 1), (2, 1), (10, 1), (11, 1)}


def test_compact_cc_state(spark, tmp_path):
    """Compaction folds the delta log into a fresh single-batch state dir
    whose read_cc_state output is identical to the uncompacted read."""
    from prase_spark.streaming import compact_cc_state, run_incremental_cc_stream

    src = str(tmp_path / "edges")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, 2), (10, 11)], "src LONG, dst LONG").write.parquet(src)
    run_incremental_cc_stream(spark, src, state, ckpt).awaitTermination(180)
    spark.createDataFrame([(2, 10)], "src LONG, dst LONG").write.mode(
        "append"
    ).parquet(src)
    run_incremental_cc_stream(spark, src, state, ckpt).awaitTermination(180)

    before = _cc_state(spark, state)
    compacted = str(tmp_path / "state2")
    n = compact_cc_state(spark, state, compacted)
    assert n == len(before)
    assert _cc_state(spark, compacted) == before
