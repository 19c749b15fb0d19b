"""Incremental dedup: new-batch probe against corpus stores."""

from __future__ import annotations

import pytest

from prase_spark.datapipe.incremental import (
    hash_store,
    incremental_exact,
    incremental_minhash,
    minhash_store,
)

BASE = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "spark shuffles partition data across executors during wide transformations "
        "while the scheduler assigns tasks to cores and the memory manager spills "
        "sorted runs to local disk whenever the execution region fills up under "
        "pressure from large aggregation hash tables in the pipeline"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # in-corpus dup of 0
    (3, "completely different content about knowledge graph entity alignment"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(BASE, "doc_id LONG, text STRING")


def test_incremental_exact_min_key_canonical(spark, corpus):
    new = spark.createDataFrame(
        [
            (100, BASE[0][1]),  # verbatim copy of docs 0 AND 2 -> dup_of 0 (min key)
            (101, "a genuinely novel document no corpus member has seen"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["key"]: r["dup_of"]
        for r in incremental_exact(new, hash_store(corpus)).collect()
    }
    assert got == {100: 0, 101: None}


def test_incremental_minhash_flags_verbatim_near_and_novel(spark, corpus):
    near = BASE[1][1].replace("executors", "workers")  # one token changed
    new = spark.createDataFrame(
        [
            (100, BASE[0][1]),  # verbatim -> est 100, dup_of 0 (min key over {0,2})
            (101, near),        # near-dup of 1
            (102, "unrelated sentences about bloom filters and inverted indexes"),
        ],
        "doc_id LONG, text STRING",
    )
    store = minhash_store(corpus)
    got = {
        r["key"]: (r["dup_of"], r["est_pct"])
        for r in incremental_minhash(new, store, threshold_pct=50).collect()
    }
    assert got[100] == (0, 100)
    assert got[101][0] == 1 and got[101][1] >= 50
    assert got[102] == (None, 0)


def test_incremental_minhash_threshold_and_determinism(spark, corpus):
    new = spark.createDataFrame([(100, BASE[0][1])], "doc_id LONG, text STRING")
    store = minhash_store(corpus)
    # absurd threshold -> nothing flagged, but the row still comes back
    got = incremental_minhash(new, store, threshold_pct=101).collect()
    assert len(got) == 1 and got[0]["dup_of"] is None
    # repartitioned store -> identical output
    a = sorted(map(tuple, incremental_minhash(new, store, threshold_pct=50).collect()))
    b = sorted(
        map(tuple, incremental_minhash(new, store.repartition(13), threshold_pct=50).collect())
    )
    assert a == b


def test_store_probe_agrees_with_full_selfjoin_candidates(spark, corpus):
    """Cross candidates from the incremental probe == the (corpus, new)
    pairs the full self-join LSH would generate on corpus ∪ new — the
    store loses nothing vs re-running dedup from scratch."""
    import pyspark.sql.functions as F

    from prase_spark.datapipe.dedup import minhash_lsh_pairs

    new = spark.createDataFrame(
        [(100, BASE[0][1]), (101, BASE[1][1].replace("executors", "workers"))],
        "doc_id LONG, text STRING",
    )
    both = corpus.unionByName(new)
    full = {
        (r["key_a"], r["key_b"])
        for r in minhash_lsh_pairs(both).collect()
        if r["key_b"] >= 100 and r["key_a"] < 100  # cross pairs only
    }
    inc = {
        (r["dup_of"], r["key"])
        for r in incremental_minhash(new, minhash_store(corpus), threshold_pct=0)
        .filter(F.col("dup_of").isNotNull())
        .collect()
        # threshold 0 keeps every candidate; dup_of is the argmax
    }
    # every full-dedup cross pair's new-doc must surface in the incremental
    # result with SOME corpus counterpart
    assert {b for _, b in full} <= {b for _, b in inc}


def test_incremental_minhash_string_keys_tiebreak(spark):
    """ADVICE r4: the tie-break used -corpus_key inside max_by, which casts
    string keys (URLs) to NULL and silently breaks the documented
    'ties -> min corpus key' determinism. min_by over (-est_pct, key)
    works for any orderable key type."""
    text = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while the weary traveler watches from the old bridge")
    corpus = spark.createDataFrame(
        [("https://b.example/page", text), ("https://a.example/page", text)],
        "doc_id STRING, text STRING",
    )
    new = spark.createDataFrame([("https://z.example/copy", text)],
                                "doc_id STRING, text STRING")
    got = incremental_minhash(new, minhash_store(corpus), threshold_pct=50).collect()
    assert len(got) == 1
    # both corpus members tie at est 100 -> the MIN key wins, deterministically
    assert got[0]["dup_of"] == "https://a.example/page"
    assert got[0]["est_pct"] == 100
