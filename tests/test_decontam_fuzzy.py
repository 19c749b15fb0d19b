"""Fuzzy (MinHash) decontamination: verbatim and near-paraphrase eval
overlap detection, threshold behavior, tie-break determinism, and
partitioning invariance."""

from pyspark.sql import functions as F

from prase_spark.datapipe.decontam import decontaminate, decontaminate_fuzzy

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "pyspark shuffles hash partitions across executors while catalyst optimizes plans",
    "benchmark questions often leak into crawled training corpora verbatim or lightly edited",
    "entity alignment propagates equivalence probabilities through shared relations iteratively",
    "tokenizers learn merges from word frequency tables collapsed in one corpus pass",
    "completely unrelated text about cooking pasta with garlic olive oil and fresh basil leaves",
]


def _train(spark, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(BASE)], "doc_id LONG, text STRING"
    ).repartition(parts)


def _run(spark, eval_rows, parts=4, **kw):
    ev = spark.createDataFrame(eval_rows, "doc_id LONG, text STRING")
    out = decontaminate_fuzzy(_train(spark, parts), ev, **kw)
    return {r["key"]: (r["contaminated_by"], r["est_pct"]) for r in out.collect()}


def test_verbatim_eval_copy_flags_at_100(spark):
    got = _run(spark, [(900, BASE[2])])
    assert got[2] == (900, 100)
    assert all(v == (None, 0) for k, v in got.items() if k != 2)
    assert len(got) == len(BASE)  # every train row present


def test_near_paraphrase_flags_where_exact_may_not(spark):
    # one word swapped mid-sentence: high shingle Jaccard, not verbatim
    edited = BASE[2].replace("crawled", "scraped")
    got = _run(spark, [(901, edited)], threshold_pct=50)
    by, est = got[2]
    assert by == 901 and 50 <= est < 100


def test_threshold_suppresses_weak_overlap(spark):
    edited = BASE[2].replace("crawled", "scraped")
    est = _run(spark, [(901, edited)], threshold_pct=50)[2][1]
    got = _run(spark, [(901, edited)], threshold_pct=est + 1)
    assert got[2] == (None, 0)


def test_tie_break_min_eval_key(spark):
    # two identical eval docs -> both est 100; min eval key wins
    got = _run(spark, [(905, BASE[4]), (903, BASE[4])])
    assert got[4] == (903, 100)


def test_partitioning_invariance(spark):
    rows = [(900, BASE[2]), (901, BASE[0].replace("today", "tonight"))]
    assert _run(spark, rows, parts=1) == _run(spark, rows, parts=11)


def test_complements_exact_decontaminate(spark):
    # same verbatim leak is caught by BOTH passes (sanity of composition)
    ev = spark.createDataFrame([(900, BASE[2])], "doc_id LONG, text STRING")
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(_train(spark), ev, n=8).collect()
    }
    fuzzy = _run(spark, [(900, BASE[2])])
    assert exact[2] and fuzzy[2][1] == 100
