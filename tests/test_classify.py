"""Hashed-feature linear quality classifier (datapipe.classify):
training-free NB-style weights against a pure Python oracle, the
broadcast scorer's integer surface + plan shape, and distributed-GD
logistic training separating a planted fixture."""

import re

import pytest
from pyspark.sql import functions as F

from prase_spark.datapipe.classify import (
    classifier_score,
    nb_log_odds_weights,
    train_logistic_weights,
)
from prase_spark.datapipe.dsir import bucket_model

DOCS = [
    (1, "good prose reads well and flows nicely", "en"),
    (2, "more good prose with varied words here", "en"),
    (3, "buy cheap pills buy cheap pills buy", "xx"),
    (4, "zzqx qqzv xvzq zzqx", "xx"),
    (5, "", "en"),
    (6, None, "xx"),
]

M = 97


def _toks(text):
    if text is None:
        return []
    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


def _grams(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _py_oracle(spark, docs):
    """NB weights + scores with the SAME hash as the Spark side (xxhash64
    has no pure-Python twin, so the oracle pulls bucket ids from a tiny
    Spark job and does all remaining arithmetic in Python)."""
    from prase_spark.datapipe.dsir import hashed_grams

    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = hashed_grams(d, n_buckets=M).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["key"], []).append(r["bucket"])
    tcnt, rcnt = {}, {}
    lang = {k: l for k, _, l in docs}
    for k, bs in by_doc.items():
        for b in bs:
            rcnt[b] = rcnt.get(b, 0) + 1
            if lang[k] == "en":
                tcnt[b] = tcnt.get(b, 0) + 1
    T = sum(tcnt.values())
    R = sum(rcnt.values())
    w = {
        b: (1_000_000 * tcnt.get(b, 0) * R) // (max(rc, 1) * T) - 1_000_000
        for b, rc in rcnt.items()
    }
    scores = {}
    for k, _, _ in docs:
        bs = by_doc.get(k, [])
        logit = sum(w.get(b, 0) for b in bs)
        scores[k] = (len(bs), logit, 1 if logit > 0 else 0)
    return w, scores


def test_nb_weights_and_scorer_match_python_oracle(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    tm = bucket_model(d.filter(F.col("lang") == "en"), n_buckets=M)
    rm = bucket_model(d, n_buckets=M)
    w = nb_log_odds_weights(tm, rm)
    exp_w, exp_scores = _py_oracle(spark, DOCS)
    got_w = {r["bucket"]: r["w_e6"] for r in w.collect()}
    assert got_w == exp_w
    out = {r["key"]: r for r in classifier_score(d, w, n_buckets=M).collect()}
    assert set(out) == set(exp_scores)
    for k, (n, logit, keep) in exp_scores.items():
        r = out[k]
        assert (r["n_grams"], r["logit_e6"], r["keep_flag"]) == (n, logit, keep), k
    # the en prose actually separates from the spam/soup on this fixture
    assert out[1]["keep_flag"] == 1 and out[3]["keep_flag"] == 0


def test_scorer_bias_shifts_threshold_and_empty_docs_kept(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    tm = bucket_model(d.filter(F.col("lang") == "en"), n_buckets=M)
    w = nb_log_odds_weights(tm, bucket_model(d, n_buckets=M))
    out = {
        r["key"]: r
        for r in classifier_score(d, w, n_buckets=M, bias_e6=10**12).collect()
    }
    assert len(out) == len(DOCS)  # 0-gram docs (5, 6) restored
    assert out[5]["n_grams"] == 0 and out[5]["logit_e6"] == 10**12
    assert all(r["keep_flag"] == 1 for r in out.values())  # bias dominates


def test_scorer_plan_broadcast_no_corpus_shuffle_before_agg(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    tm = bucket_model(d.filter(F.col("lang") == "en"), n_buckets=M)
    w = nb_log_odds_weights(tm, bucket_model(d, n_buckets=M))
    plan = (
        classifier_score(d, w, n_buckets=M)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_logistic_training_separates_planted_classes(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "quality prose sentence number %d flows" % i, 1))
        else:
            rows.append((i, "spam spam buy pills spam %d buy" % i, 0))
    d = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_logistic_weights(
        d, "label", n_buckets=M, iterations=15, lr=1.0
    )
    w_int, bias_e6 = model.as_integer_weights()
    out = {
        r["key"]: r
        for r in classifier_score(d, w_int, n_buckets=M, bias_e6=bias_e6).collect()
    }
    pos = [out[i]["logit_e6"] for i in range(0, 40, 2)]
    neg = [out[i]["logit_e6"] for i in range(1, 40, 2)]
    assert min(pos) > max(neg)  # perfect margin on the planted fixture
    assert all(out[i]["keep_flag"] == 1 for i in range(0, 40, 2))
    assert all(out[i]["keep_flag"] == 0 for i in range(1, 40, 2))


def test_training_input_validation(spark):
    d = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty input"):
        train_logistic_weights(d, "label", n_buckets=M, iterations=1)
    d2 = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="iterations"):
        train_logistic_weights(d2, "label", n_buckets=M, iterations=0)
