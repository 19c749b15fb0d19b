"""Unigram-LM quality scoring (datapipe.lmscore): values against a pure
Python oracle, zero-token/OOV edges, vocab determinism, and the plan
shape that makes it crawl-scale (broadcast vocab, no corpus shuffle
before the per-doc aggregate)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from prase_spark.datapipe.lmscore import lm_score, unigram_vocab

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the bone"),
    (3, "zzqx qqzv xvzq"),          # word soup: every token rare/OOV
    (4, ""),                          # zero tokens
    (5, "the the the the"),           # stopword template
    (6, None),                        # NULL text
]


def _toks(text):
    if text is None:
        return []
    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


def _oracle(docs, top_v, alpha):
    counts = {}
    for _, text in docs:
        for t in _toks(text):
            counts[t] = counts.get(t, 0) + 1
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    )
    total, v = sum(vocab.values()), len(vocab)
    denom = total + alpha * (v + 1)
    rows = {}
    for key, text in docs:
        toks = _toks(text)
        n = len(toks)
        oov = sum(1 for t in toks if t not in vocab)
        fs = sum(vocab.get(t, 0) for t in toks)
        ce = (
            -sum(math.log2((vocab.get(t, 0) + alpha) / denom) for t in toks) / n
            if n
            else 0.0
        )
        avg = (2 * fs * 10000 + n) // (2 * n) if n else 0
        rows[key] = (n, oov, fs, avg, ce)
    return vocab, rows


def test_lm_score_values_match_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_vocab(docs, top_v=5)
    got_vocab = {r["term"]: r["cnt"] for r in vocab.collect()}
    exp_vocab, exp_rows = _oracle(DOCS, top_v=5, alpha=1.0)
    assert got_vocab == exp_vocab

    out = {r["key"]: r for r in lm_score(docs, vocab).collect()}
    assert set(out) == {k for k, _ in DOCS}  # every doc kept, incl. 0-token
    for key, (n, oov, fs, avg, ce) in exp_rows.items():
        r = out[key]
        assert (r["n_tokens"], r["oov_cnt"], r["freq_sum"], r["avg_freq_e4"]) == (
            n, oov, fs, avg,
        ), key
        assert r["cross_entropy"] == pytest.approx(ce, rel=1e-12), key
    # the ranking the operator exists for: word soup scores strictly
    # worse (higher entropy) than prose, template text strictly better
    assert out[3]["cross_entropy"] > out[1]["cross_entropy"] > out[5]["cross_entropy"]


def test_cross_corpus_vocab(spark):
    """CCNet setup: vocabulary trained on a trusted corpus, scored corpus
    disjoint — OOV accounting and smoothing still exact."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma alpha")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(9, "alpha delta")], "doc_id long, text string"
    )
    vocab = unigram_vocab(train, top_v=10)
    r = lm_score(score, vocab, alpha=0.5).collect()[0]
    assert (r["n_tokens"], r["oov_cnt"], r["freq_sum"]) == (2, 1, 2)
    # p(alpha)=(2+.5)/(4+.5*4), p(delta)=(0+.5)/(4+.5*4)
    exp = -(math.log2(2.5 / 6.0) + math.log2(0.5 / 6.0)) / 2
    assert r["cross_entropy"] == pytest.approx(exp, rel=1e-12)


def test_plan_broadcast_vocab_no_window(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_vocab(docs, top_v=5)
    vplan = vocab._jdf.queryExecution().executedPlan().toString()
    # top-V must be the distributed top-k, never a 1-partition sort
    assert "TakeOrderedAndProject" in vplan
    assert "Window" not in vplan
    plan = lm_score(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def _bigrams(toks):
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _oracle_bigram(docs, top_v, top_b, alpha, backoff):
    uni, bi = {}, {}
    for _, text in docs:
        ts = _toks(text)
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for g in _bigrams(ts):
            bi[g] = bi.get(g, 0) + 1
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v])
    bigs = dict(sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:top_b])
    denom = sum(vocab.values()) + alpha * (len(vocab) + 1)
    rows = {}
    for key, text in docs:
        ts = _toks(text)
        gs = _bigrams(ts)
        n, seen, fs, ce_sum = len(gs), 0, 0, 0.0
        for g in gs:
            w1, w2 = g.split(" ")
            if g in bigs and w1 in vocab:
                seen += 1
                fs += bigs[g]
                s = bigs[g] / vocab[w1]
            else:
                s = backoff * (vocab.get(w2, 0) + alpha) / denom
            ce_sum += math.log2(s)
        rows[key] = (n, seen, fs, -ce_sum / n if n else 0.0)
    return rows


def test_bigram_stupid_backoff_matches_oracle(spark):
    from prase_spark.datapipe.lmscore import bigram_vocab, lm_score_bigram

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_vocab(docs, top_v=8)
    # small top_b so some real bigrams fall off the model and back off
    bigs = bigram_vocab(docs, top_b=4)
    out = {r["key"]: r for r in lm_score_bigram(docs, vocab, bigs).collect()}
    exp = _oracle_bigram(DOCS, top_v=8, top_b=4, alpha=1.0, backoff=0.4)
    assert set(out) == set(exp)
    backed_off = 0
    for key, (n, seen, fs, ce) in exp.items():
        r = out[key]
        assert (r["n_bigrams"], r["seen_cnt"], r["bigram_freq_sum"]) == (n, seen, fs), key
        assert r["cross_entropy"] == pytest.approx(ce, rel=1e-12), key
        backed_off += n - seen
    assert backed_off > 0  # the truncation really exercised the backoff path
    # word soup still ranks worse than prose under the bigram model
    assert out[3]["cross_entropy"] > out[1]["cross_entropy"]


def test_bigram_plan_all_broadcast(spark):
    from prase_spark.datapipe.lmscore import bigram_vocab, lm_score_bigram

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_vocab(docs, top_v=8)
    bigs = bigram_vocab(docs, top_b=4)
    plan = (
        lm_score_bigram(docs, vocab, bigs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # three model joins, every one a broadcast
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_top_k_prefilter_matches_plain_take_ordered(spark):
    """_top_k_by_count must select EXACTLY the rows a plain
    orderBy(cnt desc, key asc).limit(k) would — including boundary ties
    resolved lexically — for k cutting inside a tie layer, k beyond the
    table, and k = 1."""
    from pyspark.sql import functions as F

    from prase_spark.datapipe.lmscore import _top_k_by_count

    # tie-heavy synthetic counts: many keys share each cnt value
    rows = [(f"t{i:04d}", 1 + (i % 7)) for i in range(500)]
    counts = spark.createDataFrame(rows, "term string, cnt long").repartition(8)
    for k in (1, 40, 137, 499, 500, 900):
        got = sorted(
            (r["term"], r["cnt"]) for r in _top_k_by_count(counts, k, "term").collect()
        )
        exp = sorted(
            (r["term"], r["cnt"])
            for r in counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
            .limit(k)
            .collect()
        )
        assert got == exp, f"k={k}"


# --- hashed fast-path twins -------------------------------------------------


def _hashed_score_rows(spark, docs, top_v, top_b):
    from prase_spark.datapipe.lmscore import (
        bigram_vocab_hashed,
        lm_score_bigram_hashed,
        unigram_vocab_hashed,
    )

    v = unigram_vocab_hashed(docs, top_v=top_v)
    b = bigram_vocab_hashed(docs, top_b=top_b)
    return {r["key"]: r for r in lm_score_bigram_hashed(docs, v, b).collect()}


def test_hashed_twin_full_vocab_matches_string_path(spark):
    """With untruncated models (top_k >= distinct grams, so tie-break
    order is irrelevant) the hashed path must reproduce the string path
    exactly on the integer surfaces and up to float-sum ordering on the
    entropy."""
    from prase_spark.datapipe.lmscore import bigram_vocab, lm_score_bigram

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_vocab(docs, top_v=10_000)
    bigs = bigram_vocab(docs, top_b=10_000)
    exp = {r["key"]: r for r in lm_score_bigram(docs, vocab, bigs).collect()}
    got = _hashed_score_rows(spark, docs, top_v=10_000, top_b=10_000)
    assert set(got) == set(exp)
    for key in exp:
        e, g = exp[key], got[key]
        assert (g["n_bigrams"], g["seen_cnt"], g["bigram_freq_sum"]) == (
            e["n_bigrams"],
            e["seen_cnt"],
            e["bigram_freq_sum"],
        ), key
        assert g["cross_entropy"] == pytest.approx(e["cross_entropy"], rel=1e-12), key


def test_hashed_twin_truncated_distinct_counts(spark):
    """Truncation active, every gram count DISTINCT (so both tie-break
    rules select the identical top-k set): hashed == string with real
    backoff traffic."""
    from prase_spark.datapipe.lmscore import bigram_vocab, lm_score_bigram

    # doc i repeats the bigram "w{i} x{i}" (i+1) times -> bigram counts
    # 1..8 all distinct; unigram counts 1..8 + x-counts also distinct per w
    rows = [(i, " ".join(f"w{i} x{i}" for _ in range(i + 1))) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab_s = unigram_vocab(docs, top_v=9)
    bigs_s = bigram_vocab(docs, top_b=5)  # cuts inside distinct-count layer
    exp = {r["key"]: r for r in lm_score_bigram(docs, vocab_s, bigs_s).collect()}
    got = _hashed_score_rows(spark, docs, top_v=9, top_b=5)
    backed_off = 0
    for key in exp:
        e, g = exp[key], got[key]
        assert (g["n_bigrams"], g["seen_cnt"], g["bigram_freq_sum"]) == (
            e["n_bigrams"],
            e["seen_cnt"],
            e["bigram_freq_sum"],
        ), key
        backed_off += e["n_bigrams"] - e["seen_cnt"]
    assert backed_off > 0  # the cut really forced the backoff path


def test_hashed_plan_integer_keys_all_broadcast(spark):
    """The point of the fast path: the model-build shuffle partitions on
    the LONG gram key (no string gram column survives below the
    exchange) and scoring takes three BroadcastHashJoins."""
    from prase_spark.datapipe.lmscore import (
        bigram_vocab_hashed,
        lm_score_bigram_hashed,
        unigram_vocab_hashed,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = bigram_vocab_hashed(docs, top_b=10_000)
    build_plan = b._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bkey" in build_plan
    assert "bigram" not in build_plan  # no string gram reaches the exchange
    v = unigram_vocab_hashed(docs, top_v=10_000)
    score_plan = (
        lm_score_bigram_hashed(docs, v, b)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert score_plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in score_plan
