"""textindex: term counts, document frequency, inverted index, tf-idf."""

from __future__ import annotations

import math

import pytest

from prase_spark.datapipe.textindex import (
    document_frequency,
    inverted_index,
    term_counts,
    tfidf_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat cat cat"),
            (4, "entirely different words here"),
        ],
        "doc_id LONG, text STRING",
    )


def test_term_counts(corpus):
    got = {(r["key"], r["term"]): r["tf"] for r in term_counts(corpus).collect()}
    assert got[(1, "the")] == 2
    assert got[(3, "cat")] == 3
    assert got[(2, "dog")] == 1
    assert (2, "cat") not in got


def test_document_frequency(corpus):
    got = {r["term"]: r["df"] for r in document_frequency(corpus).collect()}
    assert got["cat"] == 2  # docs 1 and 3 — repeats within doc 3 count once
    assert got["the"] == 2
    assert got["here"] == 1


def test_inverted_index_postings_sorted_and_capped(corpus):
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(corpus, min_df=1, max_df=None).collect()
    }
    assert got["cat"] == (2, "1,3")
    assert got["sat"] == (2, "1,2")
    # min_df prunes hapax; max_df prunes stop-terms
    pruned = {
        r["term"] for r in inverted_index(corpus, min_df=2, max_df=None).collect()
    }
    assert "here" not in pruned and "cat" in pruned
    capped = {
        r["term"] for r in inverted_index(corpus, min_df=1, max_df=1).collect()
    }
    assert "cat" not in capped and "dog" in capped


def test_tfidf_matches_python_and_is_deterministic(corpus):
    rows = tfidf_terms(corpus, k=2).collect()
    # python oracle for one cell: doc 3 'cat' tf=3, df=2, N=4
    cat3 = [r for r in rows if r["key"] == 3 and r["term"] == "cat"][0]
    assert cat3["tf"] == 3
    assert abs(cat3["tfidf"] - 3 * math.log(4 / 2)) < 1e-12
    # top-k bound respected
    from collections import Counter

    per_doc = Counter(r["key"] for r in rows)
    assert all(v <= 2 for v in per_doc.values())
    # deterministic under repartitioning (ties broken lexically)
    again = tfidf_terms(corpus.repartition(7), k=2).collect()
    assert {(r["key"], r["term"]) for r in rows} == {
        (r["key"], r["term"]) for r in again
    }


def test_corpus_profile_exact_and_approx(spark):
    from prase_spark.datapipe.profile import corpus_profile

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e"), (3, ""), (4, "a a a a a a a")],
        "doc_id LONG, text STRING",
    )
    exact = corpus_profile(docs, approx=False).first()
    # token counts sorted: 0,3,5,7 -> sum 15, interpolated median (3+5)/2 = 4
    assert exact["n_docs"] == 4
    assert exact["n_tokens"] == 15
    assert exact["distinct_terms"] == 5  # a b c d e
    assert exact["min_tokens"] == 0 and exact["max_tokens"] == 7
    assert exact["median_tokens_x2"] == 8
    approx = corpus_profile(docs, approx=True).first()
    assert approx["n_docs"] == 4 and approx["n_tokens"] == 15
    # sketches on tiny input are exact-ish; allow generous slack
    assert abs(approx["distinct_terms"] - 5) <= 1
    assert 0 < approx["median_tokens_x2"] <= 14


def test_corpus_profile_single_aggregation_plan(spark):
    """The profile must be ONE aggregation over one exploded scan — no
    self-joins or repeated scans of the corpus (approx path)."""
    from prase_spark.datapipe.profile import corpus_profile

    docs = spark.createDataFrame([(1, "x y")], "doc_id LONG, text STRING")
    plan = corpus_profile(docs, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1  # one explode
    assert "Join" not in plan


def test_rare_term_ratio_matches_python(corpus):
    from collections import Counter

    from prase_spark.datapipe.textindex import rare_term_ratio

    texts = {1: "the cat sat on the mat", 2: "the dog sat", 3: "cat cat cat",
             4: "entirely different words here"}
    grams = {
        k: sorted({" ".join(p) for p in zip(t.split(), t.split()[1:])})
        for k, t in texts.items()
    }
    df = Counter(g for gs in grams.values() for g in gs)
    for max_df in (1, 2):
        got = {
            r.key: (r.n_distinct, r.n_rare, r.rare_pct_e4)
            for r in rare_term_ratio(corpus, n=2, max_df=max_df).collect()
        }
        for k, gs in grams.items():
            nd = len(gs)
            nr = sum(1 for g in gs if df[g] <= max_df)
            exp_pct = (2 * nr * 10000 + nd) // (2 * nd) if nd else 0
            assert got[k] == (nd, nr, exp_pct), (k, max_df)


def test_rare_term_ratio_short_and_unigram(spark):
    from prase_spark.datapipe.textindex import rare_term_ratio

    d = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "one two")], "doc_id LONG, text STRING"
    )
    got = {r.key: (r.n_distinct, r.n_rare, r.rare_pct_e4)
           for r in rare_term_ratio(d, n=2, max_df=5).collect()}
    # docs shorter than n have no n-grams and a 0 ratio, not a crash
    assert got[1] == (0, 0, 0) and got[2] == (0, 0, 0)
    assert got[3] == (1, 1, 10000)
    uni = {r.key: (r.n_distinct, r.n_rare)
           for r in rare_term_ratio(d, n=1, max_df=1).collect()}
    # unigrams: 'one' appears in 2 docs (df=2 > 1), 'two' in 1
    assert uni[1] == (1, 0) and uni[3] == (2, 1)
