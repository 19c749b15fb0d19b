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
