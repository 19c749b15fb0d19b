"""Collocation mining (datapipe.colloc) — python count oracle, integer
lift arithmetic, deterministic cut, short-doc guard."""

from __future__ import annotations

from collections import Counter

import pytest

from prase_spark.datapipe.colloc import collocations

DOCS = [
    "new york is big and new york is loud",
    "the new york times covers new york",
    "big data and big models",
    "one",  # single token: contributes a unigram, no bigram
    "",  # empty: nothing
    "models models models",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in DOCS], "text STRING")


def python_oracle(texts, min_count):
    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    out = {}
    for (a, b), nab in big.items():
        if nab >= min_count:
            out[(a, b)] = (nab, (nab * n * 1_000_000) // (uni[a] * uni[b]))
    return out


def test_matches_python_oracle(docs):
    got = {
        (r["w1"], r["w2"]): (r["n_ab"], r["lift_e6"])
        for r in collocations(docs, top_k=100, min_count=2).collect()
    }
    assert got == python_oracle(DOCS, min_count=2)
    # sanity: "new york" (4 occurrences) is present and outranks chance
    assert got[("new", "york")][0] == 4


def test_topk_cut_is_deterministic(docs):
    expect = sorted(
        (
            (-lift, a, b)
            for (a, b), (_, lift) in python_oracle(DOCS, min_count=2).items()
        )
    )[:3]
    rows = collocations(docs, top_k=3, min_count=2).collect()
    assert [(-r["lift_e6"], r["w1"], r["w2"]) for r in rows] == expect
    again = collocations(docs.repartition(5), top_k=3, min_count=2).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_min_count_prunes(docs):
    rows = collocations(docs, top_k=100, min_count=5).collect()
    assert rows == []
