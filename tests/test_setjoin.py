"""Prefix-filter exact Jaccard join (datapipe/setjoin.py) vs brute-force
all-pairs — the lossless contract is the whole point, so the test is
exhaustive equality, not spot checks."""

import itertools

import pytest

from prase_spark.datapipe.setjoin import prefix_jaccard_join

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumped over the lazy dog"),
    (2, "the quick brown fox jumps over a lazy dog"),
    (3, "completely different content about spark engines"),
    (4, "completely different content about spark engines and scale"),
    (5, "the quick brown fox"),
    (6, "lorem ipsum dolor sit amet consectetur"),
    (7, "lorem ipsum dolor sit amet consectetur adipiscing"),
    (8, "singleton"),
    (9, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


def _tok(s):
    out = set()
    for t in s.lower().split():
        t = "".join(ch for ch in t if ch.isalnum())
        if t:
            out.add(t)
    return out


def _brute(pct):
    toks = {k: _tok(t) for k, t in DOCS}
    out = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        inter = len(toks[a] & toks[b])
        uni = len(toks[a] | toks[b])
        if inter * 100 >= pct * uni:
            out[(a, b)] = (inter, uni)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.parametrize("pct", [50, 70, 80, 90, 100])
def test_lossless_vs_brute(spark, docs_df, pct):
    got = {
        (r.key_a, r.key_b): (r.inter, r.uni)
        for r in prefix_jaccard_join(docs_df, threshold_pct=pct).collect()
    }
    assert got == _brute(pct), f"pct={pct}"


def test_prefix_actually_prunes(spark, docs_df):
    stats = {}
    prefix_jaccard_join(docs_df, threshold_pct=90, stats_out=stats).collect()
    n = len(DOCS)
    assert 0 < stats["prefix_candidates"] < n * (n - 1) // 2


def test_bad_threshold_rejected(spark, docs_df):
    with pytest.raises(ValueError):
        prefix_jaccard_join(docs_df, threshold_pct=0)


CORPUS = [
    (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (101, "alpha beta gamma something else entirely here now"),
    (102, "unrelated corpus text with distinct words"),
    (103, "delta epsilon zeta eta theta"),
]
QUERIES = [
    (0, "alpha beta gamma"),                      # fully inside 100, 101
    (1, "delta epsilon zeta eta"),                # inside 100, 103
    (2, "alpha nosuchtoken beta gamma"),          # 3/4 in 100/101
    (3, "totally absent vocabulary query"),       # partial overlap w/ 102
]


def _brute_containment(pct):
    ct = {k: _tok(t) for k, t in CORPUS}
    qt = {k: _tok(t) for k, t in QUERIES}
    out = {}
    for q, qs in qt.items():
        for c, cs in ct.items():
            inter = len(qs & cs)
            if inter * 100 >= pct * len(qs):
                out[(q, c)] = (inter, len(qs))
    return out


@pytest.mark.parametrize("pct", [50, 75, 100])
def test_containment_lossless(spark, pct):
    from prase_spark.datapipe.setjoin import containment_join

    qdf = spark.createDataFrame(QUERIES, ["doc_id", "text"])
    cdf = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.key_q, r.key_c): (r.inter, r.q_sz)
        for r in containment_join(qdf, cdf, threshold_pct=pct).collect()
    }
    assert got == _brute_containment(pct), f"pct={pct}"


def test_containment_out_of_vocab_query_prunes(spark):
    from prase_spark.datapipe.setjoin import containment_join

    qdf = spark.createDataFrame(QUERIES, ["doc_id", "text"])
    cdf = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    stats = {}
    got = containment_join(qdf, cdf, threshold_pct=75, stats_out=stats).collect()
    assert stats["containment_candidates"] < len(QUERIES) * len(CORPUS)
    # query 2 (one out-of-vocab token) is 75% contained in 100 and 101
    pairs = {(r.key_q, r.key_c) for r in got}
    assert (2, 100) in pairs and (2, 101) in pairs
