"""TextRank keywords (datapipe/textrank.py) vs a pure-Python replica of
the integer-PageRank recurrence over the same co-occurrence graph."""

from collections import defaultdict

import pytest

from prase_spark.datapipe.textrank import cooccurrence_edges, textrank_keywords

DOCS = [
    (0, "spark engine shuffles data across the spark cluster"),
    (1, "the engine optimizes the query plan"),
    (2, "data lives in parquet files on the cluster"),
    (3, "query plan optimization in the spark engine"),
    (4, "solo"),
]

SCALE = 10**12


def _tok(s):
    return [t for t in "".join(c if c.isalnum() else " " for c in s.lower()).split() if t]


def _brute(iterations=3, k=3):
    und = set()
    for _, text in DOCS:
        ts = _tok(text)
        for a, b in zip(ts, ts[1:]):
            if a != b:
                und.add((a, b))
                und.add((b, a))
    nodes = {a for a, _ in und} | {b for _, b in und}
    out_deg = defaultdict(int)
    for a, _ in und:
        out_deg[a] += 1
    rank = {v: SCALE for v in nodes}
    base = (15 * SCALE) // 100
    for _ in range(iterations):
        mass = defaultdict(int)
        for a, b in und:
            mass[b] += rank[a] // out_deg[a]
        rank = {
            v: base + (mass[v] // 100) * 85 + ((mass[v] % 100) * 85) // 100
            for v in nodes
        }
    kws = {}
    for key, text in DOCS:
        cand = sorted(
            ((t, rank[t]) for t in set(_tok(text)) if t in rank),
            key=lambda x: (-x[1], x[0]),
        )
        for i, (t, r) in enumerate(cand[:k], 1):
            kws[(key, t)] = (r, i)
    return kws


def test_edges_are_symmetric_and_deduped(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {(r.src, r.dst) for r in cooccurrence_edges(df).collect()}
    assert got == {p for p in got if (p[1], p[0]) in got}  # symmetric
    und = set()
    for _, text in DOCS:
        ts = _tok(text)
        for a, b in zip(ts, ts[1:]):
            if a != b:
                und.add((a, b))
                und.add((b, a))
    assert got == und


def test_keywords_match_brute(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.doc_id, r.token): (r.rank_e12, r.rn)
        for r in textrank_keywords(df, iterations=3, k=3).collect()
    }
    assert got == _brute()
    # the single-token doc has no co-occurrence evidence -> no keywords
    assert not any(key == 4 for key, _ in got)
