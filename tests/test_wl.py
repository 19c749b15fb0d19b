"""WL color refinement (graphstats.wl_colors) vs a pure-Python replica
using the same canonical-string + poly hash."""

from collections import defaultdict

import pytest

from prase_spark.graphstats import wl_colors

POLY_P = (1 << 61) - 1


def _poly(s):
    h = 17
    for ch in s:
        h = (h * 1000003 + ord(ch)) % POLY_P
    return h


def _brute_wl(edges, iterations):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {v: len(ns) for v, ns in adj.items()}
    for _ in range(iterations):
        nxt = {}
        for v in adj:
            ns = sorted(color[u] for u in adj[v])
            sig = f"{color[v]}|" + ",".join(str(c) for c in ns)
            nxt[v] = _poly(sig)
        color = nxt
    return color


# two disjoint triangles (structurally identical) + a path + a star
EDGES = [
    (1, 2), (2, 3), (3, 1),
    (11, 12), (12, 13), (13, 11),
    (20, 21), (21, 22), (22, 23),
    (30, 31), (30, 32), (30, 33), (30, 34),
]


def test_wl_matches_brute(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    for t in (0, 1, 2):
        got = {r.node: r.color for r in wl_colors(df, iterations=t).collect()}
        assert got == _brute_wl(EDGES, t), f"iteration {t}"


def test_wl_isomorphic_components_share_colors(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r.node: r.color for r in wl_colors(df, iterations=3).collect()}
    # the two triangles are isomorphic: color multisets must be equal
    assert {got[1], got[2], got[3]} == {got[11], got[12], got[13]}
    # star center vs leaf must differ; path interior vs path end must differ
    assert got[30] != got[31]
    assert got[20] != got[21]
    # triangle nodes are structurally unlike path nodes
    assert got[1] not in {got[20], got[21], got[22], got[23]}
