"""butterfly_counts (graphstats) vs brute-force biclique enumeration."""

from collections import defaultdict
from itertools import combinations

import pytest

from prase_spark.graphstats import butterfly_counts

# K2,2 on (1,2)x(a,b) = 1 butterfly; K3,2 on (1,2,3)x(c,d) = 3
# butterflies; plus pendant edges
EDGES = [
    (1, "a"), (1, "b"), (2, "a"), (2, "b"),
    (1, "c"), (1, "d"), (2, "c"), (2, "d"), (3, "c"), (3, "d"),
    (4, "e"),
    (5, "a"),
]


def _brute(edges):
    nbr = defaultdict(set)
    for l, r in set(edges):
        nbr[l].add(r)
    out = {l: 0 for l in nbr}
    for l1, l2 in combinations(sorted(nbr), 2):
        c = len(nbr[l1] & nbr[l2])
        bf = c * (c - 1) // 2
        out[l1] += bf
        out[l2] += bf
    return out


def test_butterflies_match_brute(spark):
    df = spark.createDataFrame(EDGES, ["l", "r"])
    got = {x.node: x.butterflies for x in butterfly_counts(df).collect()}
    assert got == _brute(EDGES)
    assert got[4] == 0 and got[5] == 0


def test_right_degree_cap_drops_hubs(spark):
    # make "a" a degree-5 hub; capping at 3 removes exactly its wedges
    # (b/c/d have degree <= 3 and survive)
    edges = EDGES + [(6, "a"), (7, "a")]
    df = spark.createDataFrame(edges, ["l", "r"])
    stats = {}
    got = {
        x.node: x.butterflies
        for x in butterfly_counts(df, max_right_degree=3, stats_out=stats).collect()
    }
    assert stats["butterfly_right_nodes_dropped"] == 1
    capped = [(l, r) for l, r in edges if r != "a"]
    expect = _brute(capped)
    # nodes that ONLY touched "a" drop out of the left universe
    assert got == expect


def test_mixing_graph_brute(spark):
    edges = [((i * 7) % 30, f"r{(i * 11) % 20}") for i in range(300)]
    df = spark.createDataFrame(edges, ["l", "r"])
    got = {x.node: x.butterflies for x in butterfly_counts(df).collect()}
    assert got == _brute(edges)
