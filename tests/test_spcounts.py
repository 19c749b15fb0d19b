"""shortest_path_counts (graphstats) vs brute-force BFS with sigma."""

from collections import defaultdict, deque

import pytest

from prase_spark.graphstats import shortest_path_counts

# diamond (two routes 0->3), then fan-in (3 routes to 6), a cycle edge,
# and an unreachable island
EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (3, 4), (3, 5), (1, 5),
    (4, 6), (5, 6),
    (6, 0),
    (90, 91),
]


def _brute(edges, seeds, max_hops, directed=True):
    adj = defaultdict(list)
    for s, d in set(edges):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    depth = {s: 0 for s in seeds}
    paths = {s: 1 for s in seeds}
    frontier = list(seeds)
    for dcur in range(max_hops):
        counts = defaultdict(int)
        for u in frontier:
            for v in adj[u]:
                if v not in depth:
                    counts[v] += paths[u]
        if not counts:
            break
        for v, c in counts.items():
            depth[v] = dcur + 1
            paths[v] = c
        frontier = list(counts)
    return {v: (depth[v], paths[v]) for v in depth}


def test_sigma_matches_brute(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: (r.depth, r.paths)
        for r in shortest_path_counts(edges, seeds, max_hops=4).collect()
    }
    assert got == _brute(EDGES, [0], 4)
    # the diamond: two shortest paths into 3, inherited by 4
    assert got[3] == (2, 2)
    assert got[4] == (3, 2)
    # 6 is reached at depth 3 only through 5 (one shortest route);
    # the depth-4 routes through 4 arrive too late to count
    assert got[6] == (3, 1)
    assert 90 not in got  # island unreachable


def test_multi_seed_and_undirected(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (90,)], ["node"])
    got = {
        r.node: (r.depth, r.paths)
        for r in shortest_path_counts(
            edges, seeds, max_hops=3, directed=False
        ).collect()
    }
    assert got == _brute(EDGES, [0, 90], 3, directed=False)
    assert got[91] == (1, 1)


def test_mixing_graph_matches_brute(spark):
    edges = [(v % 60, (v * 31 + 7) % 60) for v in range(240)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (1,)], ["node"])
    got = {
        r.node: (r.depth, r.paths)
        for r in shortest_path_counts(df, seeds, max_hops=4).collect()
    }
    assert got == _brute(edges, [0, 1], 4)
