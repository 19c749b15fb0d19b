"""k_hop_distances: multi-source frontier BFS.

Load-bearing claims:
- depths equal a pure-python multi-source BFS exactly (min hop count,
  seeds at 0) on a graph with cycles, diamonds, and unreachable nodes,
  directed AND undirected;
- max_hops truncates (nodes beyond k absent), stats report levels and
  frontier sizes;
- a seed not present in the edge set still appears at depth 0.
"""

from __future__ import annotations

from collections import deque

from prase_spark.graphstats import k_hop_distances

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),          # cycle
    ("a", "d"), ("b", "d"),                      # diamond into d
    ("d", "e"), ("e", "f"), ("f", "g"),          # chain
    ("z1", "z2"),                                # disconnected
]


def _py_bfs(edges, seeds, k, directed):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= k:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(spark, seeds, k, directed):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    stats: dict = {}
    got = {
        (r["node"], r["depth"])
        for r in k_hop_distances(
            e, s, max_hops=k, directed=directed, stats_out=stats
        ).collect()
    }
    return got, stats


def test_directed_matches_python(spark):
    got, _ = _run(spark, ["a"], 10, True)
    assert got == set(_py_bfs(EDGES, ["a"], 10, True).items())


def test_undirected_multi_seed(spark):
    got, _ = _run(spark, ["g", "z2"], 10, False)
    assert got == set(_py_bfs(EDGES, ["g", "z2"], 10, False).items())


def test_max_hops_truncates_and_stats(spark):
    got, stats = _run(spark, ["a"], 2, True)
    assert got == set(_py_bfs(EDGES, ["a"], 2, True).items())
    assert ("f", 3) not in got and all(d <= 2 for _, d in got)
    assert stats["levels"] == 2
    assert stats["frontier_sizes"][0] == 1  # the seed
    assert stats["frontier_sizes"][1] == 2  # b, d


def test_isolated_seed_depth_zero(spark):
    got, stats = _run(spark, ["ghost"], 3, True)
    assert got == {("ghost", 0)}
    assert stats["levels"] == 0
