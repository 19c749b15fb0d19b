"""coreness_hindex vs brute-force peeling and a pure-Python h-operator
replica (fixed-iteration mode must match the recursion step-for-step)."""

from collections import defaultdict

import pytest

from prase_spark.graphstats import coreness_hindex

# a 4-clique (core 3) hung off a triangle (core 2) with pendant chains
# (core 1) and an isolated edge
EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
    (4, 5), (5, 6), (6, 7), (7, 5),                  # triangle 5-6-7
    (7, 8), (8, 9),                                  # chain
    (20, 21),                                        # isolated edge
]


def _adj(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _brute_coreness(edges):
    adj = {k: set(v) for k, v in _adj(edges).items()}
    core = {}
    k = 0
    while adj:
        k += 1
        while True:
            drop = [v for v, ns in adj.items() if len(ns) < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
    return core


def _hindex(vals):
    vs = sorted(vals, reverse=True)
    return max((min(v, i + 1) for i, v in enumerate(vs)), default=0)


def _brute_hoperator(edges, iterations):
    adj = _adj(edges)
    val = {v: len(ns) for v, ns in adj.items()}
    for _ in range(iterations):
        val = {v: _hindex([val[u] for u in adj[v]]) for v in adj}
    return val


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_fixed_iterations_match_recursion(spark, edge_df):
    for t in (1, 2):
        got = {r.node: r.core for r in coreness_hindex(edge_df, iterations=t).collect()}
        assert got == _brute_hoperator(EDGES, t), f"iteration {t}"


def test_convergent_mode_is_exact_coreness(spark, edge_df):
    stats = {}
    got = {r.node: r.core for r in coreness_hindex(edge_df, stats_out=stats).collect()}
    assert got == _brute_coreness(EDGES)
    assert stats["coreness_iterations"] >= 1


def test_coreness_functional_graph(spark):
    edges = [(v, (v * 17 + 3) % 60) for v in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.core for r in coreness_hindex(df).collect()}
    assert got == _brute_coreness(edges)
