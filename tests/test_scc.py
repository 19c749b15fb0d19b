"""SCC (graphstats.strongly_connected_components / scc_fwbw_min) vs a
brute-force Tarjan replica."""

import pytest

from prase_spark.graphstats import scc_fwbw_min, strongly_connected_components

# two 3-cycles bridged one-way, a 2-cycle, a chain of singletons, a
# self-contained diamond DAG
EDGES = [
    (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
    (3, 4),                          # bridge (one-way)
    (4, 5), (5, 6), (6, 4),          # SCC {4,5,6}
    (10, 11), (11, 10),              # SCC {10,11}
    (20, 21), (21, 22), (22, 23),    # chain: singletons
    (30, 31), (30, 32), (31, 33), (32, 33),  # diamond: singletons
    (33, 30),                        # ...closed into SCC {30,31,32,33}
]


def _brute_scc(edges):
    import sys

    sys.setrecursionlimit(10000)
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index = {}
    low = {}
    on = set()
    stack = []
    out = {}
    counter = [0]

    def strong(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on.add(v)
        for w in adj.get(v, []):
            if w not in index:
                strong(w)
                low[v] = min(low[v], low[w])
            elif w in on:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = stack.pop()
                on.discard(w)
                comp.append(w)
                if w == v:
                    break
            m = min(comp)
            for w in comp:
                out[w] = m

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return out


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_scc_closure_matches_tarjan(spark, edge_df):
    got = {r.node: r.scc for r in strongly_connected_components(edge_df).collect()}
    assert got == _brute_scc(EDGES)


def test_scc_fwbw_matches_closure(spark, edge_df):
    stats = {}
    got = {r.node: r.scc for r in scc_fwbw_min(edge_df, stats_out=stats).collect()}
    assert got == _brute_scc(EDGES)
    assert stats["scc_rounds"] >= 1


def test_scc_functional_graph(spark):
    # affine functional graph: every component is one cycle + trees
    edges = [(v, (v * 17 + 3) % 60) for v in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    brute = _brute_scc(edges)
    got = {r.node: r.scc for r in strongly_connected_components(df).collect()}
    assert got == brute
    got2 = {r.node: r.scc for r in scc_fwbw_min(df).collect()}
    assert got2 == brute


def test_scc_fwbw_raises_on_round_budget(spark, edge_df):
    with pytest.raises(RuntimeError):
        # 0 rounds with nonempty graph must refuse, not return partial
        scc_fwbw_min(edge_df, max_rounds=0)
