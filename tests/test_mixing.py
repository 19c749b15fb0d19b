"""graph_mixing_stats + rich_club_counts vs brute-force replicas."""

from collections import defaultdict
from itertools import combinations

import pytest

from prase_spark.graphstats import graph_mixing_stats, rich_club_counts

EDGES = [
    (1, 2), (2, 1),        # mutual pair
    (1, 3), (3, 4), (4, 1),
    (5, 6), (6, 5), (6, 7),
    (8, 8),                # self-loop: dropped
    (2, 3),
]


def _simple(edges):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    return und, deg


def _brute_mixing(edges):
    e = {(a, b) for a, b in edges if a != b}
    nodes = {a for a, _ in e} | {b for _, b in e}
    recip = sum(1 for a, b in e if (b, a) in e)
    und, deg = _simple(edges)
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    return {
        "n_nodes": len(nodes),
        "n_edges": len(e),
        "recip_num": recip,
        "recip_den": len(e),
        "asst_n": len(xs),
        "asst_sx": sum(xs),
        "asst_sy": sum(ys),
        "asst_sxy": sum(x * y for x, y in zip(xs, ys)),
        "asst_sx2": sum(x * x for x in xs),
        "asst_sy2": sum(y * y for y in ys),
    }


def test_mixing_stats_match_brute(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    row = graph_mixing_stats(df).collect()[0].asDict()
    assert row == _brute_mixing(EDGES)
    # symmetric sums by construction
    assert row["asst_sx"] == row["asst_sy"]
    assert row["asst_sx2"] == row["asst_sy2"]


def test_rich_club_matches_brute(spark):
    edges = [(v % 40, (v * 13 + 5) % 40) for v in range(200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    und, deg = _simple(edges)
    got = {r.k: (r.n_k, r.e_k) for r in rich_club_counts(df, [0, 1, 2, 3, 5]).collect()}
    for k in [0, 1, 2, 3, 5]:
        rich = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for a, b in und if a in rich and b in rich)
        assert got[k] == (len(rich), e_k), f"k={k}"
    # monotone: richer clubs are never larger
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a][0] >= got[b][0] and got[a][1] >= got[b][1]


def test_clustering_coefficient_counts(spark):
    from prase_spark.graphstats import clustering_coefficient_counts

    # K4 (every node C=1: tri 3, wedges 3) + a path (C=0)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.tri, r.wedges) for r in clustering_coefficient_counts(df).collect()}
    assert got[1] == (3, 3) and got[4] == (3, 3)
    assert got[5] == (0, 0) and got[6] == (0, 1) and got[7] == (0, 0)

    # cross-check vs brute on the mixing graph
    from collections import defaultdict
    from itertools import combinations

    edges2 = [((i * 7) % 25, (i * 11 + 3) % 25) for i in range(120)]
    df2 = spark.createDataFrame(edges2, ["src", "dst"])
    und, deg = _simple(edges2)
    nbr = defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    expect = {}
    for v in nbr:
        t = sum(1 for x, y in combinations(sorted(nbr[v]), 2) if (min(x, y), max(x, y)) in und)
        d = deg[v]
        expect[v] = (t, d * (d - 1) // 2)
    got2 = {r.node: (r.tri, r.wedges) for r in clustering_coefficient_counts(df2).collect()}
    assert got2 == expect


def test_borda_aggregate(spark):
    from prase_spark.graphstats import borda_aggregate

    s1 = spark.createDataFrame([(1, 100), (2, 50), (3, 10)], ["node", "x"])
    s2 = spark.createDataFrame([(1, 5), (2, 9), (4, 7)], ["node", "y"])
    got = {
        r.node: (r.borda, r.n_signals)
        for r in borda_aggregate({"a": s1, "b": s2}).collect()
    }
    # s1 points: 1->2, 2->1, 3->0 ; s2 points: 2->2, 4->1, 1->0
    assert got == {1: (2, 2), 2: (3, 2), 3: (0, 1), 4: (1, 1)}


def test_borda_tie_break_total_order(spark):
    from prase_spark.graphstats import borda_aggregate

    s = spark.createDataFrame([(5, 7), (3, 7), (9, 7)], ["node", "x"])
    got = {r.node: r.borda for r in borda_aggregate({"only": s}).collect()}
    # equal scores rank by node asc: 3 best (2 pts), then 5, then 9
    assert got == {3: 2, 5: 1, 9: 0}


def test_cocitation_and_coupling(spark):
    from collections import defaultdict
    from itertools import combinations

    from prase_spark.graphstats import cocitation_counts

    edges = [(v % 30, (v * 13 + 5) % 30) for v in range(150)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    dedup = set(edges)

    def _brute(coupling):
        nb = defaultdict(set)
        for s, d in dedup:
            if coupling:
                nb[s].add(d)   # a's out-set; shared targets couple
            else:
                nb[d].add(s)   # a's in-set; shared citers co-cite
        out = {}
        for a, b in combinations(sorted(nb), 2):
            n = len(nb[a] & nb[b])
            if n >= 1:
                out[(a, b)] = n
        return out

    for coupling in (False, True):
        got = {
            (r.a, r.b): r.n
            for r in cocitation_counts(df, coupling=coupling).collect()
        }
        assert got == _brute(coupling), f"coupling={coupling}"


def test_cocitation_hub_cap(spark):
    from prase_spark.graphstats import cocitation_counts

    # one citer links to everything: dropping it leaves only organic pairs
    edges = [(0, i) for i in range(1, 20)] + [(1, 5), (1, 6), (2, 5), (2, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    stats = {}
    got = {
        (r.a, r.b): r.n
        for r in cocitation_counts(df, max_hub_degree=5, stats_out=stats).collect()
    }
    assert stats["cocitation_middles_dropped"] == 1
    assert got == {(5, 6): 2}
