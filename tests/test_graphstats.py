"""graphstats: degrees + exact-integer PageRank.

The load-bearing claim is bit-determinism: the scaled-BIGINT arithmetic
must make the Spark result equal a pure-Python integer simulation of the
same recurrence EXACTLY (no tolerance), and stay identical under any
repartitioning — that is what lets the driver gate value-hash it against
a DuckDB twin."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from prase_spark.graphstats import (
    PAGERANK_SCALE,
    degrees,
    hits,
    pagerank,
    personalized_pagerank,
)


def _py_pagerank(edges, iterations, damping_e2=85, scale=PAGERANK_SCALE):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = Counter(a for a, _ in edges)
    rank = {n: scale for n in nodes}
    base = ((100 - damping_e2) * scale) // 100
    for _ in range(iterations):
        mass = dict.fromkeys(nodes, 0)
        for a, b in edges:
            mass[b] += rank[a] // out[a]
        rank = {
            n: base + (mass[n] // 100) * damping_e2 + ((mass[n] % 100) * damping_e2) // 100
            for n in nodes
        }
    return rank


def _edge_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "src STRING, dst STRING"
    )


def _seeded_graph(n_nodes=40, n_edges=160, seed=7):
    # deterministic LCG so the fixture is stable without random module state
    x = seed
    edges = []
    for _ in range(n_edges):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = x % n_nodes
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = x % n_nodes
        if a != b:
            edges.append((f"n{a}", f"n{b}"))
    return edges


def test_degrees_counts_multi_edges(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")]
    got = {
        r["node"]: (r["out_deg"], r["in_deg"])
        for r in degrees(_edge_df(spark, edges)).collect()
    }
    assert got == {"a": (2, 1), "b": (1, 2), "c": (1, 1)}


def test_pagerank_matches_pure_python_exactly(spark):
    edges = _seeded_graph()
    expect = _py_pagerank(edges, iterations=4)
    got = {
        r["node"]: r["rank_e12"]
        for r in pagerank(_edge_df(spark, edges), iterations=4).collect()
    }
    assert got == expect  # exact integer equality, no tolerance


def test_pagerank_dangling_and_source_nodes(spark):
    # chain a -> b -> c: c is dangling (no out-edges), a has no in-edges
    edges = [("a", "b"), ("b", "c")]
    expect = _py_pagerank(edges, iterations=3)
    got = {
        r["node"]: r["rank_e12"]
        for r in pagerank(_edge_df(spark, edges), iterations=3).collect()
    }
    assert got == expect
    # a receives only the base share each iteration
    scale = PAGERANK_SCALE
    assert got["a"] == ((100 - 85) * scale) // 100


def test_pagerank_partitioning_invariant(spark):
    edges = _seeded_graph(seed=11)
    df = _edge_df(spark, edges)
    r1 = {
        r["node"]: r["rank_e12"]
        for r in pagerank(df.repartition(1), iterations=3).collect()
    }
    r13 = {
        r["node"]: r["rank_e12"]
        for r in pagerank(df.repartition(13, "dst"), iterations=3).collect()
    }
    assert r1 == r13


def test_pagerank_zero_iterations_is_uniform(spark):
    df = _edge_df(spark, [("a", "b")])
    got = {r["node"]: r["rank_e12"] for r in pagerank(df, iterations=0).collect()}
    assert got == {"a": PAGERANK_SCALE, "b": PAGERANK_SCALE}


def test_pagerank_rejects_negative_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(_edge_df(spark, [("a", "b")]), iterations=-1)


def test_pagerank_checkpoint_path_equals_unchunked(spark):
    # checkpoint_every=1 truncates lineage every round; values unchanged
    edges = _seeded_graph(seed=3)
    df = _edge_df(spark, edges)
    a = {
        r["node"]: r["rank_e12"]
        for r in pagerank(df, iterations=3, checkpoint_every=1).collect()
    }
    assert a == _py_pagerank(edges, iterations=3)


def test_pagerank_hub_ranks_highest(spark):
    # star: everything points at h
    edges = [(f"s{i}", "h") for i in range(20)]
    rows = pagerank(_edge_df(spark, edges), iterations=2).collect()
    top = max(rows, key=lambda r: r["rank_e12"])
    assert top["node"] == "h"


# ---------------------------------------------------------------- triangles


def _brute_triangles(pairs):
    """Python oracle: distinct triangles of the undirected simplification."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    return tris


def test_triangles_k4_and_noise(spark):
    from prase_spark.graphstats import node_triangles, triangle_count

    # K4 on 0-3 (4 triangles, every node on 3) + a path + junk edges:
    # self-loop, a parallel duplicate, and a reverse duplicate
    pairs = (
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(10, 11), (11, 12)]
        + [(5, 5), (0, 1), (1, 0)]
    )
    e = spark.createDataFrame(pairs, "src LONG, dst LONG")
    assert triangle_count(e).first()["n_triangles"] == 4
    got = {r["node"]: r["triangles"] for r in node_triangles(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_match_python_oracle_and_partitioning(spark):
    from prase_spark.graphstats import node_triangles, triangle_count

    # deterministic pseudorandom multigraph on 30 nodes
    pairs = [((i * 7 + 3) % 30, (i * i + 5 * i) % 30) for i in range(300)]
    tris = _brute_triangles(pairs)
    e = spark.createDataFrame(pairs, "src LONG, dst LONG")
    assert triangle_count(e).first()["n_triangles"] == len(tris)
    want = Counter()
    for t in tris:
        want.update(t)
    got = {r["node"]: r["triangles"] for r in node_triangles(e).collect()}
    assert got == dict(want)
    again = {
        r["node"]: r["triangles"]
        for r in node_triangles(e.repartition(13)).collect()
    }
    assert again == got


def test_triangles_empty_and_triangle_free(spark):
    from prase_spark.graphstats import triangle_count

    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src LONG, dst LONG")
    assert triangle_count(path).first()["n_triangles"] == 0
    empty = path.filter("src < 0")
    assert triangle_count(empty).first()["n_triangles"] == 0


# ---------------------------------------------------------- link prediction


def test_link_candidates_path_and_star(spark):
    from prase_spark.graphstats import link_candidates

    path = spark.createDataFrame([(1, 2), (2, 3)], "src LONG, dst LONG")
    rows = link_candidates(path, min_common=1).collect()
    assert [(r["a"], r["b"], r["common"], r["jaccard_e6"]) for r in rows] == [
        (1, 3, 1, 1_000_000)
    ]
    # hub middle above the cap generates nothing
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src LONG, dst LONG")
    assert link_candidates(star, min_common=1, max_middle_deg=4).collect() == []
    got = {
        (r["a"], r["b"])
        for r in link_candidates(star, min_common=1).collect()
    }
    assert got == {(i, j) for i in range(1, 6) for j in range(i + 1, 6)}


def test_link_candidates_python_oracle(spark):
    from prase_spark.graphstats import link_candidates

    pairs = [((i * 7 + 3) % 30, (i * i + 5 * i) % 30) for i in range(300)]
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in und:
                continue
            c = len(adj[a] & adj[b])
            if c >= 3:
                want[(a, b)] = (
                    c,
                    c * 1_000_000 // (len(adj[a]) + len(adj[b]) - c),
                )
    e = spark.createDataFrame(pairs, "src LONG, dst LONG")
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard_e6"])
        for r in link_candidates(e, min_common=3).collect()
    }
    assert got == want


# ---- label propagation ----


def _py_lpa(edges, iterations, seeds=None):
    """Pure-python synchronous LPA oracle: undirected simple graph,
    majority label with min-label ties, isolated nodes keep labels."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nodes = sorted({a for a, _ in und} | set(seeds or {}))
    lab = {n: (seeds or {}).get(n, n) for n in nodes}
    adj = {}
    for a, b in und:
        adj.setdefault(b, []).append(a)
    for _ in range(iterations):
        new = {}
        for n in nodes:
            votes = Counter(lab[m] for m in adj.get(n, []))
            if votes:
                best = max(votes.values())
                new[n] = min(l for l, c in votes.items() if c == best)
            else:
                new[n] = lab[n]
        lab = new
    return lab


def test_label_propagation_two_cliques(spark):
    from prase_spark.graphstats import label_propagation

    # two triangles joined by one bridge edge: after 3 sync iterations
    # each triangle converges on its min member's label
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edge_df(spark, edges), iterations=3).collect()
    }
    assert got == _py_lpa(edges, 3)
    # the two cliques carry distinct labels (community structure found)
    assert got["a1"] == got["a2"] and got["b2"] == got["b3"]


def test_label_propagation_python_oracle_random(spark):
    from prase_spark.graphstats import label_propagation
    import random

    rnd = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = sorted({
        tuple(sorted(rnd.sample(nodes, 2))) for _ in range(60)
    })
    for its in (0, 1, 4):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(
                _edge_df(spark, edges), iterations=its
            ).collect()
        }
        assert got == _py_lpa(edges, its), f"iterations={its}"
    # partitioning invariance (the determinism contract)
    df = _edge_df(spark, edges)
    a = sorted(map(tuple, label_propagation(df, 3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(13), 3).collect()))
    assert a == b


def test_label_propagation_seeds_and_isolated(spark):
    from prase_spark.graphstats import label_propagation

    # path x-y-z with seed labels on the endpoints; w is seeds-only
    # (no edges) and must keep its seeded label through every iteration
    edges = [("x", "y"), ("y", "z")]
    seeds = spark.createDataFrame(
        [("x", "L"), ("z", "R"), ("w", "W")], "node STRING, label STRING"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            _edge_df(spark, edges), iterations=2, seeds=seeds
        ).collect()
    }
    assert got == _py_lpa(edges, 2, seeds={"x": "L", "z": "R", "w": "W"})
    assert got["w"] == "W"
    # y's vote at iteration 1 is {L, R} tied -> min label L (synchronous
    # semantics: at iteration 2 both endpoints hold y's OLD label, so y
    # flips back — the 2-cycle the fixed horizon is documented to allow)
    got1 = {
        r["node"]: r["label"]
        for r in label_propagation(
            _edge_df(spark, edges), iterations=1, seeds=seeds
        ).collect()
    }
    assert got1["y"] == "L"
    assert got["y"] == "y"


def test_label_propagation_rejects_negative_iterations(spark):
    from prase_spark.graphstats import label_propagation

    with pytest.raises(ValueError):
        label_propagation(_edge_df(spark, [("a", "b")]), iterations=-1)


# --- HITS -----------------------------------------------------------------


def _py_hits(edges, iterations, scale=PAGERANK_SCALE):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    hub = dict.fromkeys(nodes, scale)
    auth = dict.fromkeys(nodes, 0)

    def rescale(raw):
        k = (max(raw.values()) if raw else 0) // scale + 1
        return {n: raw.get(n, 0) // k for n in nodes}

    for _ in range(iterations):
        a_raw = {}
        for a, b in edges:
            a_raw[b] = a_raw.get(b, 0) + hub[a]
        auth = rescale(a_raw)
        h_raw = {}
        for a, b in edges:
            h_raw[a] = h_raw.get(a, 0) + auth[b]
        hub = rescale(h_raw)
    return {n: (auth[n], hub[n]) for n in nodes}


def test_hits_matches_pure_python_exactly(spark):
    edges = _seeded_graph()
    want = _py_hits(edges, 2)
    got = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(_edge_df(spark, edges), iterations=2).collect()
    }
    assert got == want


def test_hits_star_hub_and_authority(spark):
    # directory page d links to c1..c3; content pages link back to d only
    # from c3 -> d. d must be the top hub, the contents the top authorities.
    edges = [("d", "c1"), ("d", "c2"), ("d", "c3"), ("c3", "d")]
    got = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(_edge_df(spark, edges), iterations=2).collect()
    }
    assert got == _py_hits(edges, 2)
    top_hub = max(got, key=lambda n: got[n][1])
    assert top_hub == "d"
    # d's authority comes only from c3; contents each get d's full hub mass
    assert got["c1"][0] == got["c2"][0] == got["c3"][0]
    assert got["c1"][0] > got["d"][0]


def test_hits_partitioning_invariant_and_checkpoint(spark):
    edges = _seeded_graph(n_nodes=25, n_edges=120, seed=11)
    df = _edge_df(spark, edges)
    base = {
        (r["node"], r["auth_e12"], r["hub_e12"])
        for r in hits(df, iterations=3).collect()
    }
    repart = {
        (r["node"], r["auth_e12"], r["hub_e12"])
        for r in hits(df.repartition(13), iterations=3, checkpoint_every=1).collect()
    }
    assert base == repart


def test_hits_zero_iterations_and_negative(spark):
    edges = [("a", "b")]
    got = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(_edge_df(spark, edges), iterations=0).collect()
    }
    assert got == {"a": (0, PAGERANK_SCALE), "b": (0, PAGERANK_SCALE)}
    with pytest.raises(ValueError):
        hits(_edge_df(spark, edges), iterations=-1)


# --- personalized PageRank ---------------------------------------------------


def _py_ppr(edges, seeds, iterations, damping_e2=85, scale=PAGERANK_SCALE):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    seeds = {s for s in seeds if s in set(nodes)}
    out = Counter(a for a, _ in edges)
    base = ((100 - damping_e2) * scale) // 100
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        mass = dict.fromkeys(nodes, 0)
        for a, b in edges:
            if rank[a]:
                mass[b] += rank[a] // out[a]
        rank = {
            n: (base if n in seeds else 0)
            + (mass[n] // 100) * damping_e2
            + ((mass[n] % 100) * damping_e2) // 100
            for n in nodes
        }
    return rank


def _seed_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "node STRING")


def test_ppr_matches_pure_python_exactly(spark):
    edges = _seeded_graph()
    seeds = ["n1", "n5", "n13"]
    want = _py_ppr(edges, seeds, 3)
    got = {
        r["node"]: r["rank_e12"]
        for r in personalized_pagerank(
            _edge_df(spark, edges), _seed_df(spark, seeds), iterations=3
        ).collect()
    }
    assert got == want


def test_ppr_mass_stays_near_seeds(spark):
    # a -> b -> c -> d chain, seed at a: once the initial pulse washes
    # out (restart mass dominates after ~5 hops) rank decays along the
    # chain, and unreachable z stays exactly 0
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("z", "a")]
    got = {
        r["node"]: r["rank_e12"]
        for r in personalized_pagerank(
            _edge_df(spark, edges), _seed_df(spark, ["a"]), iterations=8
        ).collect()
    }
    assert got == _py_ppr(edges, ["a"], 8)
    assert got["a"] > got["b"] > got["c"] > got["d"]
    assert got["z"] == 0


def test_ppr_unknown_seed_ignored_and_partitioning(spark):
    edges = _seeded_graph(n_nodes=20, n_edges=80, seed=3)
    df = _edge_df(spark, edges)
    seeds = _seed_df(spark, ["n0", "nope"])
    a = {tuple(r) for r in personalized_pagerank(df, seeds, iterations=4).collect()}
    b = {
        tuple(r)
        for r in personalized_pagerank(
            df.repartition(9), seeds, iterations=4, checkpoint_every=1
        ).collect()
    }
    assert a == b == {
        (n, v) for n, v in _py_ppr(edges, ["n0"], 4).items()
    }


def test_ppr_rejects_negative_iterations(spark):
    with pytest.raises(ValueError):
        personalized_pagerank(
            _edge_df(spark, [("a", "b")]), _seed_df(spark, ["a"]), iterations=-1
        )


# --- resource-allocation link prediction ------------------------------------


def _py_ra(edges, min_common=2, max_mid=10_000):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in und:
                continue
            com = [
                m for m in nbrs[x] & nbrs[y] if len(nbrs[m]) <= max_mid
            ]
            if len(com) >= min_common:
                out[(x, y)] = (
                    len(com),
                    sum(1000000 // len(nbrs[m]) for m in com),
                )
    return out


def test_link_ra_matches_python_and_partitioning(spark):
    from prase_spark.graphstats import link_candidates_ra

    edges = _seeded_graph(n_nodes=18, n_edges=60, seed=9)
    df = _edge_df(spark, edges)
    got = {
        (r["a"], r["b"]): (r["common"], r["ra_e6"])
        for r in link_candidates_ra(df, min_common=2).collect()
    }
    assert got == _py_ra(edges)
    rep = {
        (r["a"], r["b"]): (r["common"], r["ra_e6"])
        for r in link_candidates_ra(df.repartition(5), min_common=2).collect()
    }
    assert rep == got


def test_link_ra_weights_rare_middles_higher(spark):
    from prase_spark.graphstats import link_candidates_ra

    # x and y share two middles: m1 (degree 2, rare) and m2 (degree 4,
    # hub-ish) -> ra = 10^6/2 + 10^6/4
    edges = [
        ("x", "m1"), ("y", "m1"),
        ("x", "m2"), ("y", "m2"), ("p", "m2"), ("q", "m2"),
    ]
    got = {
        (r["a"], r["b"]): r["ra_e6"]
        for r in link_candidates_ra(_edge_df(spark, edges), min_common=2).collect()
    }
    assert got[("x", "y")] == 1000000 // 2 + 1000000 // 4
