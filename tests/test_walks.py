"""walks: deterministic DeepWalk corpus + skip-gram pair counts.

Load-bearing claim: every step choice is shared arithmetic
(poly_hash61 walk ids + the DECIMAL mix chooser), so the Spark corpus
equals a pure-python simulation EXACTLY and is partitioning-invariant —
the property the driver gate's DuckDB twin relies on."""

from __future__ import annotations

import pytest

from prase_spark.datapipe.hashing import POLY_INIT, POLY_MULT, POLY_P
from prase_spark.walks import MIX_ADD, MIX_MULT, MIX_STEP, random_walks, skipgram_pairs


def _poly(s):
    h = POLY_INIT
    for ch in s:
        h = (h * POLY_MULT + ord(ch)) % POLY_P
    return h


def _mix(w, s):
    return ((w % POLY_P) * MIX_MULT + s * MIX_STEP + MIX_ADD) % POLY_P


def _py_walks(edges, walk_length, walks_per_node):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a].sort()
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    rows = set()
    for node in nodes:
        for k in range(walks_per_node):
            wid = _poly(f"{node}#{k}")
            cur = node
            rows.add((wid, node, 0, node))
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_mix(wid, step) % len(nbrs)]
                rows.add((wid, node, step, cur))
    return rows


def _edge_df(spark, edges):
    return spark.createDataFrame(edges, "src STRING, dst STRING")


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "a"), ("d", "b"), ("b", "a"), ("a", "b"),  # multi-edge a->b
]


def test_walks_match_pure_python_exactly(spark):
    got = {
        (r["walk_id"], r["start"], r["step"], r["node"])
        for r in random_walks(
            _edge_df(spark, EDGES), walk_length=5, walks_per_node=2
        ).collect()
    }
    assert got == _py_walks(EDGES, 5, 2)


def test_walks_dead_end_truncates(spark):
    # z has no out-edges: its walk is just step 0, and any walk reaching
    # z stops there
    edges = [("a", "z")]
    got = {
        (r["start"], r["step"], r["node"])
        for r in random_walks(_edge_df(spark, edges), walk_length=3).collect()
    }
    assert got == {("a", 0, "a"), ("a", 1, "z"), ("z", 0, "z")}


def test_walks_partitioning_invariant_and_checkpoint(spark):
    df = _edge_df(spark, EDGES)
    a = {
        tuple(r)
        for r in random_walks(df, walk_length=6, walks_per_node=2).collect()
    }
    b = {
        tuple(r)
        for r in random_walks(
            df.repartition(7), walk_length=6, walks_per_node=2, checkpoint_every=1
        ).collect()
    }
    assert a == b


def test_walks_max_degree_cap_and_telemetry(spark):
    stats = {}
    got = random_walks(
        _edge_df(spark, EDGES),
        walk_length=2,
        max_degree=1,
        stats_out=stats,
    )
    # a (3 out-edges incl. multi), b (2), c (2), d (2) all capped to 1
    assert stats["capped_nodes"] == 4
    # with every neighbor list cut to its sorted head, walks are
    # deterministic chains: a->b->a, b->a->b, c->a->b, d->a->b
    rows = {(r["start"], r["step"], r["node"]) for r in got.collect()}
    assert ("a", 1, "b") in rows and ("c", 1, "a") in rows and ("d", 1, "a") in rows


def test_walks_rejects_bad_params(spark):
    df = _edge_df(spark, EDGES)
    with pytest.raises(ValueError):
        random_walks(df, walk_length=-1)
    with pytest.raises(ValueError):
        random_walks(df, walks_per_node=0)


def test_skipgram_pairs_small(spark):
    walks = spark.createDataFrame(
        [(1, "a", 0, "x"), (1, "a", 1, "y"), (1, "a", 2, "x"), (2, "b", 0, "y")],
        "walk_id LONG, start STRING, step INT, node STRING",
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=1).collect()
    }
    # (x@0,y@1), (y@1,x@0), (y@1,x@2), (x@2,y@1); x@0/x@2 outside window=1
    assert got == {("x", "y"): 2, ("y", "x"): 2}
    with pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


def test_skipgram_window_and_self_drop(spark):
    walks = spark.createDataFrame(
        [(1, "a", 0, "x"), (1, "a", 1, "x"), (1, "a", 2, "z")],
        "walk_id LONG, start STRING, step INT, node STRING",
    )
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=2, drop_self=False).collect()
    }
    assert got == {
        ("x", "x"): 2, ("x", "z"): 2, ("z", "x"): 2,
    }
    got_drop = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got_drop == {("x", "z"): 2, ("z", "x"): 2}


# --- node2vec ---------------------------------------------------------------


def _py_node2vec(edges, walk_length, walks_per_node, wr, wc, wf):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a].sort()
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    rows = set()
    for node in nodes:
        for k in range(walks_per_node):
            wid = _poly(f"{node}#{k}")
            rows.add((wid, node, 0, node))
            nbrs = adj.get(node)
            if not nbrs:
                continue
            prev, cur = node, nbrs[_mix(wid, 1) % len(nbrs)]
            rows.add((wid, node, 1, cur))
            for step in range(2, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                pn = set(adj.get(prev, []))
                ws = [
                    wr if x == prev else (wc if x in pn else wf) for x in nbrs
                ]
                r = _mix(wid, step) % sum(ws)
                acc, idx = 0, 0
                for j, w in enumerate(ws):
                    acc += w
                    if r < acc:
                        idx = j
                        break
                prev, cur = cur, nbrs[idx]
                rows.add((wid, node, step, cur))
    return rows


def test_node2vec_matches_pure_python_exactly(spark):
    from prase_spark.walks import node2vec_walks

    got = {
        (r["walk_id"], r["start"], r["step"], r["node"])
        for r in node2vec_walks(
            _edge_df(spark, EDGES), walk_length=5, walks_per_node=2,
            return_w=1, common_w=4, far_w=2,
        ).collect()
    }
    assert got == _py_node2vec(EDGES, 5, 2, 1, 4, 2)


def test_node2vec_equal_weights_degenerates_to_first_order(spark):
    from prase_spark.walks import node2vec_walks

    df = _edge_df(spark, EDGES)
    uni = {
        tuple(r) for r in random_walks(df, walk_length=4, walks_per_node=2).collect()
    }
    n2v = {
        tuple(r)
        for r in node2vec_walks(
            df, walk_length=4, walks_per_node=2,
            return_w=1, common_w=1, far_w=1,
        ).collect()
    }
    assert n2v == uni


def test_node2vec_partitioning_invariant(spark):
    from prase_spark.walks import node2vec_walks

    df = _edge_df(spark, EDGES)
    a = {
        tuple(r)
        for r in node2vec_walks(df, walk_length=6, walks_per_node=1).collect()
    }
    b = {
        tuple(r)
        for r in node2vec_walks(
            df.repartition(11), walk_length=6, walks_per_node=1, checkpoint_every=1
        ).collect()
    }
    assert a == b


def test_node2vec_rejects_bad_weights(spark):
    from prase_spark.walks import node2vec_walks

    with pytest.raises(ValueError):
        node2vec_walks(_edge_df(spark, EDGES), return_w=0)


# --- distributional context similarity --------------------------------------


def _sg_df(spark, rows):
    return spark.createDataFrame(rows, "center STRING, context STRING, cnt LONG")


def test_context_similarity_minsum_kernel(spark):
    from prase_spark.walks import context_similarity

    rows = [
        ("a", "x", 3), ("a", "y", 1),
        ("b", "x", 2), ("b", "y", 4),
        ("c", "x", 1),
    ]
    got = {
        (r["a"], r["b"]): (r["shared"], r["minsum"])
        for r in context_similarity(_sg_df(spark, rows), min_shared=1, k=None).collect()
    }
    assert got == {
        ("a", "b"): (2, 2 + 1),   # min(3,2) + min(1,4)
        ("a", "c"): (1, 1),
        ("b", "c"): (1, 1),
    }
    # min_shared=2 keeps only the (a, b) pair
    got2 = {
        (r["a"], r["b"])
        for r in context_similarity(_sg_df(spark, rows), min_shared=2, k=None).collect()
    }
    assert got2 == {("a", "b")}


def test_context_similarity_hot_context_cap_and_topk(spark):
    from prase_spark.walks import context_similarity

    # context 'h' is shared by 4 nodes (df=4): with max_context_df=3 it
    # must be dropped (counted), leaving only the 'q' pair
    rows = [(n, "h", 1) for n in "abcd"] + [("a", "q", 2), ("b", "q", 5)]
    stats = {}
    got = {
        (r["a"], r["b"]): (r["shared"], r["minsum"])
        for r in context_similarity(
            _sg_df(spark, rows), min_shared=1, max_context_df=3,
            k=None, stats_out=stats,
        ).collect()
    }
    assert stats["dropped_contexts"] == 1
    assert got == {("a", "b"): (1, 2)}
    # top-k: node 'a' shares q with b (minsum 2) and with c (minsum 1);
    # k=1 keeps the stronger pair only
    rows2 = [("a", "q", 2), ("b", "q", 5), ("c", "q", 1)]
    top = {
        (r["a"], r["b"])
        for r in context_similarity(_sg_df(spark, rows2), min_shared=1, k=1).collect()
    }
    assert top == {("a", "b"), ("b", "c")}


def test_context_similarity_partitioning_invariant(spark):
    from prase_spark.walks import context_similarity

    rows = [
        (f"n{i % 7}", f"c{(i * 3) % 11}", (i % 4) + 1) for i in range(80)
    ]
    # aggregate duplicate (center, context) rows first — the skipgram
    # contract guarantees uniqueness, so the fixture must too
    import collections

    agg = collections.Counter()
    for c, x, n in rows:
        agg[(c, x)] += n
    uniq = [(c, x, n) for (c, x), n in agg.items()]
    df = _sg_df(spark, uniq)
    a = {tuple(r) for r in context_similarity(df, k=3).collect()}
    b = {
        tuple(r)
        for r in context_similarity(df.repartition(9), k=3, salt_buckets=5).collect()
    }
    assert a == b
