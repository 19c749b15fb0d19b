"""Meta-blocking (prase_spark/metablock.py) vs a brute-force Python
replica of the published semantics (Papadakis TKDE 2014, CBS weights,
exact-integer thresholds)."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from prase_spark.metablock import (
    cbs_edges,
    filter_blocks,
    meta_block_candidates,
    prune_cnp,
    prune_wep,
    prune_wnp,
    purge_blocks,
    token_blocks,
)

L = [
    (1, "acme steel works"),
    (2, "acme paper co"),
    (3, "blue river mining co"),
    (4, "green hill farms"),
    (5, "steel river logistics"),
]
R = [
    (11, "Acme Steel Works Inc"),
    (12, "acme paper company"),
    (13, "blue river mining"),
    (14, "hill farms of green county"),
    (15, "unrelated ventures"),
]


def _toks(s):
    out = []
    cur = ""
    for ch in s.lower():
        if ch.isalnum():
            cur += ch
        else:
            if cur:
                out.append(cur)
            cur = ""
    if cur:
        out.append(cur)
    return sorted(set(out))


def _brute(max_block_pairs=10_000, ratio_pct=100):
    bl = {k: _toks(n) for k, n in L}
    br = {k: _toks(n) for k, n in R}
    nl = defaultdict(set)
    nr = defaultdict(set)
    for k, ts in bl.items():
        for t in ts:
            nl[t].add(k)
    for k, ts in br.items():
        for t in ts:
            nr[t].add(k)
    pairs = {
        t: len(nl[t]) * len(nr[t])
        for t in set(nl) & set(nr)
        if len(nl[t]) * len(nr[t]) <= max_block_pairs
    }

    def _filter(memb):
        kept = {}
        for k, ts in memb.items():
            sized = sorted(
                [(pairs[t], t) for t in ts if t in pairs]
            )
            if not sized:
                kept[k] = set()
                continue
            n = len(sized)
            keep_n = max(1, math.ceil(ratio_pct * n / 100))
            kept[k] = {t for _, t in sized[:keep_n]}
        return kept

    fl, fr = _filter(bl), _filter(br)
    w = defaultdict(int)
    for t in pairs:
        for a in nl[t]:
            if t not in fl[a]:
                continue
            for b in nr[t]:
                if t in fr[b]:
                    w[(a, b)] += 1
    return dict(w)


def _collect_edges(df):
    return {(r.key_l, r.key_r): r.w for r in df.collect()}


@pytest.fixture(scope="module")
def sides(spark):
    ldf = spark.createDataFrame(L, ["key", "name"])
    rdf = spark.createDataFrame(R, ["key", "name"])
    return ldf, rdf


def test_cbs_edges_match_brute(spark, sides):
    ldf, rdf = sides
    bl, br = token_blocks(ldf), token_blocks(rdf)
    purged = purge_blocks(bl, br)
    fl = filter_blocks(bl, purged, ratio_pct=100)
    fr = filter_blocks(br, purged, ratio_pct=100)
    got = _collect_edges(cbs_edges(fl, fr))
    assert got == _brute(ratio_pct=100)


def test_block_filter_drops_generic_blocks(spark, sides):
    ldf, rdf = sides
    got = _collect_edges(
        meta_block_candidates(ldf, rdf, scheme="none", ratio_pct=50)
    )
    brute = _brute(ratio_pct=50)
    assert got == brute
    # the 50% filter must strictly shrink the graph vs no filter
    assert len(got) < len(_brute(ratio_pct=100))


def test_purge_caps_block_size(spark, sides):
    ldf, rdf = sides
    bl, br = token_blocks(ldf), token_blocks(rdf)
    stats = {}
    purged = purge_blocks(bl, br, max_block_pairs=1, stats_out=stats)
    # only 1x1 blocks survive a cap of 1
    rows = purged.collect()
    assert all(r.n_l * r.n_r <= 1 for r in rows)
    assert stats["metablock_tokens_purged"] > 0


def test_wep_keeps_at_or_above_mean(spark, sides):
    ldf, rdf = sides
    edges = meta_block_candidates(ldf, rdf, scheme="none", ratio_pct=100)
    kept = _collect_edges(prune_wep(edges))
    allw = _brute(ratio_pct=100)
    s, n = sum(allw.values()), len(allw)
    expect = {p: w for p, w in allw.items() if w * n * 100 >= 100 * s}
    assert kept == expect
    assert 0 < len(kept) < len(allw)


def test_wnp_union_of_endpoint_means(spark, sides):
    ldf, rdf = sides
    edges = meta_block_candidates(ldf, rdf, scheme="none", ratio_pct=100)
    kept = _collect_edges(prune_wnp(edges))
    allw = _brute(ratio_pct=100)
    ls, ln, rs, rn = (
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
    )
    for (a, b), w in allw.items():
        ls[a] += w
        ln[a] += 1
        rs[b] += w
        rn[b] += 1
    expect = {
        (a, b): w
        for (a, b), w in allw.items()
        if w * ln[a] * 100 >= 100 * ls[a] or w * rn[b] * 100 >= 100 * rs[b]
    }
    assert kept == expect


def test_cnp_topk(spark, sides):
    ldf, rdf = sides
    edges = meta_block_candidates(ldf, rdf, scheme="none", ratio_pct=100)
    kept = _collect_edges(prune_cnp(edges, k=1))
    allw = _brute(ratio_pct=100)
    keep = set()
    byl, byr = defaultdict(list), defaultdict(list)
    for (a, b), w in allw.items():
        byl[a].append((-w, b))
        byr[b].append((-w, a))
    for a, lst in byl.items():
        lst.sort()
        keep.add((a, lst[0][1]))
    for b, lst in byr.items():
        lst.sort()
        keep.add((lst[0][1], b))
    assert set(kept) == keep
    # the true match (1, 11) has the strongest evidence and must survive
    assert (1, 11) in kept


def test_true_pairs_survive_wnp(spark, sides):
    ldf, rdf = sides
    kept = _collect_edges(meta_block_candidates(ldf, rdf, scheme="wnp"))
    for pair in [(1, 11), (2, 12), (3, 13)]:
        assert pair in kept
    assert (5, 15) not in kept  # no shared token at all


def test_global_rank_matches_sort(spark):
    from prase_spark.metablock import global_rank

    rows = [(i, f"s{(i * 37) % 100:03d}") for i in range(250)]
    df = spark.createDataFrame(rows, ["key", "sk"])
    got = {r.key: r.rank for r in global_rank(df, ["sk", "key"], n_parts=7).collect()}
    expect = {
        k: i for i, (k, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == expect


def test_snb_matches_brute_and_partition_invariant(spark):
    from prase_spark.metablock import sorted_neighborhood_pairs

    rows = [(i, f"n{(i * 53) % 40:03d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["key", "name"])
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    w = 4
    expect = {
        (order[i][0], order[j][0], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + w, len(order)))
    }
    for n_parts in (2, 9):
        got = {
            (r.key_a, r.key_b, r.dist)
            for r in sorted_neighborhood_pairs(
                df, "name", window=w, n_parts=n_parts
            ).collect()
        }
        assert got == expect, f"n_parts={n_parts}"


def test_snb_rejects_degenerate_window(spark):
    from prase_spark.metablock import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a")], ["key", "name"])
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "name", window=1)
