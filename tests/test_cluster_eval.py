"""cluster_metrics: pairwise + B-cubed clustering quality in exact
integer micro-units, pinned against a pure-python replica and the
perfect/degenerate boundary cases."""

from __future__ import annotations

from collections import Counter

from prase_spark.evaluate import cluster_metrics


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, cluster STRING")


def _py_metrics(pred, gold):
    p, g = dict(pred), dict(gold)
    ids = sorted(set(p) & set(g))
    cont = Counter((p[i], g[i]) for i in ids)
    psz = Counter(p[i] for i in ids)
    gsz = Counter(g[i] for i in ids)
    tp = sum(n * (n - 1) // 2 for n in cont.values())
    pp = sum(n * (n - 1) // 2 for n in psz.values())
    gp = sum(n * (n - 1) // 2 for n in gsz.values())
    n = len(ids)
    prec = (1000000 * tp) // pp if pp else 0
    rec = (1000000 * tp) // gp if gp else 0
    f1 = (2 * prec * rec) // (prec + rec) if (pp and gp and prec + rec) else 0
    bp = sum((1000000 * v * v) // psz[pc] for (pc, _), v in cont.items()) // n if n else 0
    br = sum((1000000 * v * v) // gsz[gc] for (pc, gc), v in cont.items()) // n if n else 0
    return (n, tp, pp, gp, prec, rec, f1, bp, br)


def _run(spark, pred, gold):
    return tuple(
        cluster_metrics(_df(spark, pred), _df(spark, gold)).collect()[0]
    )


def test_perfect_clustering_scores_1e6(spark):
    rows = [(i, f"c{i % 5}") for i in range(40)]
    got = _run(spark, rows, rows)
    assert got[4] == got[5] == got[6] == got[7] == got[8] == 1000000


def test_matches_python_replica(spark):
    pred = [(i, f"p{i % 7}") for i in range(100)]
    gold = [(i, f"g{(i * 3) % 5}") for i in range(100)]
    assert _run(spark, pred, gold) == _py_metrics(
        [(i, f"p{i % 7}") for i in range(100)],
        [(i, f"g{(i * 3) % 5}") for i in range(100)],
    )


def test_singletons_vs_one_big_cluster(spark):
    ids = list(range(30))
    singles = [(i, f"s{i}") for i in ids]
    one = [(i, "all") for i in ids]
    # all-singletons pred vs one-cluster gold: no predicted pairs ->
    # precision 0 by the guard, recall 0, bcubed recall = 1/30
    got = _run(spark, singles, one)
    assert got[1] == 0 and got[2] == 0 and got[4] == 0 and got[5] == 0
    assert got[7] == 1000000          # each item alone is pure
    assert got[8] == 1000000 // 30    # floor convention
    # and the replica agrees on the transpose too
    assert _run(spark, one, singles) == _py_metrics(one, singles)


def test_inner_join_universe(spark):
    pred = [(1, "a"), (2, "a"), (3, "b")]
    gold = [(2, "x"), (3, "x"), (4, "x")]
    got = _run(spark, pred, gold)
    assert got[0] == 2  # only ids 2 and 3 are scored
    assert got == _py_metrics(pred, gold)
