"""golden_record (survivorship.py) vs a brute-force replica."""

from collections import defaultdict

import pytest

from prase_spark.survivorship import golden_record

CLAIMS = [
    # (subj, pred, obj, source): m1/m2 are mentions of canonical e1
    ("m1", "hq", "paris", "s1"),
    ("m1", "hq", "berlin", "s2"),
    ("m2", "hq", "paris", "s3"),
    ("m2", "ceo", "ada", "s1"),
    ("m2", "ceo", "bob", "s2"),
    ("m2", "ceo", "ada", "s2"),
    ("e2", "hq", "tokyo", "s1"),
    # e3: a 1-1 weight tie -> obj asc picks "aaa"
    ("e3", "hq", "zzz", "s1"),
    ("e3", "hq", "aaa", "s2"),
]
CANON = [("m1", "e1"), ("m2", "e1")]
TRUST = [("s1", 100), ("s2", 10), ("s3", 1)]


def _brute(use_canon, trust=None):
    cmap = dict(CANON) if use_canon else {}
    w = defaultdict(int)
    tmap = dict(trust) if trust else None
    for s, p, o, src in CLAIMS:
        s = cmap.get(s, s)
        w[(s, p, o)] += tmap[src] if tmap else 1
    best = {}
    for (s, p, o), wt in w.items():
        cur = best.get((s, p))
        cand = (-wt, o)
        if cur is None or cand < cur[0]:
            best[(s, p)] = (cand, o, wt)
    return {(s, p): (o, wt) for (s, p), (_, o, wt) in best.items()}


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(CLAIMS, ["subj", "pred", "obj", "source"])
    c = spark.createDataFrame(CANON, ["node", "canon"])
    tr = spark.createDataFrame(TRUST, "source STRING, trust_e12 LONG")
    return t, c, tr


def test_majority_with_canon(spark, frames):
    t, c, _ = frames
    got = {
        (r.subj, r.pred): (r.obj, r.weight)
        for r in golden_record(t, canon=c).collect()
    }
    assert got == _brute(use_canon=True)
    # paris outvotes berlin 2-1 after the mentions merge
    assert got[("e1", "hq")] == ("paris", 2)
    # exact tie -> lexicographically smaller object
    assert got[("e3", "hq")] == ("aaa", 1)


def test_trust_weighted(spark, frames):
    t, c, tr = frames
    got = {
        (r.subj, r.pred): (r.obj, r.weight)
        for r in golden_record(t, canon=c, trust=tr).collect()
    }
    assert got == _brute(use_canon=True, trust=TRUST)
    # s1's trust 100 beats paris's s3+s2-less support (1): berlin? no —
    # hq votes: paris = s1(100) + s3(1) = 101, berlin = s2(10)
    assert got[("e1", "hq")] == ("paris", 101)
    # ceo: ada = s1(100) + s2(10) = 110, bob = s2(10)
    assert got[("e1", "ceo")] == ("ada", 110)


def test_mode_all_keeps_every_value(spark, frames):
    t, c, _ = frames
    got = {
        (r.subj, r.pred, r.obj): r.weight
        for r in golden_record(t, canon=c, mode="all").collect()
    }
    assert got[("e1", "hq", "paris")] == 2
    assert got[("e1", "hq", "berlin")] == 1
    with pytest.raises(ValueError):
        golden_record(t, mode="bogus")
