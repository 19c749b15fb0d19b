"""Fellegi-Sunter linkage (prase_spark/linkage.py) vs a pure-Python
replica with exact Fractions."""

from fractions import Fraction

import pytest

from prase_spark.linkage import (
    agreement_vectors,
    fellegi_sunter,
    fs_counts,
    fs_pattern_weights,
)

LEFT = [
    (1, "acme corp", "us", 10),
    (2, "globex", "de", 20),
    (3, "initech", "us", 30),
    (4, "umbrella", "jp", 40),
    (5, "hooli", "us", 50),
]
RIGHT = [
    (11, "acme corp", "us", 10),   # true match of 1: all agree
    (12, "globex gmbh", "de", 20),  # true match of 2: name differs
    (13, "initech", "us", 31),      # true match of 3: size differs
    (14, "acme corp", "de", 99),    # non-match sharing name with 1
    (15, "hooli", "jp", 50),        # non-match-ish: name+size agree with 5
]
CAND = [(1, 11), (2, 12), (3, 13), (1, 14), (5, 15), (4, 14), (2, 14)]
GOLD = [(1, 11), (2, 12), (3, 13)]
FEATURES = {"name": ("name", "name"), "cc": ("cc", "cc"), "size": ("size", "size")}


def _brute():
    lmap = {k: (n, c, s) for k, n, c, s in LEFT}
    rmap = {k: (n, c, s) for k, n, c, s in RIGHT}
    gold = set(GOLD)
    agr = {}
    for a, b in CAND:
        bits = 0
        flags = []
        for i in range(3):
            f = 1 if lmap[a][i] == rmap[b][i] else 0
            flags.append(f)
            bits |= f << i
        agr[(a, b)] = (bits, flags)
    counts = {}
    for i, name in enumerate(FEATURES):
        mn = sum(f[1][i] for p, f in agr.items() if p in gold)
        md = sum(1 for p in agr if p in gold)
        un = sum(f[1][i] for p, f in agr.items() if p not in gold)
        ud = sum(1 for p in agr if p not in gold)
        counts[name] = (mn, md, un, ud)
    weights = {}
    for p in range(8):
        w = Fraction(1)
        for i, name in enumerate(FEATURES):
            mn, md, un, ud = counts[name]
            m = Fraction(mn + 1, md + 2)
            u = Fraction(un + 1, ud + 2)
            w *= (m / u) if (p >> i) & 1 else ((1 - m) / (1 - u))
        weights[p] = w
    return agr, counts, weights


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, ["key", "name", "cc", "size"])
    r = spark.createDataFrame(RIGHT, ["key", "name", "cc", "size"])
    cand = spark.createDataFrame(CAND, ["key_l", "key_r"])
    gold = spark.createDataFrame(GOLD, ["key_l", "key_r"])
    return l, r, cand, gold


def test_agreement_vectors(spark, frames):
    l, r, cand, _ = frames
    agr, _, _ = _brute()
    got = {
        (x.key_l, x.key_r): (x.pattern, [x.agr_name, x.agr_cc, x.agr_size])
        for x in agreement_vectors(cand, l, r, FEATURES).collect()
    }
    assert got == agr


def test_fs_counts(spark, frames):
    l, r, cand, gold = frames
    agr = agreement_vectors(cand, l, r, FEATURES)
    _, counts, _ = _brute()
    got = {
        x.feature: (x.mn, x.md, x.un, x.ud)
        for x in fs_counts(agr, gold, FEATURES).collect()
    }
    assert got == counts


def test_pattern_weights_and_decisions(spark, frames):
    l, r, cand, gold = frames
    agr = agreement_vectors(cand, l, r, FEATURES)
    rows = fs_counts(agr, gold, FEATURES).collect()
    weights = fs_pattern_weights(rows, FEATURES)
    _, _, expect = _brute()
    assert weights == expect

    out = {
        (x.key_l, x.key_r): x.is_match
        for x in fellegi_sunter(cand, l, r, gold, FEATURES, accept=1).collect()
    }
    agr_b, _, w_b = _brute()
    for p, (bits, _) in agr_b.items():
        assert out[p] == (w_b[bits] >= 1), p
    # the all-agree gold pair links; the shares-only-name pair does not
    assert out[(1, 11)] is True
    assert out[(1, 14)] is False
