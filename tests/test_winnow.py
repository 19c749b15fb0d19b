"""Winnowing fingerprints (datapipe/winnow.py) vs a pure-Python MOSS
replica, plus the guarantee property: any shared substring of length
>= w + k - 1 yields a common fingerprint."""

import pytest

from prase_spark.datapipe.winnow import winnow_fingerprints

POLY_P = (1 << 61) - 1


def _poly(s):
    h = 17
    for ch in s:
        h = (h * 1000003 + ord(ch)) % POLY_P
    return h


def _norm(s):
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
    return " ".join(out)


def _brute(text, k, w):
    s = _norm(text)
    grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 1))]
    if len(s) < k:
        grams = [s]
    h = [_poly(g) for g in grams]
    ww = min(w, len(h))
    out = set()
    for i in range(max(len(h) - ww + 1, 1)):
        win = h[i : i + ww]
        m = min(win)
        rpos = max(p for p, v in enumerate(win) if v == m)
        out.add((i + 1 + rpos, m))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "hi"),
    (3, "a b"),
]


@pytest.mark.parametrize("k,w", [(5, 4), (3, 2), (7, 8)])
def test_matches_brute(spark, k, w):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for key, text in DOCS:
        assert got[key] == _brute(text, k, w), f"doc {key} k={k} w={w}"


def test_shared_substring_guarantee(spark):
    k, w = 5, 4
    shared = "identical stolen paragraph of text long enough to matter"
    a = "prefix junk before " + shared + " and trailing content one"
    b = "totally different opening here " + shared + " unrelated tail"
    df = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    # the winnowing guarantee: >= 1 shared fingerprint from the shared run
    assert fps[0] & fps[1]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
