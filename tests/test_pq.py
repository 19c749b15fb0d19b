"""Product quantization: encode argmin correctness, ADC exactness vs a
same-fold python replica, zero-distortion roundtrip, training recall
improvement, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pytest

from prase_spark.datapipe.pq import (
    pq_adc_topk,
    pq_codebook_df,
    pq_encode,
    train_pq_codebooks,
)


def _corpus(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def _books(m, ksub, dsub):
    # deterministic arithmetic codebook on the exact-binary 1/16 grid
    return np.array(
        [
            [[((k * 7 + j * 3 + s) % 16) / 16.0 for j in range(dsub)]
             for k in range(ksub)]
            for s in range(m)
        ]
    )


def _py_encode(mat, books):
    m, ksub, dsub = books.shape
    out = {}
    for i, v in enumerate(mat):
        codes = []
        for s in range(m):
            sv = v[s * dsub : (s + 1) * dsub]
            best, bd = 0, None
            for k in range(ksub):
                acc = 0.0
                for x, y in zip(sv, books[s, k]):
                    acc = acc + (x - y) * (x - y)
                if bd is None or acc < bd:
                    best, bd = k, acc
            codes.append(best)
        out[i] = codes
    return out


def test_encode_matches_python_argmin(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 8))
    books = _books(2, 4, 4)
    cb = pq_codebook_df(spark, books)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_corpus(spark, mat), cb, m=2, dsub=4).collect()
    }
    assert got == _py_encode(mat, books)


def test_zero_distortion_roundtrip_and_adc(spark):
    # corpus vectors ARE codebook concatenations: encode must recover
    # the construction codes and ADC must rank the exact query match
    # first with distance 0
    books = _books(2, 4, 3)
    mat = np.array(
        [np.concatenate([books[0, a], books[1, b]]) for a in range(4) for b in range(4)]
    )
    cb = pq_codebook_df(spark, books)
    codes = pq_encode(_corpus(spark, mat), cb, m=2, dsub=3)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert got == {i: [i // 4, i % 4] for i in range(16)}
    top = pq_adc_topk(codes, cb, [float(x) for x in mat[9]], k=3).collect()
    assert top[0]["vec_id"] == 9 and top[0]["adc_dist"] == 0.0


def test_adc_matches_python_lut_sums_exactly(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(30, 8))
    books = _books(2, 4, 4)
    cb = pq_codebook_df(spark, books)
    codes = pq_encode(_corpus(spark, mat), cb, m=2, dsub=4)
    q = [float(x) for x in rng.normal(size=8)]
    got = {r["vec_id"]: r["adc_dist"] for r in pq_adc_topk(codes, cb, q, k=30).collect()}
    pyc = _py_encode(mat, books)
    want = {}
    for i, cs in pyc.items():
        acc = 0.0
        for s, c in enumerate(cs):
            sub = 0.0
            for x, y in zip(q[s * 4 : s * 4 + 4], books[s, c]):
                sub = sub + (x - y) * (x - y)
            acc = acc + sub
        want[i] = acc
    assert got == want


def test_training_reduces_distortion(spark):
    # 4 well-separated clusters per subspace: trained codebooks must
    # beat the arithmetic ones on recall@1 of brute-force neighbors
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=4.0, size=(4, 8))
    mat = np.vstack([c + rng.normal(scale=0.05, size=(10, 8)) for c in centers])
    corpus = _corpus(spark, mat)
    books = train_pq_codebooks(corpus, m=2, ksub=4, iters=2, seed=5)
    cb = pq_codebook_df(spark, books)
    codes = pq_encode(corpus, cb, m=2, dsub=4)
    q = [float(x) for x in mat[7] + 0.01]
    top = pq_adc_topk(codes, cb, q, k=10).collect()
    true_d = ((mat - np.asarray(q)) ** 2).sum(axis=1)
    true_top10 = set(np.argsort(true_d, kind="stable")[:10])
    got = {r["vec_id"] for r in top}
    # the whole cluster of vec 7 (ids 0..9) must be retrieved
    assert len(got & true_top10) >= 8


def test_encode_partitioning_invariant_and_validation(spark):
    rng = np.random.default_rng(13)
    mat = rng.normal(size=(50, 8))
    books = _books(4, 4, 2)
    cb = pq_codebook_df(spark, books)
    df = _corpus(spark, mat)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cb, 4, 2).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df.repartition(7), cb, 4, 2).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        pq_encode(df, cb, 0, 2)
    with pytest.raises(ValueError):
        pq_adc_topk(pq_encode(df, cb, 4, 2), cb, [0.0] * 8, k=0)
    with pytest.raises(ValueError):
        train_pq_codebooks(_corpus(spark, rng.normal(size=(10, 9))), m=2)
