"""Perceptual image hashing: ahash64 integer contract, media_ahash over
REAL decoded payloads, and hamming_pairs banding for multimodal
near-dup."""

from __future__ import annotations

import numpy as np
import pytest

from prase_spark.datapipe.dedup import hamming_pairs
from prase_spark.datapipe.multimodal import ahash64, media_ahash
from prase_spark.fixtures import synth_bmp


def _img(doc, h, w):
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    return ((doc * 13 + y * 7 + x * 3 + c) % 256).astype(np.uint8)


def _py_ahash(img):
    h, w = img.shape[:2]
    ys = [(i * h) // 8 for i in range(8)]
    xs = [(j * w) // 8 for j in range(8)]
    lum = [
        (int(img[y, x, 0]) * 299 + int(img[y, x, 1]) * 587 + int(img[y, x, 2]) * 114)
        // 1000
        for y in ys
        for x in xs
    ]
    mean = sum(lum) // 64
    val = 0
    for k, v in enumerate(lum):
        if v > mean:
            val |= 1 << (63 - k)
    return val - (1 << 64) if val >= (1 << 63) else val


def test_ahash64_matches_scalar_replica():
    for doc, h, w in [(3, 9, 11), (7, 8, 6), (12, 12, 12)]:
        img = _img(doc, h, w)
        assert ahash64(img) == _py_ahash(img)


def _checker(h, w, cell=2):
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    return ((((y // cell) + (x // cell)) % 2) * 255).astype(np.uint8)


def test_ahash_noise_tolerance_and_divergence():
    img = _img(5, 16, 16)
    noisy = img.copy()
    noisy[3, 3] = (noisy[3, 3].astype(int) + 4).astype(np.uint8) % 256
    a, b = ahash64(img), ahash64(noisy)
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 3  # tiny perturbation: near-identical hash
    # brightness invariance is BY DESIGN: the same ramp shifted by a
    # constant hashes identically
    assert ahash64(_img(99, 16, 16)) == a
    # structurally different content (checkerboard vs ramp) diverges
    ham2 = bin((a ^ ahash64(_checker(16, 16))) & ((1 << 64) - 1)).count("1")
    assert ham2 > 3


def test_media_ahash_through_real_bmp_decode(spark):
    rows = []
    for doc in range(6):
        h, w = 8 + doc % 5, 6 + doc % 7
        rows.append((doc, bytearray(synth_bmp(_img(doc, h, w), top_down=doc % 2 == 0))))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r["media_id"]: (r["fmt"], r["ahash"]) for r in media_ahash(df).collect()}
    for doc in range(6):
        h, w = 8 + doc % 5, 6 + doc % 7
        assert got[doc] == ("bmp", _py_ahash(_img(doc, h, w)))


def test_hamming_pairs_banding(spark):
    base = _py_ahash(_img(5, 16, 16))
    near = base ^ (1 << 17) ^ (1 << 50)  # hamming 2
    far = _py_ahash(_checker(16, 16))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "media_id LONG, ahash LONG"
    )
    got = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in hamming_pairs(df).collect()
    }
    assert got == {(1, 2): 2}
    with pytest.raises(ValueError):
        hamming_pairs(df, max_hamming=4)


# --- audio loudness hash -----------------------------------------------------


def _py_lhash(ints):
    n = len(ints)
    if n == 0:
        return 0
    absx = [abs(int(v)) for v in ints]
    bounds = [(k * n) // 64 for k in range(65)]
    segs = []
    for k in range(64):
        lo, hi = bounds[k], bounds[k + 1]
        if hi <= lo:
            hi = lo + 1 if lo < n else n
            lo = min(lo, n - 1)
        segs.append(sum(absx[lo:hi]) // max(hi - lo, 1))
    mean = sum(segs) // 64
    val = 0
    for k, s in enumerate(segs):
        if s > mean:
            val |= 1 << (63 - k)
    return val - (1 << 64) if val >= (1 << 63) else val


def test_lhash64_matches_scalar_replica_and_level_invariance():
    from prase_spark.datapipe.multimodal import lhash64

    rng = np.random.default_rng(4)
    ints = (rng.normal(scale=4000, size=500)).astype(np.int64)
    assert lhash64(ints) == _py_lhash(ints)
    # halving the level keeps the envelope SHAPE: small hamming drift
    a, b = lhash64(ints), lhash64(ints // 2)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 6
    # short clips (n < 64) still hash
    assert lhash64(ints[:10]) == _py_lhash(ints[:10])


def test_media_lhash_through_real_wav_decode(spark):
    from prase_spark.datapipe.multimodal import media_lhash
    from prase_spark.fixtures import synth_wav16_raw

    rows = []
    want = {}
    for doc in range(4):
        n = 64 + doc % 37
        samples = (doc * 31 + np.arange(n) * 7) % 2001 - 1000
        rows.append((doc, bytearray(synth_wav16_raw(samples.astype(np.int16), 8000))))
        want[doc] = ("wav", n, _py_lhash(samples))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {
        r["media_id"]: (r["fmt"], r["n_samples"], r["lhash"])
        for r in media_lhash(df).collect()
    }
    assert got == want
