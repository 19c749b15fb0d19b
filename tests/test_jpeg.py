"""Baseline JPEG decode (datapipe.multimodal.decode_jpeg, VERDICT r4 ask
#4): byte-exact vs an INDEPENDENT scalar decoder written in this file
(plain-Python bit reader, dict Huffman walk, definitional quadruple-loop
IDCT with math.cos — shares no code or tables with the production numpy
implementation), exact round trip on per-block-constant input, sampling/
restart/edge coverage, and the declared progressive boundary."""

import math

import numpy as np
import pytest

from prase_spark.datapipe.multimodal import decode_jpeg, decode_real
from prase_spark.fixtures import synth_jpeg

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _scalar_decode(b):
    """Minimal independent baseline-JPEG decoder: gray or 4:4:4 color,
    no restarts — pure Python scalars end to end."""
    assert b[0:2] == b"\xff\xd8"
    i, qt, huff, frame, scan_pos, scan = 2, {}, {}, None, None, None
    while True:
        assert b[i] == 0xFF
        m = b[i + 1]
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + ln]
        if m == 0xDB:
            p = 0
            while p < len(seg):
                tid = seg[p] & 15
                assert seg[p] >> 4 == 0
                qt[tid] = [seg[p + 1 + j] for j in range(64)]  # zigzag order
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                vals = list(seg[p + 17 : p + 17 + sum(bits)])
                tab, code, k = {}, 0, 0
                for L in range(1, 17):
                    for _ in range(bits[L - 1]):
                        tab[(L, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = tab
                p += 17 + sum(bits)
        elif m == 0xC0:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                assert hv == 0x11, "scalar twin: 4:4:4 / gray only"
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif m == 0xDA:
            scan = {seg[1 + 2 * c]: (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(seg[0])}
            scan_pos = i + 2 + ln
            break
        i += 2 + ln

    h, w, comps = frame
    pos, bit = scan_pos, 0

    def read_bit():
        nonlocal pos, bit
        v = (b[pos] >> (7 - bit)) & 1
        bit += 1
        if bit == 8:
            bit = 0
            pos += 2 if b[pos] == 0xFF else 1
        return v

    def huff_sym(tab):
        code, L = 0, 0
        while True:
            code = (code << 1) | read_bit()
            L += 1
            if (L, code) in tab:
                return tab[(L, code)]

    def receive_extend(s):
        v = 0
        for _ in range(s):
            v = (v << 1) | read_bit()
        if s and v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    bh, bw = -(-h // 8), -(-w // 8)
    planes = {cid: [[0.0] * (bw * 8) for _ in range(bh * 8)] for cid, _ in comps}
    pred = {cid: 0 for cid, _ in comps}
    for my in range(bh):
        for mx in range(bw):
            for cid, tq in comps:
                dct, act = scan[cid]
                zz = [0] * 64
                s = huff_sym(huff[(0, dct)])
                pred[cid] += receive_extend(s)
                zz[0] = pred[cid]
                k = 1
                while k < 64:
                    sym = huff_sym(huff[(1, act)])
                    if sym == 0:
                        break
                    run, size = sym >> 4, sym & 15
                    if size == 0:
                        k += 16
                        continue
                    k += run
                    zz[k] = receive_extend(size)
                    k += 1
                # dequant + dezigzag into natural order
                coef = [0] * 64
                for j in range(64):
                    coef[_ZZ[j]] = zz[j] * qt[tq][j]
                # definitional 2-D IDCT, quadruple scalar loop
                for y in range(8):
                    for x in range(8):
                        acc = 0.0
                        for u in range(8):
                            for v in range(8):
                                au = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
                                av = math.sqrt(0.125) if v == 0 else math.sqrt(0.25)
                                acc += (
                                    au * av * coef[u * 8 + v]
                                    * math.cos((2 * y + 1) * u * math.pi / 16)
                                    * math.cos((2 * x + 1) * v * math.pi / 16)
                                )
                        planes[cid][my * 8 + y][mx * 8 + x] = acc + 128.0

    out = [[[0, 0, 0] for _ in range(w)] for _ in range(h)]
    for y in range(h):
        for x in range(w):
            if len(comps) == 1:
                g = planes[comps[0][0]][y][x]
                val = min(255, max(0, int(math.floor(g + 0.5))))
                out[y][x] = [val, val, val]
            else:
                yy = planes[1][y][x]
                cb = planes[2][y][x] - 128.0
                cr = planes[3][y][x] - 128.0
                for c, v in enumerate(
                    (yy + 1.402 * cr, yy - 0.344136 * cb - 0.714136 * cr, yy + 1.772 * cb)
                ):
                    out[y][x][c] = min(255, max(0, int(math.floor(v + 0.5))))
    return np.array(out, dtype=np.uint8)


def test_gray_byte_exact_vs_scalar_twin():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (9, 14), dtype=np.uint8)
    blob = synth_jpeg(img)
    assert np.array_equal(decode_jpeg(blob), _scalar_decode(blob))


def test_color_444_byte_exact_vs_scalar_twin():
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (16, 11, 3), dtype=np.uint8)
    blob = synth_jpeg(img)  # default 4:4:4
    assert np.array_equal(decode_jpeg(blob), _scalar_decode(blob))


def test_quant_table_byte_exact_vs_scalar_twin():
    """Non-trivial quant tables flow through DQT -> dequant identically."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (10, 10), dtype=np.uint8)
    q = (rng.randint(1, 20, (8, 8))).astype(np.int64)
    blob = synth_jpeg(img, qluma=q)
    assert np.array_equal(decode_jpeg(blob), _scalar_decode(blob))


def test_block_constant_round_trip_exact():
    """Per-8x8-block-constant input + all-ones quant: only the exact
    integer DC survives, so decode returns the source pixels EXACTLY —
    the property the multimodal_decode gate's arithmetic oracle uses."""
    h, w = 21, 13
    img = np.array(
        [[(7 * 11 + (y // 8) * 5 + (x // 8) * 3) % 256 for x in range(w)]
         for y in range(h)],
        dtype=np.uint8,
    )
    dec = decode_jpeg(synth_jpeg(img))
    assert np.array_equal(dec, np.repeat(img[:, :, None], 3, axis=2))


def test_subsampling_restarts_and_fidelity():
    y, x = np.meshgrid(np.arange(24), np.arange(16), indexing="ij")
    img = np.stack(
        [(y * 3 + x) % 200, (y + x * 2) % 200, (200 - y * 2 - x) % 200], axis=2
    ).astype(np.uint8)
    for sub, rst in (((2, 2), 0), ((2, 1), 0), ((1, 2), 3), ((2, 2), 1)):
        d = decode_jpeg(synth_jpeg(img, subsample=sub, restart=rst))
        assert d.shape == img.shape
        diff = np.abs(d.astype(int) - img.astype(int))
        assert diff.mean() < 3.0, (sub, rst, diff.mean())


def test_dispatch_and_progressive_boundary():
    img = np.full((8, 8), 77, dtype=np.uint8)
    blob = synth_jpeg(img)
    kind, arr = decode_real(blob, "image")
    assert kind == "image" and arr[0, 0, 0] == 77
    # flip SOF0 -> SOF2: progressive stays a declared NotImplementedError
    prog = bytearray(blob)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(prog))


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; the walk must skip them instead of desynchronizing."""
    img = np.full((8, 8), 123, dtype=np.uint8)
    blob = synth_jpeg(img)
    # inject fill bytes before the DQT marker (right after SOI)
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(blob))
