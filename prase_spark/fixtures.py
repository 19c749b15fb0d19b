"""Deterministic synthetic fixtures (seed=42) — FIXTURES.md §1/§2.

Two aligned KGs shaped like the reference's D-W-15K inputs (URI prefix swap,
edge dropout, literal perturbation) plus a Common-Crawl-style page corpus
whose text embeds extractable facts via the extract.py pattern bank.
No external data; everything derives from the seed.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from prase_spark.schemas import PAGES, RAW_TRIPLES

KG1_ENT = "http://a.org/resource/E{i}"
KG2_ENT = "http://b.org/entity/Q{i}"
KG1_PRED = "http://a.org/ontology/p{j}"
KG2_PRED = "http://b.org/prop/direct/P{j}"
KG1_ATTR = "http://a.org/ontology/attr{j}"
KG2_ATTR = "http://b.org/prop/direct/A{j}"


def _kg_facts(
    rng: random.Random,
    n_ent: int = 300,
    n_pred: int = 12,
    n_attr: int = 8,
    avg_deg: int = 4,
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int, str]]]:
    """Shared fact skeleton: relation facts (head, pred, tail) and attribute
    facts (ent, attr, literal_value). Literals are mostly entity-unique so
    the literal-seed join (objects/KGs.py:53-58) can bootstrap PARIS."""
    rel_facts = []
    for h in range(n_ent):
        for _ in range(rng.randint(2, avg_deg + 2)):
            t = rng.randrange(n_ent)
            if t == h:
                continue
            rel_facts.append((h, rng.randrange(n_pred), t))
    attr_facts = []
    shared_pool = [f"city-{k}" for k in range(10)]  # ambiguous values (hub literals)
    for e in range(n_ent):
        attr_facts.append((e, 0, f"uniq-name-{e:05d}"))
        attr_facts.append(
            (e, 1, f'"19{50 + e % 50}-0{1 + e % 9}-1{e % 9}"^^<http://www.w3.org/2001/XMLSchema#date>')
        )
        if e % 3 == 0:
            attr_facts.append((e, 2 + e % (max(1, 6)), rng.choice(shared_pool)))
    return rel_facts, attr_facts


def two_kg_fixture(
    spark: SparkSession,
    n_ent: int = 300,
    seed: int = 42,
    dropout: float = 0.1,
    perturb: float = 0.05,
) -> dict:
    """Returns dict with raw_l / raw_r (RAW_TRIPLES DataFrames), gold name
    pairs, and per-side embedding rows keyed by entity name."""
    rng = random.Random(seed)
    rel_facts, attr_facts = _kg_facts(rng, n_ent=n_ent)

    def rows(ent_fmt, pred_fmt, attr_fmt, drop_rng, pert_rng, wrap_ent):
        out = []
        for h, p, t in rel_facts:
            if drop_rng.random() < dropout:
                continue
            out.append((wrap_ent(ent_fmt.format(i=h)), pred_fmt.format(j=p), wrap_ent(ent_fmt.format(i=t)), False))
        for e, a, v in attr_facts:
            if pert_rng.random() < perturb:
                v = v + "-PERTURBED"
            out.append((wrap_ent(ent_fmt.format(i=e)), attr_fmt.format(j=a), v, True))
        return out

    # KG1 keeps everything; KG2 applies dropout+perturbation (FIXTURES.md §2).
    none_rng = random.Random(7)  # consumed but never drops for KG1

    class NoDrop:
        @staticmethod
        def random():
            return 1.0

    rows_l = rows(KG1_ENT, KG1_PRED, KG1_ATTR, NoDrop, NoDrop, lambda s: f"<{s}>")
    rows_r = rows(KG2_ENT, KG2_PRED, KG2_ATTR, random.Random(seed + 1), random.Random(seed + 2), lambda s: s)
    del none_rng
    raw_l = spark.createDataFrame(rows_l, RAW_TRIPLES)
    raw_r = spark.createDataFrame(rows_r, RAW_TRIPLES)
    gold_names = [(f"<{KG1_ENT.format(i=i)}>", KG2_ENT.format(i=i)) for i in range(n_ent)]

    np_rng = np.random.default_rng(seed)
    base = np_rng.normal(size=(n_ent, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = np_rng.normal(size=(n_ent, 16)) * 0.3
    right = base + noise
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    emb_l = [(f"<{KG1_ENT.format(i=i)}>", [float(x) for x in base[i]]) for i in range(n_ent)]
    emb_r = [(KG2_ENT.format(i=i), [float(x) for x in right[i]]) for i in range(n_ent)]
    return {
        "raw_l": raw_l,
        "raw_r": raw_r,
        "gold_names": gold_names,
        "emb_l_names": emb_l,
        "emb_r_names": emb_r,
    }


# --- page corpus whose text embeds extractable facts (extract.py patterns) ---

_PAGE_TEMPLATE = (
    "<html><head><title>{title}</title>"
    "<script>var x = 1;</script><style>.a{{color:red}}</style></head>"
    "<body><h1>{title}</h1><p>{body}</p></body></html>"
)


def pages_fixture(spark: SparkSession, n_pages: int = 200, seed: int = 42) -> tuple[DataFrame, list]:
    """Synthesize pages + the exact expected triple set.

    Facts use the extract.py pattern bank; html wraps the text so that
    html_to_text(html) == text byte-identically (input_hint invariant).
    """
    rng = random.Random(seed)
    people = [f"Person_{i}" for i in range(n_pages)]
    cities = [f"City_{i}" for i in range(30)]
    orgs = [f"Org_{i}" for i in range(40)]
    rows, expected = [], []
    for i in range(n_pages):
        subj = people[i]
        city = cities[rng.randrange(len(cities))]
        org = orgs[rng.randrange(len(orgs))]
        year = 1900 + rng.randrange(120)
        sents = [
            f"{subj} was born in {city} .",
            f"{subj} works for {org} .",
            f"{subj} is a Researcher .",
            f"{subj} 's birthyear is \"{year}\" .",
        ]
        rng.shuffle(sents)
        filler = f"Lorem ipsum dolor sit amet {i} consectetur."
        body = f"Page {i} . " + " ".join(sents) + " " + filler
        html = _PAGE_TEMPLATE.format(title=f"Page {i}", body=body).encode("utf-8")
        # canonical text IS the deterministic extraction of the html
        # (input_hint: byte-identical extracted text per url)
        from prase_spark.extract import html_to_text

        text = html_to_text(html)
        url = f"https://example.org/page/{i}"
        ts = datetime(2024, 1, 1 + (i % 28), tzinfo=timezone.utc)
        rows.append((url, ts, bytearray(html), text, "en"))
        expected += [
            (url, subj, "bornIn", city, False),
            (url, subj, "employer", org, False),
            (url, subj, "type", "Researcher", False),
            (url, subj, "birthyear", str(year), True),
        ]
    pages = spark.createDataFrame(rows, PAGES)
    return pages, expected


def synthetic_kg_distributed(
    spark: SparkSession,
    n_ent: int,
    kg: int = 1,
    avg_deg: int = 4,
    n_pred: int = 24,
    dropout: float = 0.1,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side two-KG synthesis for benchmark-scale alignment runs
    (RAW_TRIPLES schema). Same recipe as two_kg_fixture — KG2 is a renamed
    copy with deterministic edge dropout and rare literal perturbation —
    but generated per-entity on executors, so 10^6+ entities are cheap.

    Deterministic per (entity id, kg): edges/attrs derive from hash-seeded
    per-entity RNGs using the SHARED skeleton seed, so KG1 and KG2 agree on
    the underlying facts; only dropout/perturbation differ by kg."""
    import pandas as pd

    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ent_fmt = "<http://a.org/resource/E{i}>" if kg == 1 else "http://b.org/entity/Q{i}"
    pred_fmt = "http://a.org/ontology/p{j}" if kg == 1 else "http://b.org/prop/direct/P{j}"
    attr_fmt = "http://a.org/ontology/attr{j}" if kg == 1 else "http://b.org/prop/direct/A{j}"

    def gen(batches):
        for pdf in batches:
            subj, pred, obj, is_attr = [], [], [], []
            for h in pdf["id"]:
                h = int(h)
                skel = random.Random(h * 1000003 % (2**31))          # shared skeleton
                side = random.Random((h * 7919 + kg) % (2**31))      # per-kg dropout
                h_name = ent_fmt.format(i=h)
                for _ in range(skel.randint(2, avg_deg + 2)):
                    t = skel.randrange(n_ent)
                    p = skel.randrange(n_pred)
                    if t == h:
                        continue
                    if kg == 2 and side.random() < dropout:
                        continue
                    subj.append(h_name)
                    pred.append(pred_fmt.format(j=p))
                    obj.append(ent_fmt.format(i=t))
                    is_attr.append(False)
                # unique literal bootstraps the seed join; rare perturbation
                lit = f"uniq-name-{h:09d}"
                if kg == 2 and side.random() < 0.05:
                    lit += "-PERTURBED"
                subj.append(h_name)
                pred.append(attr_fmt.format(j=0))
                obj.append(lit)
                is_attr.append(True)
                # shared date literal: moderately hubby (each date shared by
                # ~n_ent/40k entities) — exercises skew paths without
                # quadratic blowup in the benchmark generator
                date = f"{1900 + h % 120}-{1 + (h // 120) % 12:02d}-{1 + (h // 1440) % 28:02d}"
                subj.append(h_name)
                pred.append(attr_fmt.format(j=1))
                obj.append(f'"{date}"^^<http://www.w3.org/2001/XMLSchema#date>')
                is_attr.append(True)
            yield pd.DataFrame({"subj": subj, "pred": pred, "obj": obj, "is_attr": is_attr})

    return spark.range(0, n_ent, 1, n_part).mapInPandas(gen, RAW_TRIPLES)


def synthetic_pages_distributed(
    spark: SparkSession,
    n_pages: int,
    sentences_per_page: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side page synthesis for benchmark-scale corpora (the
    driver-side generator above tops out around 10^4 pages).

    Deterministic per page id (hash-seeded, no global RNG), ~4-6 KB of text
    per page with ~8 extractable facts — Common-Crawl-ish body sizes so
    throughput measurements are compute-bound, not overhead-bound.
    """
    import pandas as pd

    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches):
        for pdf in batches:
            rows_out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random(i * 2654435761 % (2**31))
                subj = f"Person_{i % 50000}"
                sents = []
                for s in range(sentences_per_page):
                    k = rng.randrange(6)
                    if k == 0:
                        sents.append(f"{subj} was born in City_{rng.randrange(500)} .")
                    elif k == 1:
                        sents.append(f"{subj} works for Org_{rng.randrange(2000)} .")
                    elif k == 2:
                        sents.append(f"{subj} is a Researcher .")
                    elif k == 3:
                        sents.append(f'{subj} \'s birthyear is "{1900 + rng.randrange(120)}" .')
                    else:
                        sents.append(
                            "the quick brown fox number "
                            + str(rng.randrange(10**9))
                            + " jumps over the lazy dog while the committee deliberates at length about "
                            + f"Org_{rng.randrange(2000)} and its many subsidiaries in City_{rng.randrange(500)} region"
                        )
                body = " ".join(sents)
                html = _PAGE_TEMPLATE.format(title=f"Page {i}", body=body).encode("utf-8")
                rows_out["url"].append(f"https://example.org/page/{i}")
                rows_out["warc_ts"].append(datetime(2024, 1, 1 + (i % 28), tzinfo=timezone.utc))
                rows_out["html"].append(html)
                # html_to_text over _PAGE_TEMPLATE reduces to exactly
                # "title title body" (title renders twice: <title> + <h1>;
                # script/style drop; the body is single-spaced tag-free
                # text) — the closed form skips three regex passes over
                # ~5 KB/page; equivalence is pinned by
                # tests/test_fixtures_text.py against html_to_text(html).
                rows_out["text"].append(f"Page {i} Page {i} {body}")
                rows_out["lang"].append("en")
            yield pd.DataFrame(rows_out)

    return (
        spark.range(0, n_pages, 1, n_part)
        .mapInPandas(gen, PAGES)
    )


# ---------------------------------------------------------------------------
# Minimal media encoders — deterministic byte-level synthesizers for the
# codec-free decode paths (datapipe.multimodal). These are FIXTURES: they
# exist so tests and gates can round-trip real container bytes through the
# decoders without any codec library; they implement just enough of each
# spec to be decodable by a conforming reader.
# ---------------------------------------------------------------------------

def synth_png(
    img, filters=(0, 1, 2, 3, 4), ctype=2, palette=None, interlace=False, depth=8
) -> bytes:
    """Encode an image as a PNG, applying the given per-row filter types
    cyclically (exercises every unfilter branch downstream).

    - ``ctype``: 0 gray (HxW[x1]), 2 RGB, 3 palette (``img`` = HxW
      indices, ``palette`` = Nx3 uint8), 4 gray+alpha, 6 RGBA;
    - ``depth``: 8, or 1/2/4 for gray/palette (bit-packed MSB-first —
      sub-8-bit rows use filter 0, the common encoder choice);
    - ``interlace``: Adam7 pass layout."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    samples = np.asarray(img).reshape(h, w, ch).astype(np.int32)

    def chunk(cid, data):
        return (
            struct.pack(">I", len(data)) + cid + data
            + struct.pack(">I", zlib.crc32(cid + data))
        )

    def pack_row(vals):
        if depth == 8:
            return vals.astype(np.uint8)
        bits = (
            (vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1
        ).astype(np.uint8).reshape(-1)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
        return np.packbits(bits)

    def encode_rows(sub):
        """Filter one (sub)image (ph x pw x ch) into raw scanline bytes."""
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            return b""
        out = bytearray()
        if depth != 8:
            for y in range(ph):
                out.append(0)
                out.extend(pack_row(sub[y].reshape(-1)).tobytes())
            return bytes(out)
        flat = sub.reshape(ph, pw * ch)
        prev = np.zeros(pw * ch, dtype=np.int32)
        for y in range(ph):
            ft = filters[y % len(filters)]
            line = flat[y]
            a = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
            if ft == 0:
                enc = line
            elif ft == 1:
                enc = (line - a) % 256
            elif ft == 2:
                enc = (line - prev) % 256
            elif ft == 3:
                enc = (line - ((a + prev) // 2)) % 256
            else:  # Paeth (predictors read RAW neighbor bytes per the spec)
                enc = np.zeros(pw * ch, dtype=np.int32)
                for x in range(pw * ch):
                    aa = line[x - ch] if x >= ch else 0
                    bb = prev[x]
                    cc = prev[x - ch] if x >= ch else 0
                    p = aa + bb - cc
                    pa, pb, pc = abs(p - aa), abs(p - bb), abs(p - cc)
                    pred = aa if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                    enc[x] = (line[x] - pred) % 256
            out.append(ft)
            out.extend(enc.astype(np.uint8).tobytes())
            prev = line
        return bytes(out)

    raw = bytearray()
    if interlace:
        adam7 = [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
        for x0, y0, dx, dy in adam7:
            raw.extend(encode_rows(samples[y0::dy, x0::dx]))
    else:
        raw.extend(encode_rows(samples))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if ctype == 3:
        parts.append(chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes()))
    parts += [chunk(b"IDAT", zlib.compress(bytes(raw))), chunk(b"IEND", b"")]
    return b"".join(parts)


def synth_bmp(img, top_down=False) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP
    (4-byte row padding; negative height when top_down)."""
    import struct

    import numpy as np

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = img[:, :, ::-1]  # RGB->BGR
    if not top_down:
        rows = rows[::-1]
    body = bytearray()
    for y in range(h):
        body.extend(rows[y].astype(np.uint8).tobytes())
        body.extend(b"\x00" * (stride - w * 3))
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(body), 0, 0, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + bytes(body)


def synth_wav16(samples_by_channel, rate) -> bytes:
    """Encode float channels in [-1,1] as 16-bit PCM WAV (interleaved)."""
    import struct

    import numpy as np

    nch = len(samples_by_channel)
    inter = np.stack(samples_by_channel, axis=1).reshape(-1)
    data = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synth_wav16_raw(int16_samples, rate) -> bytes:
    """Encode EXACT int16 sample values as 16-bit mono PCM WAV — for
    integer-checksum oracles (no float clip/round on the way in)."""
    import struct

    import numpy as np

    data = np.asarray(int16_samples).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synth_gif(indices, palette, interlace=False, local_table=False) -> bytes:
    """Encode an HxW uint8 index array + palette (Nx3) as a single-frame
    GIF with a REAL LZW compressor (dictionary growth, width bumps,
    4096-entry cap with CLEAR) so decode exercises the full decompressor,
    not just literal codes. ``interlace`` writes rows in the 4-pass
    order; ``local_table`` stores the palette on the image descriptor
    instead of the screen."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    size_field = max(1, (n - 1).bit_length()) - 1  # 2^(field+1) entries
    table_n = 2 << size_field
    pal_bytes = bytes(pal.tobytes()) + b"\x00" * (3 * (table_n - n))
    min_code = max(2, size_field + 1)

    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        stream = idx[order].reshape(-1)
    else:
        stream = idx.reshape(-1)

    # LZW encode (GIF variant)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_bits = []

    def emit(code, width):
        out_bits.append((code, width))

    # width-bump convention matches giflib (and _lzw_decode): check AFTER
    # writing each data code, against the pre-insert next_code — so the
    # decoder's per-code running counter bumps at the same stream offset.
    table = {(i,): i for i in range(clear)}
    next_code, width = clear + 2, min_code + 1
    emit(clear, width)
    seq = ()
    for px in stream.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code, width = clear + 2, min_code + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
    emit(eoi, width)

    # pack bits LSB-first
    acc = bitlen = 0
    data = bytearray()
    for code, wd in out_bits:
        acc |= code << bitlen
        bitlen += wd
        while bitlen >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        data.append(acc & 0xFF)

    # sub-blocks
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    screen_packed = (0x80 | size_field) if not local_table else 0x00
    img_packed = (0x40 if interlace else 0) | ((0x80 | size_field) if local_table else 0)
    parts = [
        b"GIF89a",
        struct.pack("<HHBBB", w, h, screen_packed, 0, 0),
        pal_bytes if not local_table else b"",
        b"\x21\xfe\x05hello\x00",  # comment extension: decoder must skip
        b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, img_packed),
        pal_bytes if local_table else b"",
        bytes([min_code]),
        bytes(blocks),
        b"\x3b",
    ]
    return b"".join(parts)


def synth_jpeg(
    img,
    subsample=(1, 1),
    qluma=None,
    qchroma=None,
    restart=0,
) -> bytes:
    """Encode an HxW (gray) or HxWx3 (RGB) uint8 array as a REAL
    baseline-sequential JFIF JPEG (SOI/DQT/SOF0/DHT/SOS/EOI, canonical
    Huffman tables, bit-stuffed entropy stream) so decode exercises the
    full marker walk + Huffman + dequant + IDCT path, not a canned blob.

    - ``subsample``: (h, v) luma sampling factors; (2, 2) = 4:2:0 chroma
      (box-mean downsample). Gray images always encode one component.
    - ``qluma`` / ``qchroma``: 8x8 quant tables (default all-ones, i.e.
      max quality — with per-8x8-block-CONSTANT input the round trip is
      pixel-exact: only the DC coefficient survives, it is an exact
      integer, and the IDCT of a DC-only block is constant).
    - ``restart``: emit DRI + RSTn every ``restart`` MCUs (0 = never).

    Huffman tables are valid-but-simple: all 12 DC categories at code
    length 5, all 162 AC symbols at code length 8 (canonical, never the
    all-ones code) — legal per T.81 Annex C and deliberately trivial so
    this encoder shares no table data with the decoder under test."""
    import struct

    import numpy as np

    from prase_spark.datapipe.multimodal import _DCT_M, _ZIGZAG

    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    sh, sv = (1, 1) if gray else subsample
    q0 = np.ones((8, 8), dtype=np.int64) if qluma is None else np.asarray(qluma, dtype=np.int64)
    q1 = q0 if qchroma is None else np.asarray(qchroma, dtype=np.int64)

    def _round(a):
        return np.floor(np.asarray(a, dtype=np.float64) + 0.5)

    def _pad(plane, bh, bw):
        ph = -(-plane.shape[0] // bh) * bh
        pw = -(-plane.shape[1] // bw) * bw
        out = np.empty((ph, pw), dtype=np.float64)
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: img.reshape(h, w).astype(np.float64)}
        qmap = {0: q0}
    else:
        rgb = img.astype(np.float64)
        r, g, b_ = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = np.clip(_round(0.299 * r + 0.587 * g + 0.114 * b_), 0, 255)
        cb = np.clip(_round(-0.168736 * r - 0.331264 * g + 0.5 * b_ + 128.0), 0, 255)
        cr = np.clip(_round(0.5 * r - 0.418688 * g - 0.081312 * b_ + 128.0), 0, 255)
        if (sh, sv) != (1, 1):
            def down(p):
                pp = _pad(p, sv, sh)
                return _round(
                    pp.reshape(pp.shape[0] // sv, sv, pp.shape[1] // sh, sh)
                    .mean(axis=(1, 3))
                )
            cb, cr = down(cb), down(cr)
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = {1: y, 2: cb, 3: cr}
        qmap = {0: q0, 1: q1}

    # block-DCT every plane (padded to its own MCU-aligned size)
    hmax, vmax = max(c[1] for c in comps), max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    blocks = {}
    for cid, ch_, cv_, tq in comps:
        p = _pad(planes[cid], mcuy * cv_ * 8, mcux * ch_ * 8)
        coefs = np.empty((p.shape[0] // 8, p.shape[1] // 8, 64), dtype=np.int64)
        for by in range(coefs.shape[0]):
            for bx in range(coefs.shape[1]):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                a = _DCT_M @ blk @ _DCT_M.T
                qz = _round(a / qmap[tq]).astype(np.int64).reshape(64)
                zz = np.empty(64, dtype=np.int64)
                zz[:] = qz[_ZIGZAG]
                coefs[by, bx] = zz
        blocks[cid] = coefs

    # canonical Huffman tables (see docstring)
    dc_bits = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_bits = [0, 0, 0, 0, 0, 0, 0, len(ac_vals), 0, 0, 0, 0, 0, 0, 0, 0]

    def _codes(bits, vals):
        out, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dc_code, ac_code = _codes(dc_bits, dc_vals), _codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    for tid, q in qmap.items():
        # DQT stores the table in zigzag order
        flat = np.empty(64, dtype=np.int64)
        flat[:] = q.reshape(64)[_ZIGZAG]
        seg(0xDB, bytes([tid]) + bytes(int(v) for v in flat))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch_, cv_, tq in comps:
        sof += bytes([cid, (ch_ << 4) | cv_, tq])
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if not gray:  # chroma shares the same simple tables under ids 1
        seg(0xC4, bytes([0x01] + dc_bits) + bytes(dc_vals))
        seg(0xC4, bytes([0x11] + ac_bits) + bytes(ac_vals))
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([len(comps)])
    for cid, *_ in comps:
        tabs = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    bitbuf, nbits = 0, 0

    def put(code, length):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << length) | code
        nbits += length
        while nbits >= 8:
            byte = (bitbuf >> (nbits - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1

    def put_val(v):
        s = int(abs(v)).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                if nbits:  # byte-align with 1-padding per T.81 F.1.2.3
                    put((1 << (8 - nbits)) - 1, 8 - nbits)
                out.extend(bytes([0xFF, 0xD0 + ((n_mcu // restart - 1) % 8)]))
                pred = {cid: 0 for cid, *_ in comps}
            for cid, ch_, cv_, tq in comps:
                # luma and chroma deliberately share the same simple
                # tables (written under both DHT ids — see docstring)
                dcc, acc = dc_code, ac_code
                for by in range(cv_):
                    for bx in range(ch_):
                        zz = blocks[cid][my * cv_ + by, mx * ch_ + bx]
                        diff = int(zz[0]) - pred[cid]
                        pred[cid] = int(zz[0])
                        s, bits = put_val(diff)
                        put(*reversed(dcc[s]))
                        if s:
                            put(bits, s)
                        k, run = 1, 0
                        while k < 64:
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                            else:
                                while run > 15:
                                    put(*reversed(acc[0xF0]))
                                    run -= 16
                                s, bits = put_val(v)
                                put(*reversed(acc[(run << 4) | s]))
                                put(bits, s)
                                run = 0
                            k += 1
                        if run:
                            put(*reversed(acc[0x00]))
            n_mcu += 1
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # pad final byte with 1s
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
