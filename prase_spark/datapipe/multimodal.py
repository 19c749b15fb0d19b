"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a small metadata struct.
The Spark-side plumbing (schemas, Arrow batch shapes, partition-size
control) is real and tested; the actual codec decode is STUBBED — the
image/audio libraries are not in this container — behind
``decode_stub_features``, a deterministic fake keyed on the payload bytes,
and ``decode_real`` which raises NotImplementedError with the integration
point documented.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

_FEAT_SCHEMA = "media_id LONG, kind STRING, n_bytes LONG, digest STRING, features ARRAY<FLOAT>"


def decode_real(payload: bytes, kind: str):
    """Integration point for real codecs (PIL / torchaudio / pyav).

    Not available in this environment — plug in here; the surrounding
    Spark plumbing (mapInPandas batching, schema, partitioning) is final.
    """
    raise NotImplementedError(
        "codec libraries unavailable in this container; "
        "swap decode_stub_features for a real decoder at deploy time"
    )


def _stub_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector derived from the payload digest —
    stable across runs/partitions, exercises the full pipeline shape."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(bytes(payload)).digest()
    arr = np.frombuffer(digest[: dim * 4], dtype=np.uint32).astype(np.float64)
    arr = arr / np.float64(2**32)
    return [float(x) for x in arr]


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """(media row) -> (media_id, kind, n_bytes, digest, features).

    Arrow-batched mapInPandas; row-local and deterministic, so output is
    identical at any parallelism (same invariant as text extraction)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "digest": payloads.map(
                        lambda b: "" if b is None else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": payloads.map(lambda b: _stub_features(b, dim)),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, _FEAT_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def probe_image_header(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """True (format, width, height) from container headers — pure-Python
    byte parsing, NO codec libraries: PNG IHDR (spec: 8-byte signature,
    first chunk IHDR carries BE width/height), JPEG SOFn segment scan
    (height/width follow the 1-byte precision in any start-of-frame
    marker), GIF logical screen descriptor (LE), RIFF/WAVE container tag.
    Pixel DECODE still requires real codecs (decode_real); header metadata
    is fully real."""
    if payload is None:
        return (None, None, None)
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        return ("png", int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big"))
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return ("wav", None, None)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 3 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            m = b[i + 1]
            if m == 0xFF:
                i += 1
                continue
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:  # standalone markers
                i += 2
                continue
            if m in _JPEG_SOF and i + 9 <= len(b):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return ("jpeg", None, None)
    return (None, None, None)


def probe_webp_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """WEBP dimensions from the container (RIFF spec + VP8/VP8L/VP8X
    bitstream headers) — pure byte parsing:

    - VP8X (extended): 24-bit LE canvas width-1 / height-1 at offsets
      24 / 27,
    - 'VP8 ' (lossy): 14-bit LE width/height after the 9D 01 2A sync code,
    - VP8L (lossless): 14-bit fields packed after the 0x2F signature."""
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return (None, None, None)
    four = b[12:16]
    if four == b"VP8X" and len(b) >= 30:
        w = 1 + int.from_bytes(b[24:27], "little")
        h = 1 + int.from_bytes(b[27:30], "little")
        return ("webp", w, h)
    if four == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
        w = int.from_bytes(b[26:28], "little") & 0x3FFF
        h = int.from_bytes(b[28:30], "little") & 0x3FFF
        return ("webp", w, h)
    if four == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
        bits = int.from_bytes(b[21:25], "little")
        return ("webp", 1 + (bits & 0x3FFF), 1 + ((bits >> 14) & 0x3FFF))
    return ("webp", None, None)


def probe_wav_duration_ms(payload: bytes | None) -> int | None:
    """REAL WAV duration from the RIFF chunk walk: byte rate from the
    'fmt ' chunk, payload size from the 'data' chunk header —
    duration_ms = data_bytes * 1000 // byte_rate. No audio decode."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, byte_rate, data_size = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 20 <= len(b):
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return int(data_size * 1000 // byte_rate)
    return None


def probe_container(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None]:
    """(fmt, width, height, duration_ms) across every self-describing
    container the pure-Python prober understands: PNG/JPEG/GIF (via
    probe_image_header), WEBP (VP8/VP8L/VP8X), BMP, WAV (with REAL
    duration). Pixel/sample decode remains the declared stub."""
    if payload is None:
        return (None, None, None, None)
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        fmt, w, h = probe_webp_header(b)
        return (fmt, w, h, None)
    if b[:2] == b"BM" and len(b) >= 26:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return ("bmp", abs(w), abs(h))[0:3] + (None,)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return ("wav", None, None, probe_wav_duration_ms(b))
    fmt, w, h = probe_image_header(b)
    return (fmt, w, h, None)


_PROBE_SCHEMA = "media_id LONG, fmt STRING, width INT, height INT, duration_ms INT"


def probe_media_metadata(media: DataFrame) -> DataFrame:
    """(media row) -> (media_id, fmt, width, height, duration_ms) with
    REAL metadata parsed from the payload's container header
    (probe_container: PNG/JPEG/GIF/WEBP/BMP dims, WAV duration). Arrow-
    batched, row-local, parallelism-invariant — replaces the declared-stub
    metadata for formats whose headers are self-describing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["payload"].map(probe_container)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": probed.map(lambda t: t[0]),
                    "width": probed.map(lambda t: t[1]).astype("Int32"),
                    "height": probed.map(lambda t: t[2]).astype("Int32"),
                    "duration_ms": probed.map(lambda t: t[3]).astype("Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, _PROBE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    computed natively from duration metadata; the decode of each frame is
    the stubbed step. Shows the explode-shaped plumbing for frame-level ops."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
