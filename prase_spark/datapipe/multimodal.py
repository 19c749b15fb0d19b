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


_PROBE_SCHEMA = "media_id LONG, fmt STRING, width INT, height INT"


def probe_media_metadata(media: DataFrame) -> DataFrame:
    """(media row) -> (media_id, fmt, width, height) with REAL dimensions
    parsed from the payload's container header (probe_image_header). Arrow-
    batched, row-local, parallelism-invariant — replaces the declared-stub
    metadata for formats whose headers are self-describing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["payload"].map(probe_image_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": probed.map(lambda t: t[0]),
                    "width": probed.map(lambda t: t[1]).astype("Int32"),
                    "height": probed.map(lambda t: t[2]).astype("Int32"),
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
