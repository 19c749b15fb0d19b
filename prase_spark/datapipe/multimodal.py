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
