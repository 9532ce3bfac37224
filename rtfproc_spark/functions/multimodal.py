"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
mapInPandas pipelines — is real and tested; the actual codec work is STUBBED
(no image/audio libraries in this container) behind ``_decode_image_stub``,
which produces a deterministic fake so tests can assert shapes end-to-end.
On a real cluster, swap the stub for PIL/torchaudio/ffmpeg calls — the
signatures and batch shapes do not change.
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),  # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),  # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(FloatType())),  # extracted features
        StructField("decode_error", StringType()),
    ]
)

FEATURE_DIM = 16


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode+feature-extract: deterministic pseudo-features from the
    payload digest. Replace with a real decoder on a full cluster image.

    Raises NotImplementedError for payloads that a real decoder would reject
    (here: empty payloads), so the error-column path is exercised.
    """
    if not payload:
        raise NotImplementedError("real decoder required for empty payload")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode/feature pipeline over MEDIA_SCHEMA-shaped input.

    Arrow-batched; each batch is processed columnar-first (hashes + features
    vectorized per batch), one output row per input row.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            feats: list = [None] * n
            errs: list = [None] * n
            shas: list = [None] * n
            nbytes = np.zeros(n, dtype="int32")
            payloads = pdf["payload"]
            for i, p in enumerate(payloads):
                b = bytes(p) if p is not None else b""
                nbytes[i] = len(b)
                shas[i] = hashlib.sha256(b).hexdigest()
                try:
                    feats[i] = _decode_image_stub(b).tolist()
                except NotImplementedError as e:
                    errs[i] = f"NotImplemented: {e}"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "sha256": shas,
                    "features": feats,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(process, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset —
    pure Spark (sequence + explode), ready for a decode UDF downstream."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ms", "payload")
    )


def synth_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table for tests/bench."""
    import random

    r = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(r.getrandbits(8) for _ in range(r.randint(0, 256)))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 if kind == "image" else None,
                "height": 64 if kind == "image" else None,
                "duration_ms": 5000 if kind != "image" else None,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["media_id"] = pdf["media_id"].astype("int64")
    # plain object columns with None (pandas nullable Int32 is rejected by
    # createDataFrame in sessions without Arrow-nullable support)
    for c in ("width", "height", "duration_ms"):
        pdf[c] = pd.Series(
            [int(v) if pd.notna(v) else None for v in pdf[c]], dtype=object
        )
    return pdf
