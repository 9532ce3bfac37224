"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
mapInPandas pipelines — is real and tested. Decoding is REAL for the
dependency-free raster formats this container can parse without image
libraries: binary PPM (P6), PGM (P5) and uncompressed 24-bit BI_RGB BMP
are decoded to pixels and feature-extracted (dimensions, channel stats,
luminance histogram). Other payloads fall back to ``_decode_image_stub``
(deterministic digest pseudo-features) so the pipeline shape is exercised
for every kind; on a full cluster image, swap the fallback for
PIL/torchaudio/ffmpeg calls — the signatures and batch shapes do not
change. Malformed payloads of a recognized format surface as
``decode_error`` rows, the same path a real decoder's rejects take.
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


def _parse_pnm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) -> uint8 array of shape
    (h, w, channels). Header: magic, then width/height/maxval tokens
    separated by whitespace with ``#`` comments, one whitespace byte, then
    the raster. 8-bit maxval only (the common case; 16-bit rejects)."""
    magic = b[:2]
    toks: list[bytes] = []
    i = 2
    n = len(b)
    while len(toks) < 3:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            j = b.find(b"\n", i)
            if j < 0:
                raise ValueError("truncated PNM header")
            i = j + 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the raster
    try:
        w, h, maxv = (int(t) for t in toks)
    except ValueError:
        raise ValueError("non-numeric PNM header") from None
    if w <= 0 or h <= 0 or maxv <= 0:
        raise ValueError("bad PNM dimensions")
    if maxv > 255:
        raise ValueError("16-bit PNM unsupported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = b[i : i + need]
    if len(raster) < need:
        raise ValueError("truncated PNM raster")
    return np.frombuffer(raster, np.uint8).reshape(h, w, ch)


def _parse_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER) -> uint8 RGB array
    of shape (h, w, 3). Rows are 4-byte aligned; positive height means
    bottom-up storage."""
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raster = b[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    a = np.frombuffer(raster, np.uint8).reshape(h, stride)[:, : w * 3]
    a = a.reshape(h, w, 3)
    if flip:
        a = a[::-1]
    return a[..., ::-1]  # BGR -> RGB


def _features_of(img: np.ndarray) -> np.ndarray:
    """Pixel-derived FEATURE_DIM vector: [w, h, channels, mean, std, min,
    max (sample stats /255), aspect, 8-bin normalized histogram]."""
    h, w, ch = img.shape
    flat = img.reshape(-1).astype(np.float64)
    hist = np.histogram(flat, bins=8, range=(0.0, 256.0))[0] / flat.size
    return np.array(
        [
            w,
            h,
            ch,
            flat.mean() / 255.0,
            flat.std() / 255.0,
            flat.min() / 255.0,
            flat.max() / 255.0,
            w / h,
            *hist,
        ],
        dtype=np.float32,
    )


def payload_features(payload: bytes) -> np.ndarray:
    """Decode + feature-extract one payload: real pixel features for
    PPM/PGM/BMP, digest pseudo-features for anything else. Raises
    NotImplementedError (no decoder) or ValueError (malformed media) —
    both surface as ``decode_error`` rows in :func:`decode_media`."""
    if payload[:2] in (b"P5", b"P6"):
        return _features_of(_parse_pnm(payload))
    if payload[:2] == b"BM":
        return _features_of(_parse_bmp(payload))
    return _decode_image_stub(payload)


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (3-channel) / P5 (1-channel) binary writer for tests/synth."""
    h, w, ch = img.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """Bottom-up 24-bit BI_RGB BMP writer for tests/synth."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        raster += line + b"\x00" * (stride - len(line))
    size = 54 + len(raster)
    return (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
        + bytes(raster)
    )


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
                    feats[i] = payload_features(b).tolist()
                except NotImplementedError as e:
                    errs[i] = f"NotImplemented: {e}"
                except ValueError as e:
                    errs[i] = f"BadMedia: {e}"
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
        if kind == "image":
            # real raster payloads (decoded for real downstream): cycle
            # P6 / P5 / BMP with deterministic per-image pixel noise
            w, h = r.randint(4, 24), r.randint(4, 24)
            fmt = (i // 3) % 3
            ch = 1 if fmt == 1 else 3
            img = np.array(
                [r.randrange(256) for _ in range(w * h * ch)], dtype=np.uint8
            ).reshape(h, w, ch)
            payload = encode_bmp(img) if fmt == 2 else encode_ppm(img)
        else:
            payload = bytes(r.getrandbits(8) for _ in range(r.randint(0, 256)))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/x-portable-anymap", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": w if kind == "image" else None,
                "height": h if kind == "image" else None,
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
