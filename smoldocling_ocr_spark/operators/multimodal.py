"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with struct metadata —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is stubbed behind
deterministic fakes because no image/audio libraries exist in this
container (task contract: stub the decode, keep the plumbing real).

Ops:
* ``probe_media``      — sniff container format + dimensions from magic bytes
                         (real: PNG/JPEG/GIF headers parsed without a codec)
* ``decode_image``     — stub: raises NotImplementedError inside a clearly
                         marked branch; deterministic fake under ``fake=True``
* ``extract_features`` — mapInPandas over binary batches → fixed-width float
                         vector per row (deterministic fake: byte histogram)
* ``frame_sample``     — UDTF-shaped: one media row → N frame rows (offsets
                         computed for real; frame bytes are zero-stubs)
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 64


def sniff_media(payload: bytes) -> tuple[str, int | None, int | None]:
    """Parse container magic + dimensions from headers (no codec needed)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        width, height = _struct.unpack(">II", payload[16:24])
        return "png", int(width), int(height)
    if payload[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to SOF0/SOF2
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC2):
                height, width = _struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", int(width), int(height)
            seg_len = _struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        width, height = _struct.unpack("<HH", payload[6:10])
        return "gif", int(width), int(height)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav", None, None
    return "unknown", None, None


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode to an HxWx3 array.

    STUB: real decoding needs an image codec (PIL/libjpeg) that is not in
    this container. ``fake=True`` returns a deterministic byte-derived array
    with the sniffed dimensions so downstream shape logic is testable.
    """
    fmt, width, height = sniff_media(payload)
    if not fake:
        raise NotImplementedError(
            f"image decode for format={fmt!r} requires an image codec; "
            "ship PIL via --py-files in a full deployment"
        )
    w = min(width or 8, 32)
    h = min(height or 8, 32)
    seed = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8).astype(np.float32)
    grid = np.resize(seed, (h, w, 3))
    return grid


def probe_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary column → media metadata struct (Arrow-batched, header-only)."""
    meta_schema = MEDIA_META_SCHEMA

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf["key"], pdf[media_col]):
                b = bytes(payload)
                fmt, width, height = sniff_media(b)
                rows.append(
                    {"key": key, "format": fmt, "width": width, "height": height, "bytes": len(b)}
                )
            yield pd.DataFrame(rows, columns=["key", "format", "width", "height", "bytes"])

    schema = T.StructType([T.StructField("key", T.StringType(), False)] + list(meta_schema.fields))
    return df.select(F.col("key"), F.col(media_col)).mapInPandas(probe, schema=schema)


def extract_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary column → array<float> feature vector (deterministic fake:
    64-bin normalized byte histogram; the Arrow plumbing is the real part)."""

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf["key"], pdf[media_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                rows.append({"key": key, "features": (hist / total).astype(np.float32).tolist()})
            yield pd.DataFrame(rows, columns=["key", "features"])

    return df.select(F.col("key"), F.col(media_col)).mapInPandas(featurize, schema=schema)


def frame_sample(df: DataFrame, media_col: str = "media", n_frames: int = 4) -> DataFrame:
    """One media row → n frame rows with computed byte offsets (UDTF shape).
    Frame payloads are zero-stubs; offsets/indices are real."""

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("byte_offset", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf["key"], pdf[media_col]):
                size = len(bytes(payload))
                for idx in range(n_frames):
                    rows.append(
                        {
                            "key": key,
                            "frame_idx": idx,
                            "byte_offset": (size * idx) // n_frames,
                            "frame": b"",  # STUB: codec required for real frames
                        }
                    )
            yield pd.DataFrame(rows, columns=["key", "frame_idx", "byte_offset", "frame"])

    return df.select(F.col("key"), F.col(media_col)).mapInPandas(sample, schema=schema)
