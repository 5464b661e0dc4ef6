"""Multimodal column plumbing (task mandate): image/audio/video as opaque
``binary`` columns + typed metadata, with decode/feature kernels as
Arrow-batched stages.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded fake decoder produces
stable features so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _real_decode(content: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "container; wire Pillow/torchaudio here in production"
    )


def _fake_decode(content: bytes, media_type: str) -> np.ndarray:
    """Deterministic fake: features from the md5 of the bytes — exercises
    the full Arrow path with stable outputs."""
    h = hashlib.md5(content or b"").digest()
    vals = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                         dtype=np.uint32).astype(np.float64)
    return (vals / 2**32).astype(np.float32)


def extract_media_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, media_type, n_bytes, features).

    mapInPandas, map-side only; at scale partition the media table by
    bucket(media_id) and cap ``arrow.maxRecordsPerBatch`` so a batch of
    blobs fits executor memory (binary payloads dominate).
    """
    decode = _fake_decode if deterministic_fake else _real_decode
    src = media.select("media_id", "media_type", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for content, mtype in zip(pdf["content"].values, pdf["media_type"].values):
                raw = bytes(content) if content is not None else b""
                nbytes.append(len(raw))
                feats.append(decode(raw, mtype).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    return src.mapInPandas(run, schema=_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — pure expressions; the actual frame decode is the stubbed kernel."""
    return media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic synthetic media table for tests/bench."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        content = hashlib.md5(f"media:{i}".encode()).digest() * (8 + i % 5)
        rows.append(
            (
                f"m{i:06d}", f"https://media.example.org/{i}", mtype, bytearray(content),
                64 + i % 512 if mtype == "image" else None,
                64 + (i * 7) % 512 if mtype == "image" else None,
                (1000 + i * 37) if mtype in ("audio", "video") else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
