"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so media bytes never round-trip
through Python row-by-row.

The actual codecs are NOT in this container, so the decode kernel is
stubbed: ``mode='fake'`` produces deterministic md5-derived pseudo
features (schema/batching/partitioning fully exercised);
``mode='real'`` raises ``NotImplementedError`` at the exact seam where
PIL/ffmpeg plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes int, sha string, "
    "feat array<float>"
)
N_FEATURES = 8


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (content = seeded bytes)."""
    rows = []
    for i in range(n):
        content = hashlib.md5(f"media{i}".encode()).digest() * 4
        rows.append((
            i, bytearray(content),
            ("image/png", 32 + i % 8, 32 + i % 4, None),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: md5-chain over the bytes →
    N_FEATURES floats in [0,1). Stands in for a real pixel decode."""
    h = hashlib.md5(content).digest()
    vals = []
    for i in range(N_FEATURES):
        h = hashlib.md5(h + bytes([i])).digest()
        vals.append(int.from_bytes(h[:4], "big") / 2**32)
    return np.array(vals, dtype=np.float32)


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The per-batch kernel is where a real implementation calls
    PIL/torchvision/ffmpeg; batch shape, schema, and null handling
    are identical for the real path.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "plug PIL/ffmpeg decode here"
                )
            feats, shas, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha1(b).hexdigest())
                feats.append(_fake_decode(b).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["meta"].map(
                    lambda m: m["mime"] if m is not None else None
                ),
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "sha": shas,
                "feat": feats,
            })

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (real decoder stubbed the same way). Media with
    no duration (images) yield a single frame at t=0."""
    frames = F.when(
        F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0).cast("long")))
    return media.select(
        "media_id", F.explode(frames).alias("frame_ms"), "meta.mime"
    )
