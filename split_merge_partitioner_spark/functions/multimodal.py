"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via mapInPandas (Arrow batches).

The decode step is STUBBED: the sandbox has no image/audio libraries, so
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (bytes -> pseudo pixel stats) exercises the
full Spark-side pipeline — schema, partitioning, UDF signature, batch shape —
which is the part that must be real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", LongType()),        # typed metadata
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("std_byte", DoubleType()),
        StructField("feature", StringType()),  # hex fingerprint of the payload
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to an HxWx3 array.  STUB: no codec libs in this
    container.  fake=True returns a deterministic pseudo-image derived from
    the payload bytes so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library not present in "
            "this environment; pass fake=True for the deterministic test path"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(b.size // 3)), 1)
    need = side * side * 3
    tiled = np.resize(b, need)
    return tiled.reshape(side, side, 3)


def make_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                int(rng.integers(16, 256)) if kind != "audio" else 0,
                int(rng.integers(16, 256)) if kind != "audio" else 0,
                int(rng.integers(1000, 60000)) if kind != "image" else 0,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Byte-level feature extraction over Arrow batches via mapInPandas.
    Each batch is processed vectorized; the decode step goes through the
    (stubbed) codec boundary."""

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                img = decode_image(bytes(payload), fake=fake_decode)
                feats.append(
                    (
                        int(mid),
                        int(b.size),
                        float(b.mean()),
                        float(b.std()),
                        hashlib.sha256(img.tobytes()).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "n_bytes", "mean_byte", "std_byte", "feature"]
            )

    return media.select("media_id", "payload").mapInPandas(task, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows via JVM-side
    sequence/explode — the distributed part of frame extraction; the actual
    frame decode is behind the same stub boundary."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
