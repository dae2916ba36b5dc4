"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched stages.

The Spark-side plumbing is REAL and tested: schemas, partition-aware
batch iteration, UDF signatures, deterministic fake features. The
actual codec calls are stubbed behind ``*_DECODER`` hooks because this
container has no image/audio libraries — a deployment sets
``set_image_decoder(PIL_based_fn)`` and nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

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
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

#: pluggable real decoders; None -> deterministic fake (hash-derived).
_IMAGE_DECODER: Callable[[bytes], np.ndarray] | None = None


def set_image_decoder(fn: Callable[[bytes], np.ndarray] | None) -> None:
    global _IMAGE_DECODER
    _IMAGE_DECODER = fn


def _fake_pixels(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decode: hash-seeded pixel grid. Keeps
    the full pipeline testable without codecs; REPLACE via
    set_image_decoder in production."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = struct.unpack("<Q", digest)[0]
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    if _IMAGE_DECODER is not None:
        return _IMAGE_DECODER(payload)
    return _fake_pixels(payload)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feat_mean", ArrayType(FloatType())),
        StructField("feat_hist", ArrayType(FloatType())),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """decode -> per-channel mean + 8-bin luminance histogram.

    mapInPandas: numpy math over Arrow batches; one python worker per
    partition, payload bytes never hit the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, hists = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload)).astype(np.float32)
                ids.append(int(mid))
                means.append([float(x) for x in px.mean(axis=(0, 1))])
                lum = px.mean(axis=2)
                hist, _ = np.histogram(lum, bins=8, range=(0, 256))
                total = max(int(hist.sum()), 1)
                hists.append([float(x) / total for x in hist])
            yield pd.DataFrame(
                {"media_id": ids, "feat_mean": means, "feat_hist": hists}
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: (media_id, frame_ts_ms) rows — the
    shuffle-friendly shape real frame extraction consumes. Decode
    itself is a stub (no codecs here)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col("id") % 3 == 0, "image/png")
        .when(F.col("id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8")
        .alias("payload"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        (F.col("id") * 700 % 5000).cast("int").alias("duration_ms"),
    )
