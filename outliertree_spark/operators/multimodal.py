"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it derives deterministic pseudo-features
from the bytes so the Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signature — is real and testable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def real_decode(payload: bytes, kind: str):
    """The real decode hook — wire PIL / torchaudio / pyav here when the
    libs exist.  Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; use fake=True for the deterministic test path")


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic pseudo-feature from the raw bytes (stands in for a
    decoded-then-embedded feature so the pipeline shape is real)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() / 255.0 if c.size else 0.0 for c in chunks],
                    dtype=np.float32)


def extract_features(df: DataFrame, fake: bool = False,
                     feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow ships the binary column in batches; each batch is processed as
    vectors (no per-row Python beyond the byte-level feature itself,
    which a real decoder would replace)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake:
                feats = [_fake_feature(p, feature_dim).tolist()
                         for p in pdf["payload"]]
            else:
                feats = [real_decode(p, k)
                         for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan-level frame sampling for video rows: one output row per
    sampled timestamp (the decode of each frame is the stubbed part);
    demonstrates the explode-based fan-out shape."""
    ts = F.sequence(F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms))
    return (df.filter(F.col("kind") == "video")
              .withColumn("frame_ts_ms", F.explode(ts))
              .select("media_id", "frame_ts_ms", "payload"))


def synth_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append((i, kind, payload, f"{kind}/x-fake",
                     64 if kind == "image" else None,
                     48 if kind == "image" else None,
                     3000 if kind != "image" else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
