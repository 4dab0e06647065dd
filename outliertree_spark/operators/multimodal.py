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


def sniff_mime_expr(payload_col: str = "payload"):
    """Content-type from magic bytes, pure Catalyst (hex(substring) on the
    binary column inside codegen) — no Python, no libraries.  This is the
    real operation (not a stub): format detection at 100 TB should never
    ship payload bytes to Python."""
    c = F.col(payload_col)

    def magic(pos, hexs):
        return F.hex(F.substring(c, pos, len(hexs) // 2)) == hexs

    return (F.when(magic(1, "89504E470D0A1A0A"), "image/png")
             .when(magic(1, "FFD8FF"), "image/jpeg")
             .when(magic(1, "474946383761") | magic(1, "474946383961"),
                   "image/gif")
             .when(magic(1, "52494646") & magic(9, "57415645"), "audio/wav")
             .when(magic(1, "494433") | magic(1, "FFFB"), "audio/mpeg")
             .when(magic(5, "66747970"), "video/mp4")
             .otherwise("application/octet-stream"))


def _be_int(c, pos, nbytes):
    return F.conv(F.hex(F.substring(c, pos, nbytes)), 16, 10).cast("long")


def png_dims_expr(payload_col: str = "payload"):
    """(width, height) struct for PNG payloads: IHDR big-endian ints at
    fixed offsets 17/21 — pure Catalyst byte arithmetic."""
    c = F.col(payload_col)
    return F.struct(_be_int(c, 17, 4).alias("width"),
                    _be_int(c, 21, 4).alias("height"))


def gif_dims_expr(payload_col: str = "payload"):
    """(width, height) for GIF: little-endian u16 at offsets 7/9."""
    c = F.col(payload_col)
    w = _be_int(c, 7, 1) + _be_int(c, 8, 1) * 256
    h = _be_int(c, 9, 1) + _be_int(c, 10, 1) * 256
    return F.struct(w.alias("width"), h.alias("height"))


METADATA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate_hz", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def parse_header(payload: bytes) -> dict:
    """Real (library-free) container-header parser: PNG/GIF fixed
    offsets, JPEG SOF segment walk, WAV fmt chunk.  Only pixel/sample
    DECODING remains stubbed (real_decode); header metadata is fully
    implemented."""
    import struct as _struct
    out = {"mime": "application/octet-stream", "width": None, "height": None,
           "sample_rate_hz": None, "n_channels": None}
    if not payload:
        return out
    b = payload
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        out["mime"] = "image/png"
        out["width"], out["height"] = _struct.unpack(">II", b[16:24])
    elif b[:3] == b"\xff\xd8\xff":
        out["mime"] = "image/jpeg"
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = _struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["height"], out["width"] = _struct.unpack(
                    ">HH", b[i + 5:i + 9])
                break
            i += 2 + seglen
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["mime"] = "image/gif"
        out["width"], out["height"] = _struct.unpack("<HH", b[6:10])
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["mime"] = "audio/wav"
        i = 12
        while i + 8 <= len(b):
            cid, clen = b[i:i + 4], _struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 16 <= len(b):
                out["n_channels"], out["sample_rate_hz"] = _struct.unpack(
                    "<HI", b[i + 10:i + 16])
                break
            i += 8 + clen + (clen % 2)
    elif b[:3] == b"ID3" or b[:2] == b"\xff\xfb":
        out["mime"] = "audio/mpeg"
    elif len(b) >= 8 and b[4:8] == b"ftyp":
        out["mime"] = "video/mp4"
    return out


def media_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads using the
    real header parser (Arrow-batched; bytes never leave the executor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [parse_header(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": [m["mime"] for m in metas],
                "width": pd.array([m["width"] for m in metas],
                                  dtype="Int32"),
                "height": pd.array([m["height"] for m in metas],
                                   dtype="Int32"),
                "sample_rate_hz": pd.array(
                    [m["sample_rate_hz"] for m in metas], dtype="Int32"),
                "n_channels": pd.array([m["n_channels"] for m in metas],
                                       dtype="Int32"),
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
            })

    return df.mapInPandas(run, schema=METADATA_SCHEMA)


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
