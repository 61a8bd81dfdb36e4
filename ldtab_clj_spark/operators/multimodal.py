"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (the training-data-pipeline side of the engine).

The decode step is STUBBED (no image/audio libs in this container):
``decode_media(..., real_decode=True)`` raises NotImplementedError at
the exact seam where PIL/ffmpeg would plug in; with the default
deterministic fake decoder, all the Spark-side plumbing — schema,
partitioning, Arrow batch shapes, UDF signatures — is real and tested.

Scale notes: media payloads ride in their own table keyed by
media_ref (never inside the docs table — a 100 TB scan of spans must
not drag blobs along); feature extraction is ``mapInPandas`` over the
media table only, and joins back to statements on media_ref are
broadcast or bucketed by ref hash.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType,
                               IntegerType, StringType, StructField,
                               StructType)

MEDIA = StructType([
    StructField("media_ref", StringType(), False),
    StructField("content", BinaryType(), False),
    StructField("meta", StructType([
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ])),
])

FEATURES = StructType([
    StructField("media_ref", StringType(), False),
    StructField("format", StringType()),
    StructField("feature", ArrayType(FloatType()), False),
])

FRAMES = StructType([
    StructField("media_ref", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])

_FORMATS = ("png", "jpeg", "wav", "mp4")


def synth_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table for every media_ref in the docs
    spans: payload bytes + metadata derived from the ref hash."""
    refs = (docs.select(F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref"))
            .distinct())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                fmt = _FORMATS[h[0] % len(_FORMATS)]
                size = 256 + h[1]  # 256-511 bytes of deterministic blob
                content = (h * ((size // len(h)) + 1))[:size]
                rows.append((ref, content,
                             {"format": fmt, "width": 16 + h[2] % 64,
                              "height": 16 + h[3] % 64,
                              "n_frames": 1 + h[4] % 8}))
            yield pd.DataFrame(rows, columns=["media_ref", "content",
                                              "meta"])

    return refs.mapInPandas(gen, MEDIA)


def _fake_decode(content: bytes, fmt: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 16-dim float feature
    from the payload bytes."""
    h = hashlib.sha256(content).digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32)
            / 255.0)


def _real_decode(content: bytes, fmt: str) -> np.ndarray:
    """Real image decode, soft-enabled: PIL is try-imported at the
    WORKER (it ships in many cluster images but not this container).
    Images decode to a 4x4 grayscale thumbnail = the same 16-dim
    float32 feature shape as the stub; audio/video formats still need
    ffmpeg and keep the documented seam error."""
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not "
            "available in this container; wire the decoder in "
            "here (operators/multimodal.py:decode_media)")
    if fmt not in ("png", "jpeg"):
        raise NotImplementedError(
            f"real decode for format {fmt!r} requires ffmpeg — only "
            "png/jpeg decode via PIL")
    import io
    img = Image.open(io.BytesIO(content)).convert("L").resize((4, 4))
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(16)


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + feature-extract (resize/spectrogram/etc. live here in a
    real deployment). Arrow-batched; one output row per media row.
    ``real_decode=True`` uses PIL if importable on the worker
    (_real_decode); the deterministic stub stays the default so
    oracles and fixtures are environment-independent."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _real_decode if real_decode else _fake_decode
        for pdf in batches:
            feats = [
                decoder(bytes(c), m["format"] if m else "")
                for c, m in zip(pdf["content"], pdf["meta"])]
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "format": [m["format"] if m else None for m in pdf["meta"]],
                "feature": feats,
            })

    return media.mapInPandas(decode, FEATURES)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video-like payloads: one-to-many expansion,
    frame bytes sliced from the payload (stub slicing; a real impl
    seeks keyframes)."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content, meta in zip(pdf["media_ref"],
                                          pdf["content"], pdf["meta"]):
                n = (meta["n_frames"] if meta else 1) or 1
                blob = bytes(content)
                step = max(len(blob) // n, 1)
                for i in range(0, n, every):
                    rows.append((ref, i, blob[i * step:(i + 1) * step]))
            yield pd.DataFrame(rows,
                               columns=["media_ref", "frame_idx", "frame"])

    return media.mapInPandas(sample, FRAMES)


def media_feature_statements(features: DataFrame) -> DataFrame:
    """Features → LDTab statement rows: the bridge back into the KG
    (media node gets an ex:featureHash literal).

    The hash is md5 over the INTEGER byte signature of the feature
    ("b0-b1-…-b15"), not over an engine-formatted float string — so the
    single-node oracle (plans/single_node.py) reproduces it exactly."""
    sig = F.array_join(
        F.transform("feature",
                    lambda x: F.round(x * 255).cast("int").cast("string")),
        "-")
    return features.select(
        F.lit(1).cast("long").alias("assertion"),
        F.lit(0).cast("long").alias("retraction"),
        F.lit("graph").alias("graph"),
        F.concat(F.lit("<"), F.col("media_ref"), F.lit(">"))
        .alias("subject"),
        F.lit("ex:featureHash").alias("predicate"),
        F.md5(sig).alias("object"),
        F.lit("xsd:string").alias("datatype"),
        F.lit(None).cast("string").alias("annotation"))
