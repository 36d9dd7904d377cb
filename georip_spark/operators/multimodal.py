"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched functions over ``mapInPandas``. The actual codec
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is stubbed: ``decode_stub='error'`` raises
NotImplementedError (the honest production posture until codecs
ship), ``decode_stub='fake'`` produces a deterministic fake decode
derived from the payload bytes — making the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) fully real and
testable.

Scale notes: payloads never pass through the driver; mapInPandas
streams Arrow batches, and ``media_meta`` extraction is column math.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Attach a deterministic binary payload + metadata to each ref —
    the fixture generator for multimodal plumbing tests (payload =
    repeated sha-like bytes of the ref; metadata from hash math)."""
    h = F.xxhash64(F.col(ref_col))
    payload = F.to_binary(
        F.repeat(F.md5(F.col(ref_col)), 8), F.lit("hex")
    )
    meta = F.struct(
        F.when(F.pmod(h, 3) == 0, "image").when(F.pmod(h, 3) == 1, "audio")
        .otherwise("video").alias("media_type"),
        (F.lit(64) + F.pmod(h, 8).cast("int") * 32).cast("int").alias("width"),
        (F.lit(64) + F.pmod(h, 5).cast("int") * 32).cast("int").alias("height"),
        F.lit(3).cast("int").alias("n_channels"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.lit(1) + F.pmod(h, 16).cast("int")).cast("int").alias("n_frames"),
    )
    return df.select(F.col(ref_col).alias("media_ref"), payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic fake 'decode': bytes → pseudo-pixel array of the
    metadata's shape. Stands in for PIL/ffmpeg until codecs ship."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    w = int(meta["width"] or 8)
    hgt = int(meta["height"] or 8)
    return rng.random((hgt, w), dtype=np.float32)


def extract_features(
    media: DataFrame,
    n_features: int = 8,
    decode_stub: str = "fake",
) -> DataFrame:
    """Decode + feature-extract over mapInPandas.

    decode_stub='error' raises NotImplementedError at the decode step
    (codec libraries absent — the marked stub); 'fake' uses the
    deterministic fake decode so the full pipeline shape is exercised.
    Features: per-band means of the decoded array (placeholder for a
    real embedding model)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over ndarrays, not iterrows: decode is inherently
            # per-item but the row plumbing needn't pay pandas row-view
            # construction (~10× per-row overhead)
            for ref, payload, meta in zip(
                pdf["media_ref"].values, pdf["payload"].values, pdf["meta"].values
            ):
                payload = bytes(payload)
                if decode_stub == "error":
                    raise NotImplementedError(
                        "media decode requires codec libraries (PIL/ffmpeg) "
                        "not present in this environment"
                    )
                arr = _fake_decode(payload, meta)
                bands = np.array_split(arr.ravel(), n_features)
                feats = [float(b.mean()) for b in bands]
                rows.append(
                    (
                        ref,
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                        feats,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "n_bytes", "digest", "features"]
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 64) -> DataFrame:
    """'Resize' planning as pure column math: target dims preserving
    aspect ratio, capped at max_side (the actual pixel resample lives
    behind the decode stub)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.select(
        "media_ref",
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (sequence + explode, JVM-side)."""
    v = media.filter(F.col("meta.media_type") == "video")
    return v.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )
