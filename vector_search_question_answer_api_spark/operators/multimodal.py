"""Multimodal columns — image/audio/video as opaque ``binary`` payloads with
typed metadata (engine extension for LLM-training pipelines; BASELINE.json
north star).

Design: media is DATA IN COLUMNS, not files on the side — a row carries
``content: binary`` plus a ``media: struct<media_type, width, height,
duration_s, sample_rate>`` column, so partitioning, predicate pushdown on
metadata, and join/dedup machinery all apply unchanged.  Heavy per-item work
(decode, feature extraction) runs in Arrow-batched ``mapInPandas`` — the
same executor-parallel shape as the text embedder (operators/embed.py).

THIS CONTAINER HAS NO MEDIA CODECS (no PIL/cv2/ffmpeg/torchaudio), so the
decode step is a SEAM exactly like the embedder/generator (SURVEY.md §2.10):

- ``decode_media`` raises ``NotImplementedError`` unless a real decoder
  is importable — the production path is gated, not faked.
- ``media_features`` uses ``DeterministicFeaturizer``: features derive
  from md5 of the raw bytes — a stand-in with the exact Spark plumbing
  (binary in, array<float> out, Arrow batches) the real featurizer needs.

Everything metadata-driven (frame-sampling plans, resize geometry) is pure
Catalyst expressions: it needs no bytes, only the struct column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "media_type string, width int, height int, duration_s int, sample_rate int"
)


def attach_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: the text bytes
    stand in for an encoded payload; metadata derives from ``doc_id``.
    (In production this is a parquet/Lance scan of real bytes; the point
    here is the column SHAPE: binary + struct, schema-on-write.)"""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            mt.alias("media_type"),
            (320 + (F.col("doc_id") % 5) * 160).cast("int").alias("width"),
            (240 + (F.col("doc_id") % 3) * 120).cast("int").alias("height"),
            F.when(mt == "image", F.lit(0))
            .otherwise(5 + F.col("doc_id") % 55)
            .cast("int")
            .alias("duration_s"),
            F.when(mt == "audio", F.lit(16000))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("sample_rate"),
        ).alias("media"),
    )


def decode_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Production decode seam: binary -> pixel/sample tensors.  Requires a
    codec library; this container ships none, so the seam raises rather
    than silently faking decode output."""
    try:  # pragma: no cover - no codec libs in this environment
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "no media codec available (PIL/cv2/ffmpeg not installed); "
            "use media_features(DeterministicFeaturizer) for pipeline tests"
        ) from e
    raise NotImplementedError("real decode path not implemented in this build")


class DeterministicFeaturizer:
    """Test-double featurizer: n_features floats in [0, 1) from seeded md5
    of the payload bytes — byte-for-byte reproducible in any engine, so the
    DuckDB oracle can verify the full binary->features plumbing."""

    def __init__(self, n_features: int = 8):
        self.n_features = n_features

    def __call__(self, content: bytes | None) -> list[float]:
        if content is None:
            return [0.0] * self.n_features
        base = hashlib.md5(content).hexdigest()
        return [
            int(
                hashlib.md5(f"{i}:{base}".encode()).hexdigest()[:8], 16
            )
            / float(1 << 32)
            for i in range(self.n_features)
        ]


def media_features(
    df: DataFrame,
    featurizer: DeterministicFeaturizer | None = None,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, features array<double>): Arrow-batched feature extraction
    over the binary column — the mapInPandas shape a real CNN/CLIP/fbank
    featurizer drops into (per-worker model singleton, batch inference)."""
    featurizer = featurizer or DeterministicFeaturizer()
    n_feat = featurizer.n_features

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [featurizer(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "features": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        extract, schema="doc_id long, features array<double>"
    )


def frame_sample_plan(
    df: DataFrame, every_s: int = 5, media_col: str = "media"
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure Catalyst (sequence + explode on metadata), no bytes touched.
    Selecting frames BEFORE decode is the standard scale trick: the decode
    stage then reads only the sampled offsets."""
    m = F.col(media_col)
    return (
        df.filter(m["media_type"] == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), m["duration_s"] - 1, F.lit(every_s))
            ).alias("frame_ts_s"),
        )
    )


def resize_plan(
    df: DataFrame,
    max_side: int = 512,
    media_col: str = "media",
) -> DataFrame:
    """Aspect-preserving resize geometry for images — pure metadata math
    (the decode+rescale kernel consumes these target dims)."""
    m = F.col(media_col)
    w, h = m["width"].cast("double"), m["height"].cast("double")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return df.filter(m["media_type"] == "image").select(
        "doc_id",
        m["width"].alias("width"),
        m["height"].alias("height"),
        F.floor(w * scale).cast("int").alias("target_width"),
        F.floor(h * scale).cast("int").alias("target_height"),
    )
