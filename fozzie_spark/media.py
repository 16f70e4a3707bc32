"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED in this environment (no PIL/ffmpeg/librosa in
the container): `decode` raises NotImplementedError unless
`deterministic_fake=True`, which substitutes a seeded hash-derived feature
vector so the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is real and testable end-to-end. Swapping in a real
decoder touches ONLY the `_decode_batch` body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "width int, height int, n_frames int, feature array<float>"
)


def media_refs(docs: DataFrame) -> DataFrame:
    """Explode media spans out of an interleaved document table:
    (doc_id, media_ref, kind, offset). Pure JVM."""
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
            F.col("s.offset").alias("offset"),
        )
    )


def _fake_decode(ref: str, kind: str, feat_dim: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder: metadata + feature vector
    derived from sha256(media_ref). Stable across runs/partitions."""
    h = hashlib.sha256(ref.encode()).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 300
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    return width, height, n_frames, feat


def extract_media_features(
    docs: DataFrame, feat_dim: int = 32, deterministic_fake: bool = False
) -> DataFrame:
    """Decode + feature-extract every media span via mapInPandas.

    Real deployment: replace the fake branch with PIL/ffmpeg decode of the
    bytes fetched from `media_ref` (or an inline binary column). Batch
    shape, output schema, and partitioning are production-ready as-is.
    """
    refs = media_refs(docs)

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode needs PIL/ffmpeg/librosa (not in this container); "
                    "pass deterministic_fake=True for the plumbing path"
                )
            rows = []
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                w, h, nf, feat = _fake_decode(ref, kind, feat_dim)
                rows.append((doc_id, ref, kind, w, h, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "kind", "width", "height", "n_frames", "feature"],
            )

    return refs.mapInPandas(_decode_batch, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video/audio media: one row per sampled frame
    index (JVM explode of a sequence — the decode of each frame would run in
    the same mapInPandas shape as extract_media_features)."""
    return media.where(F.col("n_frames") > 1).select(
        "doc_id",
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
