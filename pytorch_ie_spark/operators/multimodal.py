"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step (PIL / torchaudio / ffmpeg) is STUBBED — those libs are not
in this container. What IS real and tested: the Spark-side contract —
binary schema, Arrow batch shape through mapInPandas, partitioning by media
type, deterministic fake feature extraction so downstream stages (ANN over
features, dedup by content hash) run end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, payload binary, "
    "meta_width int, meta_height int, meta_duration_s double"
)

FEATURES_SCHEMA = (
    "media_id string, media_type string, content_sha256 string, "
    "n_bytes int, features array<double>"
)


def documents_as_media(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapter: wraps text docs as fake binary payloads so the binary-column
    pipeline is exercisable in-sandbox (payload = utf-8 bytes)."""
    return documents.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.length("text").cast("int").alias("meta_width"),
        F.lit(1).alias("meta_height"),
        (F.length("text") / 1000.0).alias("meta_duration_s"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real decode would go here (PIL.Image.open / soundfile / pyav).

    STUB: not available in this environment.
    """
    raise NotImplementedError(
        f"media decode for {media_type} requires image/audio libs not present "
        "in this container; use extract_features(fake=True)"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an encoder embedding: bytes of the sha256
    digest scaled to [0,1). Stable across runs/workers."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 256.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched;
    this is exactly where a real image encoder would run, one model load per
    python worker as in operators/models.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            sizes = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload) if payload is not None else b""
                if not fake:
                    decode_media(raw, mtype)  # raises NotImplementedError
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                feats.append(_fake_features(raw, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "content_sha256": shas,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_media(
    media: DataFrame, target_width: int = 32
) -> DataFrame:
    """'Resize' plumbing over binary payloads: a real implementation decodes
    + rescales pixels; the sandbox stand-in downsamples the byte stream to
    `target_width` bytes (every k-th byte, k = ceil(len/target)) inside the
    same Arrow-batched mapInPandas shape a real resizer uses, and rewrites
    the width metadata. Payload transform + metadata update is the
    operator contract being tested; the pixel math is the stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, widths = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if len(raw) <= target_width:
                    outs.append(raw)
                    widths.append(len(raw))
                else:
                    step = -(-len(raw) // target_width)
                    small = raw[::step]
                    outs.append(small)
                    widths.append(len(small))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": outs,
                    "meta_width": widths,
                    "meta_height": pdf["meta_height"].values,
                    "meta_duration_s": pdf["meta_duration_s"].values,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Video frame sampling' over the byte stream: one row per sampled chunk
    (JVM-side posexplode over computed offsets — demonstrates the 1->N media
    explode pattern without decoding)."""
    return media.select(
        "media_id",
        "media_type",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.floor(F.length(F.col("payload")) / every_n_bytes).cast("int"),
                        F.lit(max_frames - 1),
                    ),
                ),
                lambda i: i * every_n_bytes,
            )
        ).alias("frame_idx", "byte_offset"),
    )
