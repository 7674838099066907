"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference extension (BASELINE.json north star): image/audio/
video as ``binary`` columns processed through ``mapInPandas`` so each
Arrow batch hands the Python side a contiguous block of payloads —
the Spark-side plumbing (schema, batch shape, partition sizing) is
real; the actual codec calls are stubbed behind ``_require_codec``
because decode libraries (PIL/ffmpeg/torchaudio) are not in this
container. Swap the stub for the real decoder and nothing else
changes.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` low enough that a batch of
decoded frames fits executor memory, and push metadata-only filters
(width/height/duration) BEFORE the decode stage so pruning happens at
the parquet scan, never after decoding.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CODEC_AVAILABLE = False  # flip when PIL/ffmpeg land in the image


def _require_codec(op: str) -> None:
    if not CODEC_AVAILABLE:
        raise NotImplementedError(
            f"{op}: no media codec in this environment — deterministic fake "
            "output is produced by the *_fake variants; wire PIL/ffmpeg here."
        )


def attach_binary_metadata(
    df: DataFrame, binary_column: str = "payload", modality: str = "image"
) -> DataFrame:
    """Typed metadata columns derived JVM-side (no Python): byte size,
    md5 content id, modality tag. Real pipelines add width/height/
    duration at ingest; filters on these prune before any decode."""
    return (
        df.withColumn("byte_size", F.length(F.col(binary_column)).cast("long"))
        .withColumn("content_id", F.md5(F.col(binary_column)))
        .withColumn("modality", F.lit(modality))
    )


def _fake_decode(payload: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in decoder: seeds a uint8 image from the
    payload's sha256 — stable across runs/partitions, so tests can
    assert exact values through the full Spark plumbing."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    binary_column: str = "payload",
    id_column: str = "item_id",
    height: int = 32,
    width: int = 32,
    fake: bool = True,
) -> DataFrame:
    """→ (id, pixels: array<int>, height, width). Arrow-batched
    decode; one pandas batch in, one out."""
    if not fake:
        _require_codec("decode_images")

    out_schema = f"{id_column} long, pixels array<int>, height int, width int"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pixels = [
                _fake_decode(bytes(p), height, width).ravel().tolist()
                for p in pdf[binary_column]
            ]
            yield pd.DataFrame(
                {
                    id_column: pdf[id_column],
                    "pixels": pixels,
                    "height": height,
                    "width": width,
                }
            )

    return df.select(id_column, binary_column).mapInPandas(decode, out_schema)


def extract_image_features(
    decoded: DataFrame, id_column: str = "item_id", feature_dim: int = 16
) -> DataFrame:
    """→ (id, embedding: array<double>): pooled features from decoded
    pixels (mean-pooled grid blocks as the stub featurizer — the UDF
    signature/batching is exactly what a CLIP/ViT pandas UDF uses)."""
    out_schema = f"{id_column} long, embedding array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for px, h, w in zip(pdf["pixels"], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.float64).reshape(h, w)
                blocks = np.array_split(img.ravel(), feature_dim)
                feats.append([float(b.mean()) / 255.0 for b in blocks])
            yield pd.DataFrame({id_column: pdf[id_column], "embedding": feats})

    return decoded.mapInPandas(featurize, out_schema)


def sample_video_frames(
    df: DataFrame,
    binary_column: str = "payload",
    id_column: str = "item_id",
    num_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """→ one row per sampled frame (id, frame_idx, frame_payload).
    Frame extraction is the stub (payload sliced deterministically);
    the explode shape — rows multiply by num_frames, payload bytes
    stay off the driver — is the real design point."""
    if not fake:
        _require_codec("sample_video_frames")

    out_schema = f"{id_column} long, frame_idx int, frame_payload binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_column], pdf[binary_column]):
                raw = bytes(p)
                step = max(1, len(raw) // num_frames)
                for k in range(num_frames):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(raw[k * step : (k + 1) * step] or b"\x00")
            yield pd.DataFrame(
                {id_column: ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.select(id_column, binary_column).mapInPandas(sample, out_schema)
