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
    df: DataFrame,
    binary_column: str = "payload",
    modality: str = "image",
    parse_headers: bool = False,
) -> DataFrame:
    """Typed metadata columns derived JVM-side (no Python): byte size,
    md5 content id, modality tag. With ``parse_headers=True`` also
    format/width/height via :func:`parse_image_headers` — REAL header
    reads needing no codec library. Filters on these prune before any
    decode."""
    out = (
        df.withColumn("byte_size", F.length(F.col(binary_column)).cast("long"))
        .withColumn("content_id", F.md5(F.col(binary_column)))
        .withColumn("modality", F.lit(modality))
    )
    if parse_headers:
        out = parse_image_headers(out, binary_column)
    return out


# magic prefixes, hex-uppercase as Spark's F.hex renders them
_PNG_MAGIC = "89504E470D0A1A0A"
_GIF_MAGICS = ("474946383761", "474946383961")  # GIF87a / GIF89a


def _jpeg_dims(raw: bytes) -> tuple[int, int] | None:
    """Scan JPEG markers for the first SOFn frame header (the only
    image-dimension record in the stream). Pure Python, no codec."""
    n = len(raw)
    if n < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        return None
    i = 2
    while i + 9 <= n:
        if raw[i] != 0xFF:
            i += 1
            continue
        marker = raw[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD8:
            i += 2  # padding / standalone markers carry no length
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            # SOFn: [len:2][precision:1][height:2][width:2]
            h = int.from_bytes(raw[i + 5 : i + 7], "big")
            w = int.from_bytes(raw[i + 7 : i + 9], "big")
            return (w, h)
        seg = int.from_bytes(raw[i + 2 : i + 4], "big")
        if seg < 2:
            return None  # corrupt length — stop rather than loop
        i += 2 + seg
    return None


def _jpeg_dims_udf():
    # built lazily: pandas_udf resolves its DDL return type against the
    # active session, which need not exist at module import
    @F.pandas_udf("width long, height long")
    def udf(payloads: pd.Series) -> pd.DataFrame:
        ws, hs = [], []
        for p in payloads:
            d = _jpeg_dims(bytes(p)) if p is not None else None
            ws.append(d[0] if d else None)
            hs.append(d[1] if d else None)
        return pd.DataFrame({"width": ws, "height": hs})

    return udf


def parse_image_headers(df: DataFrame, binary_column: str = "payload") -> DataFrame:
    """→ + (format, width, height) from REAL header bytes, no codec:

    - format: magic-byte dispatch, JVM-side;
    - PNG: IHDR big-endian u32 pair at fixed offset 17/21 —
      ``conv(hex(substring(...)))`` stays entirely in codegen;
    - GIF: logical-screen little-endian u16 pair at offset 7/9, same
      JVM arithmetic with byte-swapped hex concat;
    - JPEG: dimensions live in a variable-position SOFn marker, which
      a relational expression can't scan — Arrow-batched pandas UDF
      (the one Python stage, and only its two longs come back).

    Unknown/truncated payloads yield format='unknown' and null dims."""
    b = F.col(binary_column)

    def _be32(pos: int) -> F.Column:
        return F.conv(F.hex(F.substring(b, pos, 4)), 16, 10).cast("long")

    def _le16(pos: int) -> F.Column:
        swapped = F.concat(F.hex(F.substring(b, pos + 1, 1)), F.hex(F.substring(b, pos, 1)))
        return F.conv(swapped, 16, 10).cast("long")

    fmt = (
        F.when(F.hex(F.substring(b, 1, 8)) == _PNG_MAGIC, F.lit("png"))
        .when(F.hex(F.substring(b, 1, 2)) == "FFD8", F.lit("jpeg"))
        .when(F.hex(F.substring(b, 1, 6)).isin(*_GIF_MAGICS), F.lit("gif"))
        .otherwise(F.lit("unknown"))
    )
    jp = F.when(fmt == "jpeg", _jpeg_dims_udf()(b))
    return (
        df.withColumn("format", fmt)
        .withColumn("__jp", jp)
        .withColumn(
            "width",
            F.when(F.col("format") == "png", _be32(17))
            .when(F.col("format") == "gif", _le16(7))
            .when(F.col("format") == "jpeg", F.col("__jp.width")),
        )
        .withColumn(
            "height",
            F.when(F.col("format") == "png", _be32(21))
            .when(F.col("format") == "gif", _le16(9))
            .when(F.col("format") == "jpeg", F.col("__jp.height")),
        )
        .drop("__jp")
    )


def _fake_decode(payload: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in decoder: seeds a uint8 image from the
    payload's sha256 — stable across runs/partitions, so tests can
    assert exact values through the full Spark plumbing."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _portable_decode(payload: bytes, height: int, width: int) -> np.ndarray:
    """Portable fake decoder: the pixel stream is the concatenation of
    md5(payload + b'|px|' + block_index) digests. Unlike the
    sha256-seeded PCG above, every byte is reproducible in ANSI SQL
    (md5 + hex-digit parsing), so the decode→featurize mapInPandas
    pipeline can be verified against a DuckDB oracle end-to-end."""
    n = height * width
    out = bytearray()
    j = 0
    while len(out) < n:
        out.extend(hashlib.md5(payload + b"|px|" + str(j).encode()).digest())
        j += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8).reshape(height, width)


_PIXEL_SOURCES = {"prng": _fake_decode, "md5chain": _portable_decode}


def decode_images(
    df: DataFrame,
    binary_column: str = "payload",
    id_column: str = "item_id",
    height: int = 32,
    width: int = 32,
    fake: bool = True,
    pixel_source: str = "prng",
    target_partitions: int | None = None,
) -> DataFrame:
    """→ (id, pixels: array<int>, height, width). Arrow-batched
    decode; one pandas batch in, one out. ``pixel_source`` picks the
    stub generator: "prng" (sha256-seeded PCG) or "md5chain" (SQL-
    reproducible md5 byte stream — use when an oracle must recompute
    the pixels). ``target_partitions`` fans the decode out across that
    many tasks first — pass the session core count when per-row decode
    cost dominates (a real codec); leave None when the input layout
    already parallelizes or the decode is cheap (the stub: a round-8
    A/B measured the repartition shuffle of payload bytes costing more
    than it saved)."""
    if not fake:
        _require_codec("decode_images")
    gen = _PIXEL_SOURCES[pixel_source]
    if target_partitions:
        df = df.repartition(target_partitions)

    out_schema = f"{id_column} long, pixels array<int>, height int, width int"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pixels = [
                gen(bytes(p), height, width).ravel().tolist()
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
    target_partitions: int | None = None,
) -> DataFrame:
    """→ one row per sampled frame (id, frame_idx, frame_payload).
    Frame extraction is the stub (payload sliced deterministically);
    the explode shape — rows multiply by num_frames, payload bytes
    stay off the driver — is the real design point.
    ``target_partitions``: same decode-cost fan-out knob as
    :func:`decode_images` (the downstream per-frame decoder inherits
    this stage's partitioning)."""
    if not fake:
        _require_codec("sample_video_frames")
    if target_partitions:
        df = df.repartition(target_partitions)

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


def parse_audio_headers(df: DataFrame, binary_column: str = "payload") -> DataFrame:
    """→ + (format, n_channels, sample_rate, bits_per_sample,
    n_samples) from REAL RIFF/WAVE header bytes — entirely JVM-side
    codegen (the canonical 44-byte PCM header has every field at a
    fixed offset, so unlike JPEG no scan stage is needed):

    - magic: ``RIFF....WAVE`` at offsets 0 and 8;
    - fmt chunk (PCM): channels le-u16 @22, sample rate le-u32 @24,
      bits/sample le-u16 @34; data chunk size le-u32 @40;
    - n_samples = data_size / block_align (8·block = channels·bits).

    Non-RIFF payloads yield format='unknown' and null fields. The same
    honest boundary as the image path: HEADERS are parsed for real;
    sample decode lives behind `_require_codec`."""
    b = F.col(binary_column)

    def _le16(pos: int) -> F.Column:
        swapped = F.concat(F.hex(F.substring(b, pos + 1, 1)), F.hex(F.substring(b, pos, 1)))
        return F.conv(swapped, 16, 10).cast("long")

    def _le32(pos: int) -> F.Column:
        swapped = F.concat(
            F.hex(F.substring(b, pos + 3, 1)),
            F.hex(F.substring(b, pos + 2, 1)),
            F.hex(F.substring(b, pos + 1, 1)),
            F.hex(F.substring(b, pos, 1)),
        )
        return F.conv(swapped, 16, 10).cast("long")

    is_wav = (F.hex(F.substring(b, 1, 4)) == "52494646") & (
        F.hex(F.substring(b, 9, 4)) == "57415645"
    )
    fmt = F.when(is_wav, F.lit("wav")).otherwise(F.lit("unknown"))
    channels = F.when(is_wav, _le16(23))
    rate = F.when(is_wav, _le32(25))
    bits = F.when(is_wav, _le16(35))
    data_size = F.when(is_wav, _le32(41))
    block_align = F.when(is_wav, _le16(33))
    return (
        df.withColumn("format", fmt)
        .withColumn("n_channels", channels)
        .withColumn("sample_rate", rate)
        .withColumn("bits_per_sample", bits)
        .withColumn(
            "n_samples",
            F.when(block_align > 0, (data_size / block_align).cast("long")),
        )
    )


def pool_frame_features(
    frame_features: DataFrame,
    video_id_column: str = "video_id",
) -> DataFrame:
    """→ (video_id, feature_idx, value): temporal mean-pool of
    per-frame embeddings into one vector per video — the standard
    frame-sample → per-frame-encoder → pool video featurization,
    relational (posexplode + one groupBy on the video key)."""
    ex = frame_features.select(
        video_id_column, F.posexplode("embedding").alias("feature_idx", "v")
    )
    return (
        ex.groupBy(video_id_column, "feature_idx")
        .agg((F.sum("v") / F.count(F.lit(1))).alias("value"))
        .select(
            video_id_column,
            F.col("feature_idx").cast("long").alias("feature_idx"),
            "value",
        )
    )
