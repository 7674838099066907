from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from redshells_spark.multimodal.binary_ops import (
    attach_binary_metadata,
    decode_images,
    extract_image_features,
    sample_video_frames,
)
from redshells_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    sessionize,
    streaming_click_counts,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_windowed_event_counts_batch(events):
    out = windowed_event_counts(events, "1 hour")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()


def test_sessionize_batch(events):
    out = sessionize(events, gap="30 minutes")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert sum(r["n_events"] for r in rows) == events.count()


def test_streaming_end_to_end(spark, sf_dir, tmp_path):
    # copy the parquet file into a stream dir and run a real
    # Structured Streaming query to a memory sink
    import shutil, glob, os

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    src = f"{sf_dir}/events.parquet"
    paths = glob.glob(os.path.join(src, "*.parquet")) if os.path.isdir(src) else [src]
    for i, p in enumerate(paths):
        shutil.copy(p, stream_dir / f"part{i}.parquet")

    stream = read_event_stream(spark, str(stream_dir))
    assert stream.isStreaming
    counts = streaming_click_counts(stream)
    q = run_stream_to_memory(counts, "click_counts_test", output_mode="complete")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT sum(n) AS total FROM click_counts_test").head()["total"]
        batch = spark.read.parquet(src).count()
        assert got == batch  # stream result == batch result (parity)
    finally:
        q.stop()


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    import shutil, glob, os

    stream_dir = tmp_path / "wstream"
    stream_dir.mkdir()
    src = f"{sf_dir}/events.parquet"
    paths = glob.glob(os.path.join(src, "*.parquet")) if os.path.isdir(src) else [src]
    for i, p in enumerate(paths):
        shutil.copy(p, stream_dir / f"part{i}.parquet")

    stream = read_event_stream(spark, str(stream_dir))
    windowed = windowed_event_counts(stream, "6 hours", watermark="1 hour")
    q = run_stream_to_memory(windowed, "windowed_test", output_mode="append")
    try:
        q.processAllAvailable()
        # append mode emits only watermark-closed windows; batch parity
        # on the emitted subset
        stream_rows = spark.sql(
            "SELECT window_start, event_type, n_events FROM windowed_test"
        ).collect()
        batch = windowed_event_counts(
            spark.read.parquet(src), "6 hours"
        ).collect()
        batch_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
        assert len(stream_rows) > 0
        for r in stream_rows:
            assert batch_map[(r["window_start"], r["event_type"])] == r["n_events"]
    finally:
        q.stop()


@pytest.fixture(scope="module")
def binary_df(spark):
    rows = [(i, bytes([i % 256] * (100 + i))) for i in range(20)]
    return spark.createDataFrame(rows, "item_id long, payload binary")


def test_attach_binary_metadata(binary_df):
    out = attach_binary_metadata(binary_df)
    rows = {r["item_id"]: r for r in out.collect()}
    assert rows[0]["byte_size"] == 100
    assert rows[5]["byte_size"] == 105
    assert len(rows[0]["content_id"]) == 32
    # identical payload → identical content id (dedup key)
    assert out.select("content_id").distinct().count() == 20


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _jpeg(w, h):
    import struct

    # SOI + APP0 + COM (variable-length segments before SOF) + SOF0
    return (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 9
        + b"\xff\xfe\x00\x07hello"
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03"
    )


def _gif(w, h):
    import struct

    return b"GIF87a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def test_parse_image_headers_real_formats(spark):
    from redshells_spark.multimodal.binary_ops import parse_image_headers

    rows = [
        (1, _png(640, 480)),
        (2, _jpeg(1920, 1080)),
        (3, _gif(320, 200)),
        (4, b"not an image at all"),
        (5, b"\x89PN"),  # truncated magic
        (6, _png(70000, 3)),  # PNG dims exceed 16 bits — u32 read
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: r for r in parse_image_headers(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 1920, 1080)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)
    assert got[4]["format"] == "unknown" and got[4]["width"] is None
    assert got[5]["format"] == "unknown"
    assert (got[6]["width"], got[6]["height"]) == (70000, 3)


def test_attach_binary_metadata_with_headers(spark):
    from redshells_spark.multimodal.binary_ops import attach_binary_metadata

    df = spark.createDataFrame([(1, _png(8, 9))], "item_id long, payload binary")
    row = attach_binary_metadata(df, parse_headers=True).head()
    assert row["byte_size"] == len(_png(8, 9))
    assert (row["format"], row["width"], row["height"]) == ("png", 8, 9)


def test_decode_images_deterministic(binary_df):
    out1 = decode_images(binary_df, height=8, width=8)
    out2 = decode_images(binary_df, height=8, width=8)
    p1 = {r["item_id"]: r["pixels"] for r in out1.collect()}
    p2 = {r["item_id"]: r["pixels"] for r in out2.collect()}
    assert p1 == p2  # deterministic fake decode through full plumbing
    assert all(len(v) == 64 for v in p1.values())


def test_image_feature_pipeline(binary_df):
    decoded = decode_images(binary_df, height=8, width=8)
    feats = extract_image_features(decoded, feature_dim=4)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["embedding"]) == 4 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["embedding"])


def test_sample_video_frames(binary_df):
    frames = sample_video_frames(binary_df, num_frames=4)
    assert frames.count() == 80
    per_item = frames.groupBy("item_id").count().collect()
    assert all(r["count"] == 4 for r in per_item)


def test_parse_audio_headers_real_wav_bytes(spark):
    # hand-built 44-byte PCM WAV: stereo, 44100 Hz, 16-bit, 100 samples
    import struct

    from redshells_spark.multimodal.binary_ops import parse_audio_headers

    data_size = 100 * 4
    header = (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", data_size)
    )
    df = spark.createDataFrame([(1, bytearray(header)), (2, bytearray(b"notawav"))],
                               "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in parse_audio_headers(df).collect()}
    r1 = got[1]
    assert r1["format"] == "wav" and r1["n_channels"] == 2
    assert r1["sample_rate"] == 44100 and r1["bits_per_sample"] == 16
    assert r1["n_samples"] == 100
    r2 = got[2]
    assert r2["format"] == "unknown" and r2["sample_rate"] is None
