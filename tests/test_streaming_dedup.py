"""Streaming dedup: stream == batch parity on the same fingerprint,
bounded state via watermark, duplicates across micro-batches dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.streaming.dedup import dedup_stream, fingerprint_column
from redshells_spark.streaming.events import run_stream_to_memory


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    # three micro-batch files; doc "AAA" repeats across batches (crawler
    # re-fetch), "bbb" repeats within one batch, whitespace variants of
    # "ccc" must collapse to one fingerprint
    rows = [
        [(1, "AAA", "2024-01-01 00:00:00"), (2, "bbb", "2024-01-01 00:01:00"),
         (3, "bbb", "2024-01-01 00:02:00")],
        [(4, "aaa", "2024-01-01 00:10:00"), (5, "ccc  ddd", "2024-01-01 00:11:00")],
        [(6, "ccc ddd", "2024-01-01 00:20:00"), (7, "eee", "2024-01-01 00:21:00")],
    ]
    d = tmp_path / "docs"
    d.mkdir()
    for i, batch in enumerate(rows):
        spark.createDataFrame(
            [(a, b, c) for a, b, c in batch], "doc_id long, text string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            str(d / f"batch{i}.parquet")
        )
    return d


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_stream_dedup_matches_batch(spark, doc_stream_dir):
    import glob

    files = sorted(glob.glob(str(doc_stream_dir / "*.parquet")))
    batch_df = spark.read.parquet(*files)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(doc_stream_dir / "*.parquet"))
    )
    deduped = dedup_stream(stream, ts_column="ts", watermark="10 hours")
    q = run_stream_to_memory(deduped, "dedup_test", output_mode="append")
    try:
        q.processAllAvailable()
        got_fps = {r["fingerprint"] for r in spark.sql("SELECT * FROM dedup_test").collect()}
        n_stream = spark.sql("SELECT count(*) c FROM dedup_test").head()["c"]
    finally:
        q.stop()

    batch_deduped = dedup_stream(batch_df)
    batch_fps = {r["fingerprint"] for r in batch_deduped.collect()}
    # distinct fingerprints: AAA/aaa collapse (lowercase), bbb once,
    # "ccc ddd" variants collapse (whitespace), eee → 4
    assert batch_fps == got_fps
    assert len(batch_fps) == 4
    assert n_stream == 4  # cross-micro-batch duplicates dropped in-stream


def test_fingerprint_is_oracle_portable(spark):
    # the same normalization in DuckDB must produce identical md5s
    import duckdb

    texts = ["Hello  World", "hello world", "x\t y"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["fp"] for r in df.select(fingerprint_column("text").alias("fp")).collect()]
    want = [
        duckdb.sql(
            f"SELECT md5(regexp_replace(lower('{t}'), '\\s+', ' ', 'g'))"
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want
