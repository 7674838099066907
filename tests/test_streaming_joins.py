"""Stream-stream attribution join + watermark dedup: streaming result
equals the batch run of the same expression tree; handcrafted windows
pin the boundary semantics (inclusive at conversion, exclusive at
window start, last-touch tie-breaks)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from redshells_spark.streaming.events import run_stream_to_memory
from redshells_spark.streaming.joins import (
    attribute_conversions,
    dedup_within_watermark,
    enrich_with_dimension,
    last_touch_attribution,
)

# (event_id, ts, user_id, event_type)
_EVENTS = [
    (1, "2024-01-01 10:00:00", 1, "click"),
    (2, "2024-01-01 10:30:00", 1, "click"),
    (3, "2024-01-01 10:59:00", 1, "purchase"),   # clicks 1,2 in window → last-touch 2
    (4, "2024-01-01 12:30:00", 1, "purchase"),   # no click within 1h → unattributed
    (5, "2024-01-01 09:00:00", 2, "click"),
    (6, "2024-01-01 10:00:00", 2, "purchase"),   # exactly window start → EXCLUDED (exclusive)
    (7, "2024-01-01 10:10:00", 2, "click"),
    (8, "2024-01-01 10:10:00", 2, "purchase"),   # same instant → INCLUDED (inclusive at conv)
]


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def events(spark):
    return _frame(spark, _EVENTS)


def test_attribution_window_boundaries(spark, events):
    clicks = events.filter(F.col("event_type") == "click")
    convs = events.filter(F.col("event_type") == "purchase")
    pairs = {
        (r["conv_event_id"], r["click_event_id"])
        for r in attribute_conversions(clicks, convs, "1 hour").collect()
    }
    assert pairs == {(3, 1), (3, 2), (8, 7)}  # 6 excluded (start is exclusive)


def test_last_touch_picks_latest_and_counts(spark, events):
    clicks = events.filter(F.col("event_type") == "click")
    convs = events.filter(F.col("event_type") == "purchase")
    rows = {
        r["conv_event_id"]: (r["click_event_id"], r["n_clicks"])
        for r in last_touch_attribution(clicks, convs, "1 hour").collect()
    }
    assert rows == {3: (2, 2), 8: (7, 1)}


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_stream_stream_join_matches_batch(spark, tmp_path):
    # two micro-batch files — clicks and purchases arrive interleaved
    d = tmp_path / "ev"
    d.mkdir()
    _frame(spark, _EVENTS[:4]).write.parquet(str(d / "b0.parquet"))
    _frame(spark, _EVENTS[4:]).write.parquet(str(d / "b1.parquet"))

    batch = spark.read.parquet(str(d / "*.parquet"))
    expect = sorted(
        (r["conv_event_id"], r["click_event_id"])
        for r in attribute_conversions(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
            "1 hour",
        ).collect()
    )

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    joined = attribute_conversions(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        "1 hour",
    )
    q = run_stream_to_memory(joined, "attr_join", output_mode="append")
    try:
        q.processAllAvailable()
        got = sorted(
            (r["conv_event_id"], r["click_event_id"])
            for r in spark.sql("SELECT * FROM attr_join").collect()
        )
    finally:
        q.stop()
    assert got == expect


def test_dedup_within_watermark_stream(spark, tmp_path):
    d = tmp_path / "dups"
    d.mkdir()
    rows0 = [(1, "2024-01-01 10:00:00", 1, "click"), (1, "2024-01-01 10:00:30", 1, "click")]
    rows1 = [(1, "2024-01-01 10:05:00", 1, "click"), (2, "2024-01-01 10:06:00", 1, "click")]
    _frame(spark, rows0).write.parquet(str(d / "b0.parquet"))
    _frame(spark, rows1).write.parquet(str(d / "b1.parquet"))
    schema = spark.read.parquet(str(d / "b0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    q = run_stream_to_memory(deduped, "wm_dedup", output_mode="append")
    try:
        q.processAllAvailable()
        ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM wm_dedup").collect())
    finally:
        q.stop()
    assert ids == [1, 2]  # event 1's re-deliveries dropped across batches

    # batch fallback: plain dropDuplicates, same surviving keys
    batch = spark.read.parquet(str(d / "*.parquet"))
    assert sorted(
        r["event_id"] for r in dedup_within_watermark(batch, ["event_id"]).collect()
    ) == [1, 2]


def test_enrich_stream_static_broadcast(spark, events):
    dim = spark.createDataFrame([(1, "DE"), (3, "FR")], "user_id long, country string")
    out = enrich_with_dimension(events, dim, on="user_id")
    rows = out.filter(F.col("event_id") == 1).collect()
    assert rows[0]["country"] == "DE"
    # left join keeps facts with unknown keys
    assert out.filter(F.col("country").isNull()).count() == 4
