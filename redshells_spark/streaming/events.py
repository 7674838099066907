"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.J: streaming absent) — this
module is the beyond-reference extension for the events table:
watermarked tumbling/sliding window aggregation, session windows, and
a streaming variant of the click-counting stage of
``make_click_train_data``.

Batch/stream parity: every function takes either a static or a
streaming DataFrame (the transformations are identical — Structured
Streaming's contract), so the batch oracle checks the same plan the
stream runs. Event timestamps have shipped as both long-nanos and
timestamp[us] across testdata generations; ``timeutil.event_ts``
dispatches on the column's actual dtype (a SQL-level CASE guard cannot
— Spark type-checks both branches at analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redshells_spark.functions.exact import exact_money_sum
from redshells_spark.timeutil import event_ts


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of parquet event files —
    the local stand-in for Kafka; swap ``format('kafka')`` in prod.

    Streaming sources need an explicit schema; by default we take it
    from a batch read of the files already present, so the stream
    matches whatever physical types the producer wrote (long-nanos vs
    timestamp[us] — both have shipped) instead of hard-coding one.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str = "2 hours",
    ts_column: str = "ts",
) -> DataFrame:
    """Tumbling/sliding window counts + value sums per event_type.
    Watermark bounds state for late data; on a static frame the
    watermark is a no-op and the result is the batch oracle."""
    with_time = events.withColumn("__t", event_ts(events, ts_column))
    if with_time.isStreaming:
        with_time = with_time.withWatermark("__t", watermark)
    window = (
        F.window("__t", window_duration, slide_duration)
        if slide_duration
        else F.window("__t", window_duration)
    )
    return (
        with_time.groupBy(window.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # order-free exact cent sum — a float sum + round can flip
            # a boundary when micro-batch/partition order changes
            exact_money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_column: str = "ts",
    user_column: str = "user_id",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming uses
    ``F.session_window`` state; the same expression evaluates on a
    static frame for the batch oracle."""
    with_time = events.withColumn("__t", event_ts(events, ts_column))
    if with_time.isStreaming:
        with_time = with_time.withWatermark("__t", watermark)
    return (
        with_time.groupBy(F.session_window("__t", gap).alias("w"), user_column)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            user_column,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_click_counts(
    events: DataFrame,
    user_column: str = "user_id",
    type_column: str = "event_type",
) -> DataFrame:
    """Streaming counterpart of the click-count stage of
    ``make_click_train_data`` — running (user, event_type) counts
    (complete/update output mode)."""
    return events.groupBy(user_column, type_column).agg(
        F.count(F.lit(1)).alias("n")
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> "StreamingQuery":  # noqa: F821
    """Test/debug sink: materialize a streaming query into the
    in-memory table ``query_name``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
