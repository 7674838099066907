"""Stream-stream and stream-static joins over the events stream.

The reference is batch-only (SURVEY.md §2.J) — this extends the
streaming tier with the two join shapes Structured Streaming supports:

- **stream-stream inner join with an event-time range condition**
  (attribution: purchase ⋈ preceding click of the same user within a
  window). Watermarks on BOTH sides bound the join state — without
  them the runtime would have to buffer each side forever. The range
  condition tells the engine how long a row can possibly match, so
  state for rows older than ``watermark + window`` is evicted.
- **stream-static broadcast join** (dimension enrichment) — the
  static side is re-read per micro-batch but never shuffled.

Batch/stream parity: each builder takes static OR streaming frames;
on static frames the watermark is a no-op and the identical
expression tree is the batch oracle that `queries.py` registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.timeutil import event_ts


def attribute_conversions(
    clicks: DataFrame,
    conversions: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    ts_column: str = "ts",
    user_column: str = "user_id",
) -> DataFrame:
    """Each conversion joined to every preceding click by the same user
    within ``attribution_window`` (inclusive bounds at the conversion
    instant, exclusive at window start).

    → (user_id, conv_event_id, conv_time, click_event_id, click_time)

    At scale: the equi-key (user_id) partitions state; the time-range
    predicate bounds its lifetime. On a static frame this is a plain
    non-equi hash join — the batch oracle for the streaming plan.
    """
    c = clicks.select(
        F.col(user_column).alias("user_id"),
        F.col("event_id").alias("click_event_id"),
        event_ts(clicks, ts_column).alias("click_time"),
    )
    v = conversions.select(
        F.col(user_column).alias("cv_user_id"),
        F.col("event_id").alias("conv_event_id"),
        event_ts(conversions, ts_column).alias("conv_time"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_time", watermark)
    if v.isStreaming:
        v = v.withWatermark("conv_time", watermark)
    window = F.expr(f"INTERVAL {attribution_window}")
    joined = v.join(
        c,
        (F.col("cv_user_id") == F.col("user_id"))
        & (F.col("click_time") <= F.col("conv_time"))
        & (F.col("click_time") > F.col("conv_time") - window),
    )
    return joined.select(
        "user_id", "conv_event_id", "conv_time", "click_event_id", "click_time"
    )


def last_touch_attribution(
    clicks: DataFrame,
    conversions: DataFrame,
    attribution_window: str = "1 hour",
    ts_column: str = "ts",
    user_column: str = "user_id",
) -> DataFrame:
    """Batch attribution rollup: per conversion, the LAST click in the
    window (ties broken by click id), plus how many clicks competed.
    Built on :func:`attribute_conversions` + one max_by-style window —
    batch-only (streaming emits the exploded pairs; pick-latest is a
    downstream batch compaction, the usual lambda-free split)."""
    from pyspark.sql import Window

    pairs = attribute_conversions(
        clicks, conversions, attribution_window, ts_column=ts_column, user_column=user_column
    )
    w = (
        Window.partitionBy("conv_event_id")
        .orderBy(F.col("click_time").desc(), F.col("click_event_id").desc())
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_clicks", F.count(F.lit(1)).over(Window.partitionBy("conv_event_id")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def enrich_with_dimension(
    stream: DataFrame, dimension: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: broadcast the (small) static dimension into
    every micro-batch. Left join keeps events whose key is absent from
    the dimension (late dimension loads must not drop facts)."""
    return stream.join(F.broadcast(dimension), on=on, how=how)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_column: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps state only ``watermark``
    long (plain dropDuplicates on a stream grows state forever). On a
    static frame falls back to plain dropDuplicates — same rows, no
    state semantics to honor."""
    with_time = stream.withColumn("__t", event_ts(stream, ts_column))
    if not with_time.isStreaming:
        return with_time.dropDuplicates(keys).drop("__t")
    return (
        with_time.withWatermark("__t", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .drop("__t")
    )
