"""Time-bucket gap-fill with LOCF and linear interpolation.

The hypertable-style rollup family (TimescaleDB ``time_bucket_gapfill``,
InfluxDB ``fill()``): bucket an event stream into fixed windows per
key, then materialize the *missing* buckets inside each key's observed
span and fill them — last-observation-carried-forward and linear
interpolation between the bracketing observations. The reference engine
has no time-series tier (SURVEY §2.J); this extends the events cluster
(sessionize / windowed counts / gaps) the same way `operators/asof.py`
does.

Spark-first shape:

- one ``groupBy(key, bucket)`` aggregation (map-side partial avg);
- per-key spans from a second tiny aggregate; the dense grid comes from
  ``explode(sequence(b0, b1))`` — generated *distributed*, sized by
  each key's own span, never a driver loop;
- a runtime ``assert_true`` refuses keys whose span exceeds
  ``max_buckets_per_key`` — at 100 TB a single key with a decade of
  1-second buckets would otherwise explode the grid silently;
- fills are two window passes over the grid (``last(..., ignorenulls)``
  forward, ``first(..., ignorenulls)`` backward-looking frame), all
  whole-stage codegen; no Python, no collect.

Because the grid spans exactly [min observed bucket, max observed
bucket] per key, the first and last grid rows are always observed, so
LOCF and interpolation are total (no edge NULLs) — a property the
DuckDB oracle checks bit-for-bit after in-query rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns
from redshells_spark.timeutil import event_us


def time_bucket_gapfill(
    events: DataFrame,
    key_column: str,
    value_column: str,
    ts_column: str = "ts",
    bucket_seconds: int = 3600,
    max_buckets_per_key: int = 1_000_000,
    value_round_digits: int | None = 10,
) -> DataFrame:
    """→ (key, bucket, bucket_start, is_gap, v_locf, v_interp), one row
    per key per bucket in the key's observed span.

    ``v_locf`` carries the last observed per-bucket average forward;
    ``v_interp`` linearly interpolates between the bracketing observed
    buckets (observed rows pass through unchanged in both).
    """
    require_columns(events, [key_column, value_column, ts_column])
    bucket_us = bucket_seconds * 1_000_000
    k = F.col(key_column)

    # double summation is order-dependent; rounding the per-bucket
    # average (default 10 decimals) pins the fills' *inputs* so the
    # downstream interpolation is bit-reproducible across engines
    v_agg = F.avg(value_column)
    if value_round_digits is not None:
        v_agg = F.round(v_agg, value_round_digits)
    obs = (
        events.withColumn("__us", event_us(events, ts_column))
        .withColumn("bucket", F.expr(f"__us div {bucket_us}"))
        .groupBy(key_column, "bucket")
        .agg(v_agg.alias("v"))
    )

    span = obs.groupBy(key_column).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        k,
        F.explode(
            F.sequence(
                "b0",
                # the guard rides inside the expression: a key whose span
                # exceeds the cap fails the job loudly instead of
                # silently materializing an unbounded grid
                F.when(
                    F.col("b1") - F.col("b0") < F.lit(max_buckets_per_key),
                    F.col("b1"),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"time_bucket_gapfill: key span exceeds "
                                f"max_buckets_per_key={max_buckets_per_key}: "
                            ),
                            k.cast("string"),
                        )
                    ).cast("long")
                ),
            )
        ).alias("bucket"),
    )

    full = grid.join(obs, on=[key_column, "bucket"], how="left")

    w_fwd = (
        Window.partitionBy(key_column)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(key_column)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("v")
    obs_bucket = F.when(v.isNotNull(), F.col("bucket"))
    prev_v = F.last(v, ignorenulls=True).over(w_fwd)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(w_fwd)
    next_v = F.first(v, ignorenulls=True).over(w_bwd)
    next_b = F.first(obs_bucket, ignorenulls=True).over(w_bwd)

    interp = F.when(v.isNotNull(), v).otherwise(
        prev_v
        + (next_v - prev_v)
        * (F.col("bucket") - prev_b)
        / (next_b - prev_b)
    )

    return full.select(
        k,
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") * bucket_seconds).cast("long").alias("bucket_start"),
        v.isNull().cast("int").alias("is_gap"),
        prev_v.alias("v_locf"),
        interp.alias("v_interp"),
    )
