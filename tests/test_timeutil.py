"""Dual-dtype event-time regression tests.

The driver's testdata has shipped ``events.ts`` as long nanoseconds
(round 1) and as parquet timestamp[us] → TIMESTAMP_NTZ (round 2+);
the round-2 SQL-level CASE guard failed Spark's analyzer on NTZ.
These tests pin the fix: the same logical events produce *identical*
results through sessionize / windowed counts / gap math under every
physical dtype that has shipped (plus plain TIMESTAMP for good
measure).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from redshells_spark.streaming.events import sessionize, windowed_event_counts
from redshells_spark.timeutil import event_ts, event_us

# (event_id, us-since-epoch, user_id, event_type, value)
_BASE = [
    (1, 1_700_000_000_000_000, 1, "click", 1.0),
    (2, 1_700_000_060_000_000, 1, "view", 2.0),  # +60s → same session
    (3, 1_700_003_600_000_000, 1, "click", 3.0),  # +1h   → new session
    (4, 1_700_000_030_000_000, 2, "purchase", 4.0),
    (5, 1_700_007_200_000_000, 2, "click", 5.0),
]


def _variants(spark):
    """The same events under three physical ts dtypes."""
    long_nanos = spark.createDataFrame(
        [(e, us * 1000, u, t, v) for e, us, u, t, v in _BASE],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    as_ts = spark.createDataFrame(
        [
            (e, datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc), u, t, v)
            for e, us, u, t, v in _BASE
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    as_ntz = as_ts.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return {"long_nanos": long_nanos, "timestamp": as_ts, "timestamp_ntz": as_ntz}


def test_event_us_identical_across_dtypes(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    expect = {e: us for e, us, *_ in _BASE}
    for name, df in _variants(spark).items():
        got = {
            r["event_id"]: r["us"]
            for r in df.select("event_id", event_us(df, "ts").alias("us")).collect()
        }
        assert got == expect, f"dtype variant {name}: {got} != {expect}"


def test_event_ts_round_trips(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name, df in _variants(spark).items():
        out = df.select(F.unix_micros(event_ts(df, "ts")).alias("us"), "event_id")
        got = {r["event_id"]: r["us"] for r in out.collect()}
        assert got == {e: us for e, us, *_ in _BASE}, f"dtype variant {name}"


@pytest.mark.parametrize("op", ["sessionize", "windowed"])
def test_event_ops_identical_across_dtypes(spark, op):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    results = {}
    for name, df in _variants(spark).items():
        if op == "sessionize":
            out = sessionize(df, gap="30 minutes")
            key = ["user_id", "session_start"]
        else:
            out = windowed_event_counts(df, "1 hour")
            key = ["window_start", "event_type"]
        results[name] = sorted(map(tuple, out.select(*key, "n_events", "sum_value").collect()))
    assert results["long_nanos"] == results["timestamp"] == results["timestamp_ntz"]
    assert len(results["long_nanos"]) > 0


def test_sessionize_semantics(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _variants(spark)["timestamp_ntz"]
    rows = {
        (r["user_id"], r["n_events"])
        for r in sessionize(df, gap="30 minutes").collect()
    }
    # user 1: events 1+2 together (60s apart), event 3 alone; user 2: both alone
    assert rows == {(1, 2), (1, 1), (2, 1)}


def test_event_range_filter_identical_across_dtypes(spark):
    """event_range_filter keeps the same rows under every physical ts
    dtype, and agrees with the event_us() comparison it replaces."""
    from redshells_spark.timeutil import event_range_filter

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    lo, hi = 1_700_000_000_000_000, 1_700_003_600_000_000
    expect = sorted(e for e, us, *_ in _BASE if lo <= us < hi)
    for name, df in _variants(spark).items():
        got = sorted(
            r["event_id"]
            for r in df.filter(event_range_filter(df, "ts", lo, hi)).collect()
        )
        assert got == expect, f"dtype variant {name}: {got} != {expect}"
    # one-sided bounds
    df = _variants(spark)["timestamp_ntz"]
    assert df.filter(event_range_filter(df, "ts", lo_us=hi)).count() == sum(
        1 for _, us, *_ in _BASE if us >= hi
    )
