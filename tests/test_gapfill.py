"""time_bucket_gapfill: hand-computed fills, totality, span guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from redshells_spark.operators.gapfill import time_bucket_gapfill


def _events(spark, rows):
    # rows: (key, epoch_seconds, value); ts as long nanos exercises the
    # dtype-dispatch path of timeutil.event_us
    return spark.createDataFrame(
        [(k, s * 1_000_000_000, float(v)) for k, s, v in rows],
        "user_id long, ts long, value double",
    )


def test_hand_computed_fills(spark):
    h = 3600
    df = _events(
        spark,
        [
            (1, 0 * h, 10.0),  # bucket 0
            (1, 1 * h, 20.0),  # bucket 1... then gap at 2, 3
            (1, 4 * h + 5, 50.0),  # bucket 4
        ],
    )
    out = {
        r["bucket"]: r
        for r in time_bucket_gapfill(df, "user_id", "value", bucket_seconds=h).collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert out[2]["is_gap"] == 1 and out[3]["is_gap"] == 1
    assert out[2]["v_locf"] == 20.0 and out[3]["v_locf"] == 20.0
    # linear between (1, 20) and (4, 50): bucket 2 → 30, bucket 3 → 40
    assert out[2]["v_interp"] == pytest.approx(30.0)
    assert out[3]["v_interp"] == pytest.approx(40.0)
    # observed rows pass through unchanged
    assert out[4]["v_locf"] == 50.0 and out[4]["v_interp"] == 50.0
    assert out[0]["bucket_start"] == 0 and out[1]["bucket_start"] == h


def test_fills_are_total_no_edge_nulls(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_bucket_gapfill(ev, "user_id", "value", bucket_seconds=3600)
    assert out.filter(F.col("v_locf").isNull() | F.col("v_interp").isNull()).count() == 0


def test_span_guard_refuses_unbounded_grid(spark):
    df = _events(spark, [(1, 0, 1.0), (1, 10_000_000, 2.0)])
    with pytest.raises(Exception, match="max_buckets_per_key"):
        time_bucket_gapfill(
            df, "user_id", "value", bucket_seconds=1, max_buckets_per_key=1000
        ).collect()
