"""Write-with-audit: observed metrics match recomputed ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.observe import audit_metrics, write_parquet_with_audit


def test_observed_metrics_match_ground_truth(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    metrics = audit_metrics(ev, ["user_id", "value"]) + [
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    ]
    out = str(tmp_path / "audited")
    got = write_parquet_with_audit(ev, out, metrics)

    truth = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nu"),
        F.min("event_id").alias("mn"),
        F.max("event_id").alias("mx"),
    ).collect()[0]
    assert got["n_rows"] == truth["n"]
    assert got["nulls_user_id"] == truth["nu"]
    assert (got["min_id"], got["max_id"]) == (truth["mn"], truth["mx"])

    # the write really happened and round-trips
    assert spark.read.parquet(out).count() == truth["n"]


def test_empty_write_refused(spark, tmp_path):
    df = spark.createDataFrame([], "a long")
    with pytest.raises(ValueError, match="0 rows"):
        write_parquet_with_audit(df, str(tmp_path / "e"), audit_metrics(df))
