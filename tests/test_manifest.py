"""Manifest data skipping: pruning correctness (same rows as the plain
filter), real skipping on sorted layout, empty-range behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshells_spark.sources.manifest import prune_files, read_pruned, write_with_manifest


def test_pruned_read_equals_plain_filter(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id", "value")
    path = str(tmp_path / "m")
    write_with_manifest(ev, path, ["user_id"], num_files=8, order_by=["user_id"])

    lo, hi = 3, 5
    got = read_pruned(spark, path, "user_id", lo, hi)
    want = spark.read.parquet(path).filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # sorted layout → a 3-user range must not touch every file
    keep, total = prune_files(spark, path, "user_id", lo, hi)
    assert total >= 6
    assert len(keep) < total


def test_empty_range_returns_no_rows(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    path = str(tmp_path / "m2")
    write_with_manifest(ev, path, ["user_id"], num_files=4, order_by=["user_id"])
    out = read_pruned(spark, path, "user_id", 10**9, 10**9 + 1)
    assert out.count() == 0


def test_manifest_invisible_to_plain_reads(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    path = str(tmp_path / "m3")
    write_with_manifest(ev, path, ["user_id"], num_files=2)
    # underscore-prefixed manifest dir must not pollute the data read
    assert spark.read.parquet(path).count() == ev.count()
    assert set(spark.read.parquet(path).columns) == {"event_id", "user_id"}
