"""Z-order layout: interleave correctness, clustering effect on file
stats, null refusal."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.layout import interleave_sql, with_zorder_key, write_zordered


def test_interleave_bijective_on_grid(spark):
    # 16×16 grid at bits=4: all 256 keys distinct, range [0, 256)
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    keyed = with_zorder_key(df, ["x", "y"], bits=4, ranges={"x": (0, 15), "y": (0, 15)})
    keys = [r["zkey"] for r in keyed.collect()]
    assert len(set(keys)) == 256 and min(keys) == 0 and max(keys) == 255


def test_known_morton_values(spark):
    # classic morton: (x=1,y=0)->1, (x=0,y=1)->2, (x=3,y=3)->15
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3)], "x long, y long")
    keyed = with_zorder_key(df, ["x", "y"], bits=2, ranges={"x": (0, 3), "y": (0, 3)})
    got = {(r["x"], r["y"]): r["zkey"] for r in keyed.collect()}
    assert got == {(1, 0): 1, (0, 1): 2, (3, 3): 15}


def test_interleave_width_guard():
    with pytest.raises(ValueError, match="int64"):
        interleave_sql(["a", "b", "c", "d"], bits=16)


def test_null_dimension_refused(spark):
    df = spark.createDataFrame([(1, 2), (None, 3)], "x long, y long")
    with pytest.raises(Exception, match="zorder"):
        with_zorder_key(df, ["x", "y"], ranges={"x": (0, 3), "y": (0, 3)}).collect()


def test_write_zordered_clusters_file_stats(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    out = str(tmp_path / "z")
    write_zordered(ev.withColumn("k", F.col("event_id") % 100), out, ["user_id", "k"], num_files=8)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 4
    # clustering: each file's user_id span should cover well under the
    # full range on average (unsorted writes cover ~100% per file)
    full_min, full_max = ev.agg(F.min("user_id"), F.max("user_id")).first()
    spans = []
    for f in files:
        mn, mx = spark.read.parquet(f).agg(F.min("user_id"), F.max("user_id")).first()
        spans.append((mx - mn) / max(full_max - full_min, 1))
    assert sum(spans) / len(spans) < 0.8
    # round-trip preserves rows
    assert spark.read.parquet(out).count() == ev.count()
