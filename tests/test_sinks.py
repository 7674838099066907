from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from redshells_spark.sources.sinks import compact, write_partitioned


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.range(1000).withColumn("part", (F.col("id") % 4).cast("string"))
    out = str(tmp_path / "p")
    write_partitioned(df, out, partition_by=["part"])
    # hive layout on disk
    assert sorted(os.path.basename(p) for p in glob.glob(f"{out}/part=*")) == [
        "part=0", "part=1", "part=2", "part=3",
    ]
    # partition filter prunes directories (partition count visible in plan)
    back = spark.read.parquet(out).filter(F.col("part") == "2")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert back.count() == 250


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    import contextlib, io

    from redshells_spark.sources.sinks import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        a = spark.range(2000).withColumn("v", F.col("id") * 2)
        b = spark.range(2000).withColumn("w", F.col("id") * 3)
        write_bucketed_table(a, "bucketed_a", ["id"], num_buckets=4, sort_by=["id"])
        write_bucketed_table(b, "bucketed_b", ["id"], num_buckets=4, sort_by=["id"])
        joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), on="id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located bucketed join: sort-merge with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_compact_reduces_files(spark, tmp_path):
    df = spark.range(10000)
    src = str(tmp_path / "many")
    df.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32
    compact(spark, src, target_file_mb=512)
    out_files = glob.glob(f"{src}_compacted/*.parquet")
    assert len(out_files) == 1
    assert spark.read.parquet(f"{src}_compacted").count() == 10000


def test_merge_upsert_first_write_and_updates(spark, tmp_path):
    from redshells_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], "k long, v long, payload string"
    )
    merge_upsert(spark, path, base, ["k"], "v")
    assert spark.read.parquet(path).count() == 3

    # update k=2, insert k=4; stale update (v lower) for k=3 must lose
    upd = spark.createDataFrame(
        [(2, 5, "b2"), (4, 1, "d"), (3, 0, "stale")], "k long, v long, payload string"
    )
    merge_upsert(spark, path, upd, ["k"], "v")
    got = {r["k"]: (r["v"], r["payload"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: (1, "a"), 2: (5, "b2"), 3: (1, "c"), 4: (1, "d")}


def test_merge_upsert_tie_prefers_update(spark, tmp_path):
    from redshells_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "tbl2")
    merge_upsert(spark, path, spark.createDataFrame([(1, 7, "old")], "k long, v long, p string"), ["k"], "v")
    merge_upsert(spark, path, spark.createDataFrame([(1, 7, "new")], "k long, v long, p string"), ["k"], "v")
    assert spark.read.parquet(path).collect()[0]["p"] == "new"
