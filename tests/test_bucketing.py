"""Bucketed layout: the join between two tables bucketed on the same
key must run with ZERO Exchange (that is the entire point of paying
the write-time shuffle), and results must equal the plain join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from redshells_spark.sources.bucketing import (
    bucketed_join,
    verify_no_shuffle_join,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Bucketing pays off on large⋈large joins — at test scale AQE
    would broadcast the small side (and ignore the bucket layout), so
    pin the planner to the at-scale shape."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "bkt_orders", "o_orderkey", 8)
    write_bucketed(li, "bkt_lineitem", "o_orderkey", 8)
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on="o_orderkey")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert verify_no_shuffle_join(joined)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, on="o_orderkey").count()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == expect


def test_bucketed_aggregate_skips_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in _plan(agg)


def test_mismatched_bucket_counts_still_correct(spark, sf_dir, bucketed_tables, no_broadcast):
    # a non-bucketed side forces the usual shuffle — correctness is
    # unchanged, only the Exchange reappears (the degraded-mode check)
    lt, _ = bucketed_tables
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    joined = spark.table(lt).join(li, on="o_orderkey")
    assert "Exchange" in _plan(joined)
    assert joined.count() == li.count()


def test_write_bucketed_rejects_bad_count(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    with pytest.raises(ValueError):
        write_bucketed(df, "bkt_bad", "r_regionkey", 0)
