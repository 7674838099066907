"""Two-phase dense-id assignment: identical ids to the single-reducer
row_number, without any single-partition exchange in the plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from redshells_spark.operators.aggregates import value_counts_id_map
from redshells_spark.operators.ids import assign_dense_ids, value_counts_id_map_scalable


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scalable_ids_match_single_reducer(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("item_id")
    )
    a = {
        (r["item_id"], r["count"], r["index"])
        for r in value_counts_id_map(li, "item_id", min_count=2).collect()
    }
    b = {
        (r["item_id"], r["count"], r["index"])
        for r in value_counts_id_map_scalable(li, "item_id", min_count=2).collect()
    }
    assert a == b
    assert len(a) > 100


def test_scalable_path_has_no_single_partition_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("item_id")
    )
    assert "SinglePartition" in _plan(
        value_counts_id_map(li, "item_id")
    )  # the wall the scalable path removes
    assert "SinglePartition" not in _plan(
        value_counts_id_map_scalable(li, "item_id")
    )


def test_assign_dense_ids_start_and_order(spark):
    df = spark.createDataFrame([(c,) for c in "edcba"], ["k"])
    out = {r["k"]: r["index"] for r in assign_dense_ids(df, ["k"], start=5).collect()}
    assert out == {"a": 5, "b": 6, "c": 7, "d": 8, "e": 9}
