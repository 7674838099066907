"""Operator-level unit tests on tiny in-memory frames — mirrors the
reference's test pattern 1 (SURVEY.md §5) with exact assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.data.frame_ops import (
    convert_to_one_hot,
    extract_column_as_dict,
    filter_by_column,
    group_by_column_as_dict,
    rename_column,
    sample_data,
    split_train_test_data,
)
from redshells_spark.schema import MissingColumnsError, require_columns


@pytest.fixture()
def kv(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (1, "b", 5), (2, "c", 1), (3, "d", 7), (3, "e", 2)],
        "k int, v string, ord int",
    )


def test_extract_column_as_dict_keep_first(kv):
    out = extract_column_as_dict(kv, "k", "v", order_by="ord")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "b", 2: "c", 3: "e"}


def test_extract_column_as_dict_any_first(kv):
    out = extract_column_as_dict(kv, "k", "v")
    assert out.count() == 3


def test_filter_by_column_missing_raises(kv):
    with pytest.raises(MissingColumnsError):
        filter_by_column(kv, ["k", "nope"])


def test_rename_column(kv):
    out = rename_column(kv, {"k": "key", "v": "value"})
    assert set(out.columns) == {"key", "value", "ord"}


def test_group_by_column_as_dict(kv):
    out = group_by_column_as_dict(kv, "k", "v")
    got = {r["k"]: r["v_list"] for r in out.collect()}
    assert got == {1: ["a", "b"], 2: ["c"], 3: ["d", "e"]}


def test_group_by_column_as_dict_drops_nulls(spark):
    df = spark.createDataFrame([(1, "a"), (1, None), (None, "x")], "k int, v string")
    out = group_by_column_as_dict(df, "k", "v")
    got = {r["k"]: r["v_list"] for r in out.collect()}
    assert got == {1: ["a"]}


def test_convert_to_one_hot(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], "id int, c string")
    out = convert_to_one_hot(df, ["c"])
    rows = {r["id"]: (r["c_x"], r["c_y"]) for r in out.collect()}
    assert rows == {1: (1, 0), 2: (0, 1), 3: (1, 0)}
    assert "c" not in out.columns


def test_split_train_test_deterministic(kv):
    tr1, te1 = split_train_test_data(kv, 0.4, seed=7)
    tr2, te2 = split_train_test_data(kv, 0.4, seed=7)
    assert tr1.count() + te1.count() == 5
    assert sorted(r["k"] for r in tr1.collect()) == sorted(r["k"] for r in tr2.collect())


def test_sample_data_exact_size_and_deterministic(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    s1 = sample_data(df, 50, seed=1, key_column="k")
    s2 = sample_data(df, 50, seed=1, key_column="k")
    ids1 = sorted(r["k"] for r in s1.collect())
    assert len(ids1) == 50
    assert ids1 == sorted(r["k"] for r in s2.collect())
    # different seed → different sample
    s3 = sample_data(df, 50, seed=2, key_column="k")
    assert ids1 != sorted(r["k"] for r in s3.collect())


def test_require_columns_ok(kv):
    assert require_columns(kv, ["k"]) is kv
