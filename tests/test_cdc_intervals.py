"""CDC merge (apply_changes) and interval sweep operators."""

from __future__ import annotations

import pytest

from redshells_spark.operators.cdc import apply_changes, latest_changes
from redshells_spark.operators.intervals import max_concurrency, merged_coverage


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )


def test_apply_changes_upsert_delete_insert(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (2, "b1", 21.0, 5, "U"),   # update, older version
            (2, "b2", 22.0, 9, "U"),   # update, latest wins
            (3, "c", 0.0, 7, "D"),     # delete
            (5, "e", 50.0, 3, "I"),    # insert (any non-delete op upserts)
        ],
        "k long, name string, v double, version long, op string",
    )
    out = {r["k"]: (r["name"], r["v"]) for r in
           apply_changes(base, changes, ["k"], "version").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0), 5: ("e", 50.0)}


def test_apply_changes_delete_then_reinsert_version_order(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, "x", 1.0, 2, "D"), (1, "a2", 11.0, 4, "U")],
        "k long, name string, v double, version long, op string",
    )
    out = {r["k"]: r["name"] for r in apply_changes(base, changes, ["k"], "version").collect()}
    assert out[1] == "a2"  # latest change is the re-insert


def test_apply_changes_missing_columns_refused(spark):
    base = _base(spark)
    changes = spark.createDataFrame([(1, 2, "D")], "k long, version long, op string")
    with pytest.raises(ValueError, match="missing base columns"):
        apply_changes(base, changes, ["k"], "version")


def test_latest_changes_tie_break(spark):
    changes = spark.createDataFrame(
        [(1, "first", 5, 100, "U"), (1, "second", 5, 101, "U")],
        "k long, name string, version long, seq long, op string",
    )
    got = latest_changes(changes, ["k"], "version", tie_break="seq").collect()
    assert len(got) == 1 and got[0]["name"] == "second"


# ------------------------------------------------------------- intervals


def test_max_concurrency_basic(spark):
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 30)], "s long, e long"
    )
    assert max_concurrency(iv, "s", "e").collect()[0]["max_concurrent"] == 2


def test_max_concurrency_half_open_adjacency(spark):
    # [0,5) and [5,10) never overlap: the -1 at t=5 sorts before the +1
    iv = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
    assert max_concurrency(iv, "s", "e").collect()[0]["max_concurrent"] == 1


def test_max_concurrency_grouped(spark):
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 11), ("a", 2, 12), ("b", 0, 1)],
        "g string, s long, e long",
    )
    got = {r["g"]: r["max_concurrent"] for r in
           max_concurrency(iv, "s", "e", ["g"]).collect()}
    assert got == {"a": 3, "b": 1}


def test_merged_coverage(spark):
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 30)], "s long, e long"
    )
    r = merged_coverage(iv, "s", "e").collect()[0]
    assert (r["covered"], r["n_islands"]) == (25, 2)


def test_merged_coverage_nested_and_adjacent(spark):
    # nested interval adds nothing; adjacent half-open spans fuse
    iv = spark.createDataFrame([(0, 20), (5, 10), (20, 25)], "s long, e long")
    r = merged_coverage(iv, "s", "e").collect()[0]
    assert (r["covered"], r["n_islands"]) == (25, 1)


def test_merged_coverage_grouped(spark):
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 50, 60), ("b", 0, 5)], "g string, s long, e long"
    )
    got = {r["g"]: (r["covered"], r["n_islands"]) for r in
           merged_coverage(iv, "s", "e", ["g"]).collect()}
    assert got == {"a": (20, 2), "b": (5, 1)}


def test_apply_changes_null_op_is_upsert(spark):
    # regression: op != 'D' is NULL for NULL ops — the key was
    # anti-joined out of the base but never re-inserted (silent delete).
    base = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, name string")
    changes = spark.createDataFrame(
        [(1, "new", 1, None), (3, "ins", 1, None)],
        "k long, name string, version long, op string",
    )
    out = {r["k"]: r["name"] for r in apply_changes(base, changes, ["k"], "version").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}
