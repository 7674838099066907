"""Bradley-Terry MM fit: recovery, invariants, and the SQL unroll."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest


def _matches(spark):
    # deterministic round-robin where a always beats b/c/d, b beats
    # c/d, c beats d — with a few upsets so no skill hits 0 or 1
    rows = []
    beats = {
        ("a", "b"): (8, 2),
        ("a", "c"): (9, 1),
        ("a", "d"): (10, 0),
        ("b", "c"): (7, 3),
        ("b", "d"): (8, 2),
        ("c", "d"): (6, 4),
    }
    for (x, y), (wx, wy) in beats.items():
        rows += [(x, y)] * wx + [(y, x)] * wy
    return spark.createDataFrame(rows, ["winner", "loser"])


def test_bt_recovers_ordering(spark):
    from redshells_spark.ml.bradley_terry import bradley_terry_ratings

    out = {
        r["item"]: r["rating"]
        for r in bradley_terry_ratings(_matches(spark), iterations=30).collect()
    }
    assert out["a"] > out["b"] > out["c"] > out["d"] > 0
    assert abs(sum(out.values()) - 1.0) < 1e-9  # simplex


def test_bt_win_counts(spark):
    from redshells_spark.ml.bradley_terry import bradley_terry_ratings

    out = {r["item"]: r for r in bradley_terry_ratings(_matches(spark)).collect()}
    assert out["a"]["w"] == 27 and out["d"]["w"] == 6
    assert out["a"]["n_matches"] == 30  # 3 opponents x 10


def test_bt_partitioning_invariant(spark):
    from redshells_spark.ml.bradley_terry import bradley_terry_ratings

    m = _matches(spark)
    a = sorted(
        (r["item"], round(r["rating"], 4))
        for r in bradley_terry_ratings(m, iterations=20).collect()
    )
    b = sorted(
        (r["item"], round(r["rating"], 4))
        for r in bradley_terry_ratings(m.repartition(7), iterations=20).collect()
    )
    assert a == b


def test_bt_sql_unroll_matches_spark(spark):
    """The generated DuckDB unroll computes the same ratings as the
    Spark MM loop on the same match log."""
    from redshells_spark.ml.bradley_terry import (
        bradley_terry_ratings,
        bradley_terry_sql,
    )

    m = _matches(spark)
    spark_out = {
        r["item"]: round(r["rating"], 4)
        for r in bradley_terry_ratings(m, iterations=20).collect()
    }
    pdf = m.toPandas()
    con = duckdb.connect()
    con.register("match_log", pdf)
    sql = bradley_terry_sql(
        "matches AS (SELECT winner, loser FROM match_log)", iterations=20
    )
    duck_out = {item: rating for item, rating, _, _ in con.execute(sql).fetchall()}
    assert spark_out == pytest.approx(duck_out, abs=1e-4)
