"""Survival analysis: Kaplan-Meier product-limit estimator.

User-lifetime / churn curves over event logs. The estimator runs
entirely on the DISTINCT-DURATION level table (bounded by the
observation window in days, NOT by user count), so the plan is one
map-combined per-user aggregation, one level-table groupBy, and a
window over <= a-few-hundred rows — scale-free past the first shuffle.

Determinism: at-risk/death counts are exact int64 prefix sums; the
survival product S(t) = prod(1 - d_i/n_i) is computed as
exp(cumsum(ln(...))) where each ln argument is a single double
division of exact integers and the cumulative sum runs in the SAME
ascending duration order on both engines (window frames accumulate in
frame order), then rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier survival curve from (duration, event) rows, where
    event=1 marks an observed death/churn and event=0 right-censoring
    (Kaplan & Meier 1958). Returns one row per distinct duration with
    at least one death: duration, n_risk, n_events, survival (r6)."""
    lvl = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_at_t"),
        F.sum(F.col(event_col)).cast("long").alias("d_at_t"),
    )
    total = lvl.agg(F.sum("n_at_t").cast("long").alias("n_total"))
    w_before = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lvl = (
        lvl.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_at_t").over(w_before), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "ln_term",
            # d == n_risk means S drops to exactly 0: ln is undefined
            # (NULL in Spark, -inf in DuckDB) so both engines get a
            # huge-negative sentinel whose exp underflows to +0.0
            F.when(F.col("d_at_t") >= F.col("n_risk"), F.lit(-1.0e30))
            .when(
                F.col("d_at_t") > 0,
                F.log(
                    F.lit(1.0)
                    - F.col("d_at_t").cast("double") / F.col("n_risk").cast("double")
                ),
            )
            .otherwise(F.lit(0.0)),
        )
    )
    w_cum = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = lvl.withColumn("survival", F.round(F.exp(F.sum("ln_term").over(w_cum)), 6))
    return (
        out.filter(F.col("d_at_t") > 0)
        .select(
            F.col("t").cast("long").alias(duration_col),
            "n_risk",
            F.col("d_at_t").alias("n_events"),
            "survival",
        )
        .orderBy(duration_col)
    )
