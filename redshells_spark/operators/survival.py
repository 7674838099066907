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
    ).localCheckpoint(eager=True)  # duration-level bounded; the total
    # probe and the risk-set window both consume it — unpinned, the
    # caller's fact-scale duration pipeline re-ran per consumer
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


def nelson_aalen(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator H(t) = sum(d_i/n_i)
    over event times t_i <= t (Aalen 1978), the additive companion to
    :func:`kaplan_meier`. Same scale shape: everything runs on the
    distinct-duration level table.

    Determinism is STRONGER than KM's exp(cumsum(ln)): each hazard
    increment is the pure integer division d*1e9 div n (and d*1e12 div
    n^2 for the variance), so the cumulative sums are exact int64 —
    no float is ever aggregated. Output: duration, n_risk, n_events,
    cum_hazard (e9, rounded 6), hazard_se (rounded 6)."""
    lvl = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_at_t"),
        F.sum(F.col(event_col)).cast("long").alias("d_at_t"),
    ).localCheckpoint(eager=True)  # duration-level bounded; the total
    # probe and the risk-set window both consume it — unpinned, the
    # caller's fact-scale duration pipeline re-ran per consumer
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
            "haz_e9",
            F.expr("d_at_t * 1000000000 div n_risk").cast("long"),
        )
        .withColumn(
            "var_e12",
            F.expr("d_at_t * 1000000000000 div (n_risk * n_risk)").cast("long"),
        )
    )
    w_cum = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = lvl.withColumn(
        "cum_haz_e9", F.sum("haz_e9").over(w_cum).cast("long")
    ).withColumn("cum_var_e12", F.sum("var_e12").over(w_cum).cast("long"))
    return (
        out.filter(F.col("d_at_t") > 0)
        .select(
            F.col("t").cast("long").alias(duration_col),
            "n_risk",
            F.col("d_at_t").alias("n_events"),
            F.round(F.col("cum_haz_e9").cast("double") / F.lit(1.0e9), 6).alias(
                "cum_hazard"
            ),
            F.round(
                F.sqrt(F.col("cum_var_e12").cast("double") / F.lit(1.0e12)), 6
            ).alias("hazard_se"),
        )
        .orderBy(duration_col)
    )


def log_rank(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "grp",
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) on (duration, event,
    group) rows with group values {0, 1}. One row out: n_times,
    o1/o2 (observed deaths), e1 (expected under H0, e9-quantized
    integer sum), var_e9, chi2, z.

    Per event time the expected count e1 = d*n1/n and the
    hypergeometric variance v = e1*(n2/n)*((n-d)/(n-1)) are single
    double expressions over exact int64 level counts, quantized to
    nano-units with floor(x*1e9 + 0.5) BEFORE aggregation — the sums
    that cross rows are integer, so the statistic is bit-stable under
    any partition order and any engine."""
    lvl = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.when(F.col(group_col) == 0, 1).otherwise(0)).cast("long").alias("a1"),
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("a2"),
        F.sum(F.when(F.col(group_col) == 0, F.col(event_col)).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col(group_col) == 1, F.col(event_col)).otherwise(0))
        .cast("long")
        .alias("d2"),
    ).localCheckpoint(eager=True)  # same pin as kaplan_meier/nelson_aalen
    total = lvl.agg(
        F.sum("a1").cast("long").alias("t1"), F.sum("a2").cast("long").alias("t2")
    )
    w_before = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lvl = (
        lvl.crossJoin(F.broadcast(total))
        .withColumn(
            "n1r",
            (F.col("t1") - F.coalesce(F.sum("a1").over(w_before), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn(
            "n2r",
            (F.col("t2") - F.coalesce(F.sum("a2").over(w_before), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn("dj", (F.col("d1") + F.col("d2")).cast("long"))
        .withColumn("nj", (F.col("n1r") + F.col("n2r")).cast("long"))
        .filter(F.col("dj") > 0)
    )
    # IDENTICAL IEEE expression trees to the SQL oracle: left-assoc
    # chains of casts, quantized per level, summed as int64
    e1d = (
        F.col("dj").cast("double")
        * F.col("n1r").cast("double")
        / F.col("nj").cast("double")
    )
    vd = (
        e1d
        * F.col("n2r").cast("double")
        / F.col("nj").cast("double")
        * (F.col("nj") - F.col("dj")).cast("double")
        / (F.col("nj") - F.lit(1)).cast("double")
    )
    q = lvl.select(
        "d1",
        "d2",
        F.floor(e1d * F.lit(1.0e9) + F.lit(0.5)).cast("long").alias("e1_e9"),
        F.when(F.col("nj") > 1, F.floor(vd * F.lit(1.0e9) + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("v_e9"),
    )
    agg = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d2").cast("long").alias("o2"),
        F.sum("e1_e9").cast("long").alias("se1_e9"),
        F.sum("v_e9").cast("long").alias("sv_e9"),
    )
    e1 = F.col("se1_e9").cast("double") / F.lit(1.0e9)
    v = F.col("sv_e9").cast("double") / F.lit(1.0e9)
    dev = F.col("o1").cast("double") - e1
    return agg.select(
        "n_times",
        "o1",
        "o2",
        F.round(e1, 6).alias("e1"),
        F.round(v, 6).alias("var_lr"),
        F.round(dev * dev / v, 6).alias("chi2"),
        F.round(dev / F.sqrt(v), 6).alias("z"),
    )
