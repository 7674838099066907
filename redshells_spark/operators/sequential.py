"""Sequential hypothesis testing over an event log (Wald SPRT).

Always-valid monitoring is the warehouse-native form of A/B analysis:
per-period success/trial counts fold additively (so the same state
serves batch and streaming), and the log-likelihood ratio is LINEAR in
those counts — llr = s·ln(p1/p0) + (t−s)·ln((1−p1)/(1−p0)) — so the
two transcendentals are computed ONCE driver-side and shipped as exact
nano-unit integer literals (the NDCG-discount idiom). Everything that
aggregates is int64; the only window runs over periods (time-bounded,
never fact-scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

E9 = 1_000_000_000


def sprt_llr_literals(p0: float, p1: float) -> tuple[int, int]:
    """Per-success and per-failure log-likelihood increments in exact
    nano units: (round(1e9·ln(p1/p0)), round(1e9·ln((1−p1)/(1−p0))))."""
    return (
        round(E9 * math.log(p1 / p0)),
        round(E9 * math.log((1.0 - p1) / (1.0 - p0))),
    )


def sprt_monitor(
    period_counts: DataFrame,
    period_col: str,
    trials_col: str,
    success_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Wald sequential probability ratio test replayed over ordered
    periods: → (period, n_trials, n_success, llr_e9, cum_llr_e9,
    decision). Decision boundaries are ln((1−β)/α) / ln(β/(1−α)) in
    the same nano units; 'accept_h1' once the cumulative LLR crosses
    the upper bound, 'accept_h0' below the lower, else 'continue'.
    A decision is sticky in real monitoring; the replay reports the
    boundary state per period so the first crossing is visible."""
    la_e9, lb_e9 = sprt_llr_literals(p0, p1)
    up_e9 = round(E9 * math.log((1.0 - beta) / alpha))
    lo_e9 = round(E9 * math.log(beta / (1.0 - alpha)))
    t = period_counts.select(
        F.col(period_col).cast("long").alias("period"),
        F.col(trials_col).cast("long").alias("n_trials"),
        F.col(success_col).cast("long").alias("n_success"),
    )
    t = t.withColumn(
        "llr_e9",
        (
            F.col("n_success") * F.lit(la_e9)
            + (F.col("n_trials") - F.col("n_success")) * F.lit(lb_e9)
        ).cast("long"),
    )
    w = Window.orderBy(F.col("period").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = t.withColumn("cum_llr_e9", F.sum("llr_e9").over(w).cast("long"))
    return t.withColumn(
        "decision",
        F.when(F.col("cum_llr_e9") >= F.lit(up_e9), F.lit("accept_h1"))
        .when(F.col("cum_llr_e9") <= F.lit(lo_e9), F.lit("accept_h0"))
        .otherwise(F.lit("continue")),
    ).orderBy("period")
