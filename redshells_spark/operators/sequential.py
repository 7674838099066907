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


def group_sequential_z(
    look_counts: DataFrame,
    look_col: str,
    arm_col: str,
    trials_col: str,
    success_col: str,
    z_final: float = 1.959964,
) -> DataFrame:
    """Group-sequential two-proportion monitor with Pocock-style
    sqrt(K/k) inflated boundaries (the O'Brien-Fleming shape):
    → one row per look: cumulative (n, s) per arm, the pooled
    two-proportion z, the look's boundary z_final·sqrt(K/k), and the
    stop flag.

    ``look_counts`` has one row per (look, arm∈{0,1}) with exact
    integer trials/successes. Cumulative sums run over the look
    relation (time-bounded); z and the boundary are doubles computed
    from exact ints (identical expression trees both engines). K is
    data-derived (count of looks), so the boundary needs no plan-time
    constant beyond z_final."""
    t = look_counts.select(
        F.col(look_col).cast("long").alias("look"),
        F.col(arm_col).cast("long").alias("arm"),
        F.col(trials_col).cast("long").alias("nt"),
        F.col(success_col).cast("long").alias("ns"),
    )
    w = Window.partitionBy("arm").orderBy(F.col("look").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = t.select(
        "look",
        "arm",
        F.sum("nt").over(w).cast("long").alias("cn"),
        F.sum("ns").over(w).cast("long").alias("cs"),
    )
    wide = cum.groupBy("look").agg(
        F.max(F.when(F.col("arm") == 1, F.col("cn"))).cast("long").alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("cs"))).cast("long").alias("s1"),
        F.max(F.when(F.col("arm") == 0, F.col("cn"))).cast("long").alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("cs"))).cast("long").alias("s0"),
    )
    ktot = wide.agg(F.count(F.lit(1)).cast("long").alias("k_total"))
    wk = Window.orderBy(F.col("look").asc())
    wide = (
        wide.crossJoin(F.broadcast(ktot))
        .withColumn("k_idx", F.row_number().over(wk).cast("long"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pp = (d("s1") + d("s0")) / (d("n1") + d("n0"))
    se = F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / d("n1") + F.lit(1.0) / d("n0"))
    )
    z = F.when(
        (F.col("n1") > 0) & (F.col("n0") > 0) & (se > F.lit(0.0)),
        F.round((d("s1") / d("n1") - d("s0") / d("n0")) / se, 6),
    )
    bound = F.round(F.lit(z_final) * F.sqrt(d("k_total") / d("k_idx")), 6)
    return (
        wide.withColumn("z", z)
        .withColumn("z_bound", bound)
        .withColumn(
            "stop",
            F.coalesce(
                (F.abs(F.col("z")) >= F.col("z_bound")).cast("long"), F.lit(0)
            ),
        )
        .select(
            "look", "k_idx", "k_total", "n1", "s1", "n0", "s0", "z", "z_bound", "stop"
        )
        .orderBy("look")
    )
