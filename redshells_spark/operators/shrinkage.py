"""Empirical-Bayes (beta-binomial) rate shrinkage.

Per-entity rates (return rate per part, CTR per item) are noise at
small n; the warehouse-standard fix is shrinking toward a beta prior
fit on the corpus itself (Robinson's batting-average construction).
The prior is method-of-moments on OBSERVED rates; to keep the fit
engine-exact the observed rates are quantized to exact e3 integers
(r_e3 = (1000·s) div n), so the two prior moments are int64 sums and
alpha/beta are doubles computed from exact integers — the CUPED
determinism class. The per-entity pass is one map-combined groupBy;
the prior is one more aggregate over the entity relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def eb_beta_binomial_shrinkage(
    per_group: DataFrame,
    group_cols: list[str],
    success_col: str,
    trials_col: str,
    min_n_prior: int = 5,
) -> DataFrame:
    """→ per group: (n, s, raw_rate_e3, alpha, beta, shrunk_rate).

    ``per_group`` has one row per entity with exact integer
    (successes, trials). Prior: method-of-moments on the e3-quantized
    rates of entities with n ≥ ``min_n_prior`` —
        k = m(1−m)/v − 1,  alpha = m·k,  beta = (1−m)·k,
    falling back to the flat Beta(1,1) when the moment condition
    fails (v = 0 or v ≥ m(1−m)). Shrunk rate = (alpha+s)/(alpha+beta+n):
    small-n entities collapse to the prior mean, large-n entities keep
    their data."""
    s, n = F.col(success_col).cast("long"), F.col(trials_col).cast("long")
    g = per_group.select(*group_cols, s.alias("s"), n.alias("n")).withColumn(
        "raw_rate_e3", F.expr("(1000 * s) div n").cast("long")
    )
    pr = g.filter(F.col("n") >= int(min_n_prior)).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("raw_rate_e3").cast("long").alias("sr"),
        F.sum(F.col("raw_rate_e3") * F.col("raw_rate_e3")).cast("long").alias("srr"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m = d("sr") / d("cnt") / F.lit(1000.0)
    v = (
        (d("cnt") * d("srr") - d("sr") * d("sr"))
        / (d("cnt") * (d("cnt") - F.lit(1.0)))
        / F.lit(1000000.0)
    )
    k = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    ok = (F.col("cnt") > 1) & (v > F.lit(0.0)) & (k > F.lit(0.0))
    pr = pr.select(
        F.when(ok, m * k).otherwise(F.lit(1.0)).alias("alpha"),
        F.when(ok, (F.lit(1.0) - m) * k).otherwise(F.lit(1.0)).alias("beta"),
    )
    out = g.crossJoin(F.broadcast(pr))
    return out.select(
        *group_cols,
        "n",
        "s",
        "raw_rate_e3",
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
        F.round(
            (F.col("alpha") + d("s")) / (F.col("alpha") + F.col("beta") + d("n")), 6
        ).alias("shrunk_rate"),
    )
