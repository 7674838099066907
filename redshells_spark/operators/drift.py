"""Two-sample Kolmogorov-Smirnov drift test — exact, and streamable.

The KS supremum gap over two empirical CDFs folds to
``max |cum1*n2 - cum2*n1|`` — an exact int64 over one value-ordered
window on the per-value count relation — so the statistic, the
alpha=0.05 Smirnov threshold, and the reject flag are a fixed IEEE
tree over exact integers (identical operands give identical
comparisons in any engine). No p-value series expansion.

The per-value count relation is also the MERGEABLE state of the test:
counts fold additively across micro-batches, and the domain of a
fixed-decimal metric column is bounded (cents), so a streaming drift
monitor keeps a tiny state and derives the same bits as the batch
test (``streaming/drift.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.exact import money_units

# Smirnov large-sample coefficient c(alpha) for alpha = 0.05
KS_C_005 = 1.358


def ks_value_counts(
    df: DataFrame,
    value_column: str,
    flag_column: str,
    scale: int = 100,
) -> DataFrame:
    """→ (v, c1, c2): exact fixed-point value + per-sample counts —
    the additive sufficient statistics of the two-sample KS test.
    ``flag_column`` is 1 for sample 1 rows, 0 for sample 2."""
    return (
        df.select(
            money_units(F.col(value_column), scale).alias("v"),
            F.col(flag_column).cast("long").alias("is1"),
        )
        .groupBy("v")
        .agg(
            F.sum("is1").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("is1")).cast("long").alias("c2"),
        )
    )


def ks_from_value_counts(pv: DataFrame) -> DataFrame:
    """(v, c1, c2) → one row (n1, n2, d_num, d_stat, critical_005,
    reject_005). Values absent from one sample carry forward
    automatically because the cumulative sums run over the union of
    distinct values."""
    wc = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pv.select(
        "v",
        F.sum("c1").over(wc).cast("long").alias("cum1"),
        F.sum("c2").over(wc).cast("long").alias("cum2"),
    )
    n = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = (
        cum.crossJoin(F.broadcast(n))  # 1-row aggregate join
        .agg(
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            )
            .cast("long")
            .alias("d_num")
        )
    )
    d_stat = F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))
    crit = F.lit(KS_C_005) * F.sqrt(
        (F.col("n1") + F.col("n2"))
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return (
        n.crossJoin(F.broadcast(d))  # two 1-row aggregates
        .select(
            "n1",
            "n2",
            "d_num",
            d_stat.alias("d_stat"),
            crit.alias("critical_005"),
            (d_stat > crit).cast("long").alias("reject_005"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    value_column: str,
    flag_column: str,
    scale: int = 100,
) -> DataFrame:
    """Exact two-sample KS test in one call — see module docstring."""
    return ks_from_value_counts(ks_value_counts(df, value_column, flag_column, scale))
