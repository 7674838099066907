"""Portable cardinality sketch: K-Minimum-Values approximate distinct.

`F.approx_count_distinct` (HyperLogLog++) is the right default at
scale, but its hash and register layout are engine-private — the
estimate is unreproducible outside Spark, so the driver can only ever
rows-check it (`approx_distinct_users`). KMV (Bar-Yossef et al. 2002)
delivers the same mergeable-sketch capability from *portable*
arithmetic: hash every value with the engine-independent md5→60-bit
fold, keep the k smallest distinct hashes per group, and estimate

    D ≈ (k-1) · 2^60 / h_(k)

where h_(k) is the k-th minimum. Every step — hashing, ranking,
the float estimate — is reproducible in any engine, so the DuckDB
oracle MATCHes the estimate bit-for-bit: an approximate aggregate
with an exact correctness check.

Scale shape: the distinct-hash dedup and the per-group top-k ranking
shuffle only (group, hash) pairs — 8-byte hashes, not values — and the
window's ``rank ≤ k`` cut is WindowGroupLimit-prunable map-side.
Groups with fewer than k distinct values short-circuit to their exact
count (the sketch holds every hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.operators.bloom import _h60_sql
from redshells_spark.schema import require_columns

TWO_POW_60 = float(1 << 60)  # exactly representable as a double


def kmv_distinct(
    df: DataFrame,
    group_columns: list[str],
    value_column: str,
    k: int = 256,
) -> DataFrame:
    """→ (*group_columns, n_hashes, kmv_estimate) — approximate
    distinct count of ``value_column`` per group.

    ``n_hashes`` = min(k, true distinct-hash count): when it is below
    k the estimate IS the exact distinct count (collisions aside).
    Standard error of the k-minimum estimator is ~1/√(k-2) (~6% at
    k=256).
    """
    require_columns(df, group_columns + [value_column])
    hashes = df.select(
        *group_columns,
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h"),
    ).dropDuplicates(group_columns + ["__h"])

    w = Window.partitionBy(*group_columns).orderBy(F.col("__h").asc())
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)

    agg = kept.groupBy(*group_columns).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("__h").alias("__hk"),
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    return agg.select(
        *group_columns,
        F.col("n_hashes").cast("long").alias("n_hashes"),
        est.alias("kmv_estimate"),
    )
