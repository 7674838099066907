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


def kmv_set_algebra(
    df: DataFrame,
    group_column: str,
    value_column: str,
    k: int = 256,
    max_groups: int = 1000,
) -> DataFrame:
    """Pairwise set-algebra estimates between every pair of groups'
    value sets, computed entirely from mergeable KMV sketches
    (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    Multiset Operations", SIGMOD 2007):

    - merge two sketches = k smallest of the hash union;
    - union estimate from the merged k-th minimum;
    - Jaccard estimate ρ = fraction of merged hashes present in BOTH
      input sketches; intersection estimate = ρ · union-estimate.

    → (g1, g2, n_kept, inter_hashes, union_est, inter_est, jaccard_est)
    for every unordered pair g1 < g2.

    Scale shape: raw values are touched exactly once (the per-group
    k-min sketch); all pair math runs over ≤ k·|groups| hash rows.
    Pair enumeration is quadratic in |groups| — this operator compares
    a bounded set of cohorts (refuses above ``max_groups``), not an
    unbounded key domain.
    """
    require_columns(df, [group_column, value_column])
    hashes = df.select(
        F.col(group_column).alias("__g"),
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h"),
    ).dropDuplicates(["__g", "__h"])
    w = Window.partitionBy("__g").orderBy(F.col("__h").asc())
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)

    n_groups = df.select(group_column).distinct().limit(max_groups + 1).count()
    if n_groups > max_groups:
        raise ValueError(
            f"kmv_set_algebra: more than {max_groups} groups — pairwise "
            "comparison is quadratic in the group count; aggregate or filter first"
        )

    pairs = (
        kept.select(F.col("__g").alias("g1"))
        .distinct()
        .join(kept.select(F.col("__g").alias("g2")).distinct(), F.col("g1") < F.col("g2"))
    )
    a = pairs.join(kept.select(F.col("__g").alias("g1"), "__h"), "g1").select(
        "g1", "g2", "__h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    b = pairs.join(kept.select(F.col("__g").alias("g2"), "__h"), "g2").select(
        "g1", "g2", "__h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        a.unionByName(b)
        .groupBy("g1", "g2", "__h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("g1", "g2").orderBy(F.col("__h").asc())
    top = merged.withColumn("__rn", F.row_number().over(wp)).filter(F.col("__rn") <= k)
    agg = top.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_hashes"),
    )
    union_est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    rho = F.col("inter_hashes").cast("double") / F.col("n_kept")
    return agg.select(
        "g1",
        "g2",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("inter_hashes").cast("long").alias("inter_hashes"),
        F.round(union_est, 4).alias("union_est"),
        F.round(rho * union_est, 4).alias("inter_est"),
        F.round(rho, 4).alias("jaccard_est"),
    )
