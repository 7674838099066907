"""Distribution-level embedding distances.

Frechet distance between embedding GROUPS (the FID/FD construction of
Heusel et al. 2017, diagonal-covariance form): compare the Gaussian
fit of two populations of vectors instead of pairwise rows. The data-
health use is drift between sources/labels/snapshots of an embedding
column — "did the encoder or the corpus move" — at any scale, because
the whole computation reduces to per-(group, dim) first and second
moments: one explode + one aggregation over the fact table, then a
group-bounded pair join over (|groups| x dims) summary rows.

Determinism: per-(group,dim) sums of float vectors are rounded to 9
decimals AFTER aggregation (house rule — absorbs double reassociation
noise), all downstream math is scalar expressions on those identical
rounded doubles, and the final per-pair sums over <= dims rounded
terms are rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groupwise_moments(
    emb: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-(group, dim) count / mean / population variance of a vector
    column: posexplode + one map-combined aggregation. Moments are
    derived from round-9 Σv and Σv² (never engine var_pop, whose
    accumulation path differs across engines)."""
    ex = emb.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("grp", "dim", F.col("v").cast("double").alias("v"))
    agg = ex.groupBy("grp", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("v"), 9).alias("s1"),
        F.round(F.sum(F.col("v") * F.col("v")), 9).alias("s2"),
    )
    mean = F.col("s1") / F.col("n").cast("double")
    return agg.select(
        "grp",
        "dim",
        "n",
        mean.alias("mean"),
        F.greatest(
            F.col("s2") / F.col("n").cast("double") - mean * mean, F.lit(0.0)
        ).alias("var"),
    )


def frechet_diagonal_distance(
    emb: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Pairwise diagonal-covariance Frechet distance between every
    unordered pair of embedding groups:

        FD² = Σ_d (μ1−μ2)² + Σ_d (σ1² + σ2² − 2·sqrt(σ1²·σ2²))

    (the exact Frechet formula when both covariances are diagonal).
    Returns (group_a, group_b, n_a, n_b, mean_dist2, cov_dist2, fd2),
    group_a < group_b, doubles rounded to 6."""
    m = groupwise_moments(emb, group_col, vec_col)
    a = m.select(
        F.col("grp").alias("group_a"),
        "dim",
        F.col("n").alias("n_a"),
        F.col("mean").alias("m_a"),
        F.col("var").alias("v_a"),
    )
    b = m.select(
        F.col("grp").alias("group_b"),
        F.col("dim").alias("dim_b"),
        F.col("n").alias("n_b"),
        F.col("mean").alias("m_b"),
        F.col("var").alias("v_b"),
    )
    pairs = a.join(
        b, (F.col("dim") == F.col("dim_b")) & (F.col("group_a") < F.col("group_b"))
    )
    md = (F.col("m_a") - F.col("m_b")) * (F.col("m_a") - F.col("m_b"))
    cd = (
        F.col("v_a")
        + F.col("v_b")
        - F.lit(2.0) * F.sqrt(F.col("v_a") * F.col("v_b"))
    )
    per_dim = pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(md, 9).alias("md9"),
        F.round(cd, 9).alias("cd9"),
    )
    return (
        per_dim.groupBy("group_a", "group_b")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.round(F.sum("md9"), 6).alias("mean_dist2"),
            F.round(F.sum("cd9"), 6).alias("cov_dist2"),
            F.round(F.sum("md9") + F.sum("cd9"), 6).alias("fd2"),
        )
        .orderBy("group_a", "group_b")
    )
