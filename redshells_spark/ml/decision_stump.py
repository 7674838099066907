"""Exact distributed decision-stump induction (depth-1 CART).

Tree induction is usually approximate at scale (quantile-binned
histograms — MLlib, XGBoost) and RNG-seeded, so fits are engine
private. A depth-1 stump over binary labels needs none of that: the
classic sort-free formulation — per feature, aggregate (value → count,
positives), prefix-sum with a window, score every split boundary from
the prefix counts — is exact, deterministic, and one aggregate + one
window per feature.

Numeric discipline: all counts are integers; the weighted Gini cost

    G(t) = (nL² − posL² − negL²)/nL + (nR² − posR² − negR²)/nR

is evaluated as two integer-ratio divisions and one addition — a FIXED
expression over identical integer operands, so IEEE 754 gives the
identical double in every engine (unlike order-dependent float
aggregation, which this never does). Ties on G break on (feature,
threshold).

Scale shape: the per-feature aggregate collapses 100 TB to
|distinct values| rows per feature (map-side combined); the prefix
window partitions by feature. High-cardinality continuous features
would make the per-feature window wide — production binning (the
quantile-histogram trick) plugs in as a pre-aggregation on the same
pipeline; the split scoring itself is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def melt_features(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """→ (feature, value, label) long-form view of the candidate
    features. label must be 0/1."""
    parts = [
        df.select(
            F.lit(c).alias("feature"),
            F.col(c).cast("double").alias("value"),
            F.col(label_col).cast("long").alias("label"),
        )
        for c in feature_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def best_stump(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """→ ONE row: the (feature, threshold) split minimizing weighted
    Gini, with its exact counts and training accuracy.

    Split semantics: left = rows with value <= threshold; candidate
    thresholds are the distinct feature values (the last one yields an
    empty right side and is excluded).
    """
    if not feature_cols:
        raise ValueError("best_stump: feature_cols must be non-empty")
    melted = melt_features(df, feature_cols, label_col)
    per_value = melted.groupBy("feature", "value").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("label").alias("pos_v")
    )
    w = Window.partitionBy("feature").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("feature")
    scored = (
        per_value.withColumn("n_left", F.sum("n_v").over(w))
        .withColumn("pos_left", F.sum("pos_v").over(w))
        .withColumn("n", F.sum("n_v").over(wn))
        .withColumn("pos", F.sum("pos_v").over(wn))
        .withColumn("n_right", F.col("n") - F.col("n_left"))
        .withColumn("pos_right", F.col("pos") - F.col("pos_left"))
        .filter(F.col("n_right") > 0)
    )
    neg_left = F.col("n_left") - F.col("pos_left")
    neg_right = F.col("n_right") - F.col("pos_right")
    gini_cost = (
        (
            F.col("n_left") * F.col("n_left")
            - F.col("pos_left") * F.col("pos_left")
            - neg_left * neg_left
        ).cast("double")
        / F.col("n_left")
        + (
            F.col("n_right") * F.col("n_right")
            - F.col("pos_right") * F.col("pos_right")
            - neg_right * neg_right
        ).cast("double")
        / F.col("n_right")
    )
    n_correct = F.greatest(F.col("pos_left"), neg_left) + F.greatest(
        F.col("pos_right"), neg_right
    )
    return (
        scored.select(
            "feature",
            F.col("value").alias("threshold"),
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            F.col("pos_left").cast("long").alias("pos_left"),
            F.col("pos_right").cast("long").alias("pos_right"),
            gini_cost.alias("__g"),
            F.round(gini_cost / F.col("n"), 6).alias("gini"),
            F.round(n_correct / F.col("n"), 4).alias("accuracy"),
        )
        .orderBy(F.col("__g").asc(), F.col("feature").asc(), F.col("threshold").asc())
        .limit(1)
        .drop("__g")
    )
