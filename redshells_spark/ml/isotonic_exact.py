"""Exact isotonic regression (PAV) for score calibration.

Pool-adjacent-violators is the standard monotone calibration fit
(turn a ranking score into a non-decreasing probability estimate).
The sequential pooling loop looks un-relational, but the isotonic
least-squares solution is UNIQUE and has the closed max-min form

    f(i) = max_{j ≤ i} min_{k ≥ i} avg(y[j..k])

so after aggregating the corpus to its distinct score levels (the
only corpus-wide pass — a map-combined groupBy), the fit is a
triangle of prefix-sum averages over the LEVEL table: k levels →
O(k²) tiny rows (the inner min over k is a suffix-min window per j,
not a third join), independent of corpus size. Each average is one
fixed-shape division over exact integer prefix sums (identical IEEE
double in any engine), min/max over identical sets are identical, and
the result exports at fixed point — a regression FIT inside the
bit-exact oracle contract (MLlib's IsotonicRegression remains the
right call for millions of distinct scores; same fitted values, float
path unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NANO = 1_000_000_000


def isotonic_fit_exact(
    df: DataFrame,
    score_col: str,
    target_col: str,
    max_levels: int = 10_000,
) -> DataFrame:
    """→ (score, n, pos, iso_e9): the isotonic (non-decreasing in
    score) least-squares fit of the 0/1 ``target_col``, at nano fixed
    point. Refuses score columns with more than ``max_levels`` distinct
    values — bucket them first (equi-depth/width binning), which is
    also the statistically sane move."""
    levels = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(target_col).cast("long")).alias("pos"),
        )
    )
    k = levels.limit(max_levels + 1).count()
    if k > max_levels:
        raise ValueError(
            f"isotonic_fit_exact: more than {max_levels} distinct score levels; "
            "bin the score first"
        )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    pref = levels.select(
        "s",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
        F.row_number().over(Window.orderBy("s")).alias("i"),
    ).localCheckpoint(eager=True)
    lo = pref.select(
        F.col("i").alias("j"),
        (F.col("cn") - F.col("n")).alias("n_lo"),
        (F.col("cp") - F.col("pos")).alias("p_lo"),
    )
    hi = pref.select(
        F.col("i").alias("k"), F.col("cn").alias("n_hi"), F.col("cp").alias("p_hi")
    )
    # all ranges j <= k with their exact-integer averages as one division
    ranges = lo.join(hi, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("p_hi") - F.col("p_lo")).cast("double")
            / (F.col("n_hi") - F.col("n_lo"))
        ).alias("avg"),
    )
    # min_{k >= i} avg(j..k) is a suffix-min over k within each j — a
    # window pass over the O(k²) ranges table, NOT a third join (the
    # naive (i,j,k) triple join is O(k³) and blows up long before the
    # max_levels guard would trip). Row (j, k=i) then holds m(j, i),
    # and f(i) = max_{j <= i} m(j, i) is one groupBy over the same
    # table. Identical value sets → identical min/max → bit-identical
    # fit to the triangle formulation.
    wsm = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = ranges.select(
        "j", F.col("k").alias("i"), F.min("avg").over(wsm).alias("mn")
    )
    idx = pref.select("i", "s", "n", "pos")
    return (
        m.groupBy("i")
        .agg(F.max("mn").alias("f"))
        .join(idx, "i")
        .select(
            F.col("s").alias(score_col),
            "n",
            "pos",
            F.floor(F.col("f") * NANO + F.lit(0.5)).cast("long").alias("iso_e9"),
        )
    )
