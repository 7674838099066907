"""Inter-annotator agreement and label aggregation: majority vote,
Fleiss' kappa, Cohen's kappa, Krippendorff's alpha (nominal).

Human preference / labeling pipelines (RLHF reward data, quality
labels) need agreement statistics before the labels are trusted; the
reference repo's train/eval utilities stop at AUC-style metrics
(``redshells/train/utils/utils.py``), so this tier is new surface.

Every statistic here is a ratio of exact integer counts, exported
either as the raw longs plus a *fixed* IEEE expression tree over them
(divisions/multiplications of exact operands are bit-identical across
engines) — the same cross-engine convention as the Wilson bounds in
``queries/analytics.py``. No double is ever aggregated, so partition
order can't perturb a result.

Scale shape: everything reduces to per-(item, label) count relations
— map-side-combinable groupBys — followed by single-row or
label-cardinality-bounded aggregates. Nothing quadratic in items;
Cohen's kappa is quadratic only in *annotators* (the pair grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def majority_vote(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Aggregate raw (item, label) votes into one winning label per
    item with deterministic ties (higher count wins; equal counts
    break to the lexicographically smaller label).

    Returns (item, label, votes, total_votes, agreement) where
    agreement = votes/total — the per-item confidence a downstream
    filter thresholds on."""
    counts = df.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    w = Window.partitionBy(item_col).orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    totals = counts.groupBy(item_col).agg(
        F.sum("votes").cast("long").alias("total_votes")
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .join(totals, item_col)
        .select(
            item_col,
            label_col,
            "votes",
            "total_votes",
            (F.col("votes").cast("double") / F.col("total_votes")).alias(
                "agreement"
            ),
        )
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    n_per_item: int,
) -> DataFrame:
    """Fleiss' kappa over items that each carry exactly ``n_per_item``
    ratings (callers pre-select a fixed-size rating set per item —
    Fleiss' formulation requires it).

    Single-row result: (n_items, n_per_item, sum_nij_sq, sum_cj_sq,
    p_o, p_e, kappa). With N items, n ratings each, n_ij the count of
    label j on item i and c_j the label-j column total::

        p_o = (sum_ij n_ij^2 - N*n) / (N*n*(n-1))
        p_e = sum_j c_j^2 / (N*n)^2
        kappa = (p_o - p_e) / (1 - p_e)

    Both numerators are exact int64 sums; p_o/p_e/kappa are a fixed
    scalar expression tree over them. c_j^2 needs c_j < ~3e9 to stay
    in int64 — beyond that, cast the count relation to decimal(38,0)
    first (loud overflow, not silent, under ANSI mode)."""
    nij = df.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    per_item = nij.groupBy(item_col).agg(
        F.sum("nij").cast("long").alias("ni"),
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq"),
    ).filter(F.col("ni") == n_per_item)
    cj = (
        nij.join(per_item.select(item_col), item_col, "left_semi")
        .groupBy(label_col)
        .agg(F.sum("nij").cast("long").alias("cj"))
    )
    a = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq").cast("long").alias("sum_nij_sq"),
    )
    b = cj.agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sum_cj_sq"))
    n = F.lit(int(n_per_item)).cast("long")
    joined = a.crossJoin(b)  # two 1-row aggregates
    nn = F.col("n_items") * n
    p_o = (F.col("sum_nij_sq") - nn).cast("double") / (
        nn * (n - F.lit(1))
    ).cast("double")
    p_e = F.col("sum_cj_sq").cast("double") / (nn * nn).cast("double")
    return joined.select(
        "n_items",
        n.alias("n_per_item"),
        "sum_nij_sq",
        "sum_cj_sq",
        p_o.alias("p_o"),
        p_e.alias("p_e"),
        ((p_o - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


def cohen_kappa_pairs(
    df: DataFrame,
    item_col: str,
    annotator_col: str,
    label_col: str,
) -> DataFrame:
    """Cohen's kappa for every annotator pair (a < b) over the items
    both labeled (each annotator contributes at most one label per
    item — callers enforce it upstream).

    Per pair: (annotator_a, annotator_b, n_items, n_agree, p_o, p_e,
    kappa) with p_e from the pair-conditional marginals::

        p_e = sum_l count_a(l) * count_b(l) / n^2

    The pair grid is quadratic in ANNOTATORS only; items flow through
    one self-equi-join on item (co-partitioned) and label-bounded
    marginal aggregates."""
    # pin the narrow (item, annotator, label) rows: both self-join
    # sides re-ran the caller's upstream (a fact window, typically)
    base = df.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("ann"),
        F.col(label_col).alias("lbl"),
    ).localCheckpoint(eager=True)
    a = base.select("item", F.col("ann").alias("ann_a"), F.col("lbl").alias("la"))
    b = base.select("item", F.col("ann").alias("ann_b"), F.col("lbl").alias("lb"))
    joint = a.join(b, "item").filter(F.col("ann_a") < F.col("ann_b"))
    # pair-conditional marginals: how often each label appears on each
    # side of the pair (bounded by #pairs x #labels rows). ONE pass
    # over the item join: the totals/agreement counts fold from the
    # pinned contingency (exact int64 sums)
    marg = (
        joint.select("ann_a", "ann_b", "la", "lb")
        .groupBy("ann_a", "ann_b", "la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    agg = marg.groupBy("ann_a", "ann_b").agg(
        F.sum("c").cast("long").alias("n_items"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_agree"),
    )
    ma = marg.groupBy("ann_a", "ann_b", "la").agg(
        F.sum("c").cast("long").alias("ca")
    )
    mb = marg.groupBy("ann_a", "ann_b", "lb").agg(
        F.sum("c").cast("long").alias("cb")
    )
    pe_num = (
        ma.join(
            mb,
            (ma["ann_a"] == mb["ann_a"])
            & (ma["ann_b"] == mb["ann_b"])
            & (ma["la"] == mb["lb"]),
        )
        .select(ma["ann_a"], ma["ann_b"], (F.col("ca") * F.col("cb")).alias("ab"))
        .groupBy("ann_a", "ann_b")
        .agg(F.sum("ab").cast("long").alias("pe_num"))
    )
    out = agg.join(pe_num, ["ann_a", "ann_b"])
    p_o = F.col("n_agree").cast("double") / F.col("n_items")
    p_e = F.col("pe_num").cast("double") / (
        F.col("n_items") * F.col("n_items")
    ).cast("double")
    return out.select(
        "ann_a",
        "ann_b",
        "n_items",
        "n_agree",
        "pe_num",
        p_o.alias("p_o"),
        p_e.alias("p_e"),
        ((p_o - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


def krippendorff_alpha_nominal(
    df: DataFrame,
    item_col: str,
    label_col: str,
    n_per_item: int,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over items with exactly
    ``n_per_item`` ratings. Alpha differs from Fleiss by its
    small-sample expected-disagreement correction (Nn-1 pairable
    values), making it the right choice when item counts are modest.

    With equal ratings per item the observed disagreement folds to
    exact integers::

        D_o = sum_ij n_ij * (n - n_ij) / (N*n*(n-1))
        D_e = sum_j c_j * (N*n - c_j) / (N*n*(N*n - 1))
        alpha = 1 - D_o / D_e

    Single-row output with the integer numerators exported alongside
    the fixed-expression doubles."""
    nij = df.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    per_item = nij.groupBy(item_col).agg(
        F.sum("nij").cast("long").alias("ni"),
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq"),
    ).filter(F.col("ni") == n_per_item)
    cj = (
        nij.join(per_item.select(item_col), item_col, "left_semi")
        .groupBy(label_col)
        .agg(F.sum("nij").cast("long").alias("cj"))
    )
    n = F.lit(int(n_per_item)).cast("long")
    a = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq").cast("long").alias("sum_nij_sq"),
    )
    nn_total = F.col("n_items") * n
    # sum_j c_j*(Nn - c_j) = (Nn)^2 - sum c_j^2 ; keep the direct sum
    # relational so the exported numerator is checkable
    b = cj.agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sum_cj_sq"))
    joined = a.crossJoin(b)  # two 1-row aggregates
    do_num = nn_total * n - F.col("sum_nij_sq")  # sum nij*(n - nij)
    de_num = nn_total * nn_total - F.col("sum_cj_sq")  # sum cj*(Nn - cj)
    d_o = do_num.cast("double") / (nn_total * (n - F.lit(1))).cast("double")
    d_e = de_num.cast("double") / (nn_total * (nn_total - F.lit(1))).cast(
        "double"
    )
    return joined.select(
        "n_items",
        n.alias("n_per_item"),
        do_num.cast("long").alias("do_num"),
        de_num.cast("long").alias("de_num"),
        d_o.alias("d_o"),
        d_e.alias("d_e"),
        (F.lit(1.0) - d_o / d_e).alias("alpha"),
    )
