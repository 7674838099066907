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


# --------------------------------------------------------------------------
# Population Stability Index — the other workhorse drift metric
# (banking/model-monitoring standard; Karakoulas 2004 gives the usual
# 0.1/0.25 action thresholds). Where KS is the CDF supremum, PSI is a
# symmetrized KL over a fixed binning:
#
#     PSI = Σ_b (p1_b − p2_b) · ln(p1_b / p2_b)
#
# Binning here is the integer log2 bucket of the fixed-point value
# (bit length of the unit count — a comparison chain, no float log),
# so the bucket ids and all counts are exact int64; 0.5-count
# smoothing keeps empty-in-one-sample buckets finite. The per-bucket
# term is one fixed IEEE expression and the bucket relation is tiny
# (≤ max_bits rows per group), matching the hill/ppl float discipline.


def psi_bucket_counts(
    df: DataFrame,
    value_column: str,
    flag_column: str,
    group_columns: list[str],
    scale: int = 100,
    max_bits: int = 40,
) -> DataFrame:
    """→ (*group_columns, bucket, c1, c2): exact per-bucket counts of
    the two samples (``flag_column`` = 1 → sample 1). Bucket = bit
    length of the non-negative fixed-point value — mergeable additive
    state, the streaming-twin shape of :func:`ks_value_counts`."""
    units = money_units(F.col(value_column), scale)
    bitlen = " + ".join(
        f"(CASE WHEN __u >= {1 << i} THEN 1 ELSE 0 END)" for i in range(max_bits)
    )
    return (
        df.select(
            *group_columns,
            F.greatest(units, F.lit(0)).alias("__u"),
            F.col(flag_column).cast("long").alias("__is1"),
        )
        .select(
            *group_columns,
            F.expr(f"({bitlen})").cast("long").alias("bucket"),
            "__is1",
        )
        .groupBy(*group_columns, "bucket")
        .agg(
            F.sum("__is1").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("__is1")).cast("long").alias("c2"),
        )
    )


def psi_from_bucket_counts(pv: DataFrame, group_columns: list[str]) -> DataFrame:
    """(group, bucket, c1, c2) → one row per group: (n1, n2, n_buckets,
    psi). Proportions are smoothed with 0.5 pseudo-counts over the
    group's observed buckets so a bucket empty in one sample stays
    finite; psi is rounded to 6 after the (bucket-bounded) sum."""
    w = Window.partitionBy(*group_columns)
    cur = pv.select(
        *group_columns,
        "bucket",
        "c1",
        "c2",
        F.sum("c1").over(w).cast("long").alias("n1"),
        F.sum("c2").over(w).cast("long").alias("n2"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_buckets"),
    )
    p1 = (F.col("c1") + F.lit(0.5)) / (
        F.col("n1").cast("double") + F.lit(0.5) * F.col("n_buckets")
    )
    p2 = (F.col("c2") + F.lit(0.5)) / (
        F.col("n2").cast("double") + F.lit(0.5) * F.col("n_buckets")
    )
    term = (p1 - p2) * F.log(p1 / p2)
    return (
        cur.withColumn("__term", term)
        .groupBy(*group_columns)
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max("n_buckets").cast("long").alias("n_buckets"),
            F.round(F.sum("__term"), 6).alias("psi"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_column: str,
    flag_column: str,
    group_columns: list[str],
    scale: int = 100,
    max_bits: int = 40,
) -> DataFrame:
    """Population Stability Index per group in one call."""
    return psi_from_bucket_counts(
        psi_bucket_counts(df, value_column, flag_column, group_columns, scale, max_bits),
        group_columns,
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric location-shift
# test completing the drift triad (KS = CDF supremum, PSI = binned KL,
# U = rank shift). Sufficient statistics are the same per-value count
# relation as the KS test — additive, mergeable, streamable.
#
# Exactness: with ties handled by midranks, every midrank is a
# half-integer, so DOUBLED rank sums are exact int64:
#   2·midrank(v) = 2·(count below v) + count(v) + 1
#   R1×2 = Σ_v c1_v · (2·cb_v + cnt_v + 1)
#   U1×2 = R1×2 − n1·(n1+1)
# The normal approximation uses the tie-corrected variance
#   σ² = n1·n2/12 · ((n+1) − Σ(t³−t)/(n·(n−1)))
# computed as ONE fixed IEEE expression over exact integers, with the
# z statistic rounded after (the repo's standard float discipline).


def mann_whitney_from_value_counts(pv: DataFrame) -> DataFrame:
    """(v, c1, c2) → one row (n1, n2, u1_x2, tie_t, z, reject_005)."""
    wc = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = F.col("c1") + F.col("c2")
    ranked = pv.select(
        "c1",
        t.alias("__t"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wc), F.lit(0))
        .cast("long")
        .alias("__cb"),
    )
    agg = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("__t") - F.col("c1")).cast("long").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("__cb") + F.col("__t") + 1))
        .cast("long")
        .alias("__r1_x2"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
        .cast("long")
        .alias("tie_t"),
    )
    u1_x2 = (F.col("__r1_x2") - F.col("n1") * (F.col("n1") + 1)).cast("long")
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        (F.col("n1") * F.col("n2")).cast("double")
        / F.lit(12.0)
        * (
            (n + 1).cast("double")
            - F.col("tie_t").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    # sigma = 0 only when EVERY value is tied (degenerate input): the
    # test is undefined there — emit NULL z rather than an ANSI
    # divide-by-zero. The lazy when() branch keeps ANSI mode happy.
    z = F.when(
        sigma > 0,
        (u1_x2 - F.col("n1") * F.col("n2")).cast("double")
        / (F.lit(2.0) * sigma),
    )
    return agg.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        "tie_t",
        F.round(z, 6).alias("z"),
        # NULL z (all-tied degenerate input) must read as "cannot
        # reject", not NULL — the oracle's CASE ... ELSE 0 does.
        F.coalesce(
            (F.abs(F.round(z, 6)) > F.lit(1.96)).cast("long"), F.lit(0)
        ).alias("reject_005"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_column: str,
    flag_column: str,
    scale: int = 100,
) -> DataFrame:
    """Exact-midrank Mann-Whitney U between the flag=1 and flag=0
    samples of a fixed-decimal column, in one call."""
    return mann_whitney_from_value_counts(
        ks_value_counts(df, value_column, flag_column, scale)
    )


def lagged_autocorrelation(
    series: DataFrame,
    t_col: str,
    n_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of an integer count series at lags
    1..max_lag, as the Pearson correlation between the series and its
    lag-k shift over the overlapping index range — the periodicity /
    burst-structure probe for event streams (pairs-complete variant of
    the ACF; equals the textbook ACF up to edge normalization).

    ``series`` must be DENSE on ``t_col`` (one row per time bucket,
    zero-filled) with exact integer counts — gapfill upstream. The
    self-join is on t+k over the already-aggregated bucket relation
    (bounded by the observation window, not by event count), and each
    correlation is one double expression over six exact int64 sums —
    no float crosses an aggregation boundary."""
    a = series.select(F.col(t_col).alias("t"), F.col(n_col).cast("long").alias("va"))
    b = series.select(F.col(t_col).alias("tb"), F.col(n_col).cast("long").alias("vb"))
    lags = a.sparkSession.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("va").cast("long").alias("sa"),
            F.sum("vb").cast("long").alias("sb"),
            F.sum(F.col("va") * F.col("vb")).cast("long").alias("sab"),
            F.sum(F.col("va") * F.col("va")).cast("long").alias("saa"),
            F.sum(F.col("vb") * F.col("vb")).cast("long").alias("sbb"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n_pairs") * d("sab") - d("sa") * d("sb")
    den = F.sqrt(
        (d("n_pairs") * d("saa") - d("sa") * d("sa"))
        * (d("n_pairs") * d("sbb") - d("sb") * d("sb"))
    )
    return pairs.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(None)).alias("acf"),
    ).orderBy("lag")


def mann_kendall_trend(
    series: DataFrame,
    t_col: str,
    n_col: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann-Kendall nonparametric trend test on an integer time series
    → one row: (n_periods, s_stat, var_s_x18, z, trend). S is the sum
    of sign(v_j − v_i) over ordered period pairs (the series relation
    is time-bounded, so the pair self-join is periods², never
    fact-scale); the tie-corrected variance
    18·var(S) = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) stays exact
    int64; z applies the ±1 continuity correction and divides by
    sqrt(var18/18) in double on exact ints. Kendall 1975; the standard
    monitoring companion to Theil-Sen (ml/theil_sen.py)."""
    s = series.select(F.col(t_col).alias("t"), F.col(n_col).cast("long").alias("v"))
    a = s.alias("a")
    b = s.select(F.col("t").alias("tb"), F.col("v").alias("vb")).alias("b")
    pairs = a.join(b, F.col("tb") > F.col("t")).agg(
        F.coalesce(
            F.sum(F.signum(F.col("vb") - F.col("v")).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    n_tot = s.agg(F.count(F.lit(1)).cast("long").alias("n_periods"))
    ties = (
        s.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("tg"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("tg") > 1,
                        F.col("tg") * (F.col("tg") - 1) * (2 * F.col("tg") + 5),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    row = pairs.crossJoin(F.broadcast(n_tot)).crossJoin(F.broadcast(ties))
    n = F.col("n_periods")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    row = row.withColumn("var_s_x18", var18)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (
        F.col("s_stat")
        - F.signum(F.col("s_stat").cast("double")).cast("long")
    ).cast("double")
    z = F.when(
        F.col("var_s_x18") > 0,
        F.round(corr / F.sqrt(d("var_s_x18") / F.lit(18.0)), 6),
    )
    return row.select(
        "n_periods",
        "s_stat",
        "var_s_x18",
        z.alias("z"),
        F.when(z > F.lit(z_crit), F.lit("increasing"))
        .when(z < F.lit(-z_crit), F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


def seasonal_naive_mase(
    series: DataFrame,
    t_col: str,
    n_col: str,
    season: int = 7,
) -> DataFrame:
    """MASE-style seasonality check on an integer series → one row:
    (n_terms, sae_seasonal, sae_naive, mase). Compares the seasonal-
    naive forecast x̂_t = x_{t−season} against the one-step naive
    x̂_t = x_{t−1} by summed absolute error over the index range where
    both are defined; mase < 1 means the weekly (seasonal) structure
    beats persistence — the quick 'is there real seasonality' gate
    before any heavier model (Hyndman & Koehler 2006). The series must
    be DENSE on ``t_col``; both error sums are exact int64 from one
    self-join over the time-bounded relation."""
    s = series.select(F.col(t_col).alias("t"), F.col(n_col).cast("long").alias("v"))
    lag1 = s.select((F.col("t") + 1).alias("t"), F.col("v").alias("v1"))
    lags = s.select(
        (F.col("t") + int(season)).alias("t"), F.col("v").alias("vs")
    )
    j = s.join(lag1, "t").join(lags, "t")
    out = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.abs(F.col("v") - F.col("vs"))).cast("long").alias("sae_seasonal"),
        F.sum(F.abs(F.col("v") - F.col("v1"))).cast("long").alias("sae_naive"),
    )
    return out.select(
        "n_terms",
        "sae_seasonal",
        "sae_naive",
        F.when(
            F.col("sae_naive") > 0,
            F.round(
                F.col("sae_seasonal").cast("double")
                / F.col("sae_naive").cast("double"),
                6,
            ),
        ).alias("mase"),
    )
