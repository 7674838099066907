"""Experimentation / causal-inference operators.

The reference library trains models but ships no experiment-readout
layer; at 100 TB the readout pipeline (off-policy value of a logged
policy, covariate-adjusted A/B means, stratified causal effects,
difference-in-differences) is the natural companion of the
click-train-data tasks (reference: app/word_item_similarity/
make_click_train_data.py builds exactly this kind of logged feedback).

Determinism contract (shared with the DuckDB oracles): every sum is an
exact int64 (counts / e2-cents / e6 fixed point); doubles appear only
in FINAL scalar formulas applied to those exact integers, where IEEE
division/multiplication of identical inputs is bit-identical across
engines. No float is ever aggregated across rows.

Scale contract: every operator is one or two map-combinable
aggregations over the fact table followed by arithmetic on a
label-bounded relation (actions, strata, variants) — no global
windows over fact-scale rows, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

E6 = 1_000_000


def cents(col: str | Column = "value") -> Column:
    """Half-up cents fixed point, matching the oracle's
    ``floor(value * 100 + 0.5)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def ips_policy_value(
    logged: DataFrame,
    action_col: str,
    reward_cents_col: str,
    target_actions: list[str] | None,
    policy_name: str,
    clip: int = 10,
) -> DataFrame:
    """Clipped IPS + self-normalized IPS (SNIPS) value of a target
    policy from a logged bandit feedback table.

    Behavior propensity is the empirical action share p_b(a) = n_a/N;
    the target policy is uniform over ``target_actions`` (None =
    uniform over ALL logged actions). Importance weights are exact e6
    fixed point w_e6(a) = (pi_e6(a)*N) div n_a, clipped at clip*E6, so
    sum_w, the IPS numerator and the SNIPS denominator are exact int64
    per action — the per-row estimator collapses to a per-ACTION
    aggregation (pi and p_b are constant within an action), which is
    what makes this one groupBy over the log at any scale.

    Dudik/Langford off-policy evaluation; clipping per Bottou et al.
    2013. Returns one row: policy, n_logged, n_matched, sum_w_e6,
    ips_value_cents, snips_value_cents, clip_frac, max_w_e6.
    """
    per = logged.groupBy(F.col(action_col).alias("action")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum(reward_cents_col).cast("long").alias("r_a"),
    )
    tot = per.agg(
        F.sum("n_a").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    per = per.crossJoin(F.broadcast(tot))
    if target_actions is None:
        pi_e6 = F.expr(f"{E6} div k")
        matched = per
    else:
        k_t = len(target_actions)
        pi_e6 = F.lit(E6 // k_t)
        matched = per.filter(F.col("action").isin(list(target_actions)))
    matched = matched.withColumn("pi_e6", pi_e6.cast("long"))
    matched = matched.withColumn(
        "w_raw_e6", F.expr("pi_e6 * n div n_a").cast("long")
    ).withColumn("w_e6", F.least(F.col("w_raw_e6"), F.lit(clip * E6)).cast("long"))
    out = matched.agg(
        F.max("n").cast("long").alias("n_logged"),
        F.sum("n_a").cast("long").alias("n_matched"),
        F.sum(F.col("w_e6") * F.col("n_a")).cast("long").alias("sum_w_e6"),
        F.sum(F.col("w_e6") * F.col("r_a")).cast("long").alias("_wr_e6"),
        F.sum(F.when(F.col("w_raw_e6") > F.lit(clip * E6), F.col("n_a")).otherwise(0))
        .cast("long")
        .alias("_n_clipped"),
        F.max("w_raw_e6").cast("long").alias("max_w_e6"),
    )
    return out.select(
        F.lit(policy_name).alias("policy"),
        "n_logged",
        "n_matched",
        "sum_w_e6",
        (F.col("_wr_e6").cast("double") / (F.col("n_logged").cast("double") * F.lit(float(E6))))
        .alias("ips_value_cents"),
        (F.col("_wr_e6").cast("double") / F.col("sum_w_e6").cast("double"))
        .alias("snips_value_cents"),
        (F.col("_n_clipped").cast("double") / F.col("n_logged").cast("double"))
        .alias("clip_frac"),
        "max_w_e6",
    )


def diff_in_diff(
    df: DataFrame,
    key_cols: list[str],
    treat_col: str,
    post_col: str,
    value_cents_col: str,
) -> DataFrame:
    """Difference-in-differences of mean value per key: DiD =
    (post_t - pre_t) - (post_c - pre_c), the two-period two-group
    estimator (Card & Krueger form). Four exact (sum, count) cells per
    key from ONE map-combined aggregation; each mean is a single
    double division of exact ints, so the result is bit-deterministic.
    Keys are label-bounded; the plan is one shuffle regardless of row
    count."""
    cell = lambda t, p, c: F.sum(  # noqa: E731
        F.when((F.col(treat_col) == t) & (F.col(post_col) == p), F.col(c)).otherwise(0)
    ).cast("long")
    df = df.withColumn("__one", F.lit(1))
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        cell(1, 0, value_cents_col).alias("s_t0"),
        cell(1, 1, value_cents_col).alias("s_t1"),
        cell(0, 0, value_cents_col).alias("s_c0"),
        cell(0, 1, value_cents_col).alias("s_c1"),
        cell(1, 0, "__one").alias("n_t0"),
        cell(1, 1, "__one").alias("n_t1"),
        cell(0, 0, "__one").alias("n_c0"),
        cell(0, 1, "__one").alias("n_c1"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return agg.select(
        *key_cols,
        "n_total",
        m("s_t0", "n_t0").alias("mean_treat_pre"),
        m("s_t1", "n_t1").alias("mean_treat_post"),
        m("s_c0", "n_c0").alias("mean_ctrl_pre"),
        m("s_c1", "n_c1").alias("mean_ctrl_post"),
        (
            (m("s_t1", "n_t1") - m("s_t0", "n_t0"))
            - (m("s_c1", "n_c1") - m("s_c0", "n_c0"))
        ).alias("did_cents"),
    )


def cuped_adjusted(
    per_unit: DataFrame,
    variant_col: str,
    pre_cents_col: str,
    post_cents_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM 2013): theta =
    cov(X,Y)/var(X) pooled over all units, adjusted metric
    Y' = Y - theta*(X - mean(X)). Inputs are exact integer cents per
    unit; the five pooled sums (n, Sx, Sy, Sxy, Sxx, Syy) are exact
    int64 from one aggregation, and theta/means/rho^2 are computed in
    DOUBLE FROM those exact sums (n*Sxy overflows int64 at ~1e6 units
    x 1e5 cents, so the combine step is float on exact inputs —
    deterministic because both engines evaluate the identical
    expression on identical integers). Per-variant sums ride the same
    pass pattern. Returns one row per variant with theta, raw and
    adjusted means, and the variance-reduction factor rho^2."""
    x, y = F.col(pre_cents_col), F.col(post_cents_col)
    pooled = per_unit.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pooled = pooled.select(
        "n",
        "sx",
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (d("n") * d("sxx") - d("sx") * d("sx"))
        ).alias("theta"),
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            * (d("n") * d("sxy") - d("sx") * d("sy"))
            / (
                (d("n") * d("sxx") - d("sx") * d("sx"))
                * (d("n") * d("syy") - d("sy") * d("sy"))
            )
        ).alias("rho2"),
    )
    per_v = per_unit.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(x).cast("long").alias("svx"),
        F.sum(y).cast("long").alias("svy"),
    )
    out = per_v.crossJoin(F.broadcast(pooled))
    return out.select(
        "variant",
        "n_units",
        (d("svx") / d("n_units")).alias("mean_pre_cents"),
        (d("svy") / d("n_units")).alias("mean_post_cents"),
        F.col("theta"),
        (
            d("svy") / d("n_units")
            - F.col("theta") * (d("svx") / d("n_units") - d("sx") / d("n"))
        ).alias("adj_mean_post_cents"),
        F.col("rho2").alias("variance_reduction"),
    ).orderBy("variant")


def stratified_ate(
    units: DataFrame,
    treat_col: str,
    outcome_cents_col: str,
    covariate_col: str,
    n_strata: int = 5,
) -> DataFrame:
    """Propensity-style subclassification ATE (Rosenbaum & Rubin 1984):
    stratify units into ``n_strata`` quantile classes of an integer
    covariate, difference treated/control means within each stratum,
    and weight by stratum size over the overlap strata.

    The quantile boundaries come from the DISTINCT-VALUE level table
    (value, n, cum_before) — the weighted-median pattern — so the only
    window runs over distinct covariate values (bounded: per-user
    counts), never over units: a level is assigned the stratum of its
    first unit's cumulative position, stratum = (n_strata*cum_before)
    div U. Per-stratum cells are exact int64; means and the weighted
    ATE are double-from-ints (per-stratum terms rounded to 9 decimals
    before the <= n_strata-element sum so cross-engine addition order
    cannot surface)."""
    t, yc, x = F.col(treat_col), F.col(outcome_cents_col), F.col(covariate_col)
    # 3 ints/unit, consumed by the level table AND the stratum join -
    # unpinned, the caller's per-unit aggregation ran per consumer
    u = units.select(t.alias("treat"), yc.alias("y"), x.alias("x")).localCheckpoint(
        eager=True
    )
    levels = u.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    w = Window.orderBy(F.col("x").asc()).rowsBetween(Window.unboundedPreceding, -1)
    levels = levels.withColumn(
        "cum_before", F.coalesce(F.sum("n_l").over(w), F.lit(0)).cast("long")
    ).localCheckpoint(eager=True)  # distinct-covariate bounded; feeds
    # the total probe and the stratum map
    total = levels.agg(F.sum("n_l").cast("long").alias("u_total"))
    levels = levels.crossJoin(F.broadcast(total)).select(
        "x",
        F.expr(f"cast({n_strata} * cum_before div u_total as bigint)").alias("stratum"),
        "u_total",
    )
    per = (
        u.join(F.broadcast(levels), "x")
        .groupBy("stratum")
        .agg(
            F.max("u_total").cast("long").alias("u_total"),
            F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
            F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
            F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0))
            .cast("long")
            .alias("sy_t"),
            F.sum(F.when(F.col("treat") == 0, F.col("y")).otherwise(0))
            .cast("long")
            .alias("sy_c"),
        )
        # <= n_strata rows feeding three consumers (overlap filter
        # twice + the final cross join)
        .localCheckpoint(eager=True)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    per = per.withColumn("overlap", ((F.col("n_t") > 0) & (F.col("n_c") > 0)).cast("int"))
    inc = per.filter(F.col("overlap") == 1)
    n_inc = inc.agg(F.sum(F.col("n_t") + F.col("n_c")).cast("long").alias("n_overlap"))
    terms = inc.crossJoin(F.broadcast(n_inc)).select(
        F.round(
            (d("n_t") + d("n_c"))
            / d("n_overlap")
            * (d("sy_t") / d("n_t") - d("sy_c") / d("n_c")),
            9,
        ).alias("term"),
        "n_overlap",
    )
    # plain agg (not groupBy) so a zero-overlap input yields one
    # all-NULL row — matching the oracle's aggregate-over-empty-set
    ate = terms.agg(
        F.max("n_overlap").alias("n_overlap"),
        F.round(F.sum("term"), 6).alias("ate_cents"),
    )
    out = per.crossJoin(F.broadcast(ate)).select(
        F.col("stratum").cast("long").alias("stratum"),
        "n_t",
        "n_c",
        F.when(F.col("n_t") > 0, d("sy_t") / d("n_t")).alias("mean_y_treated"),
        F.when(F.col("n_c") > 0, d("sy_c") / d("n_c")).alias("mean_y_control"),
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            d("sy_t") / d("n_t") - d("sy_c") / d("n_c"),
        ).alias("diff_cents"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.col("ate_cents"),
    )
    return out.orderBy("stratum")


def qini_uplift_deciles(
    units: DataFrame,
    treat_col: str,
    score_col: str,
    response_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Qini uplift curve at score deciles (Radcliffe 2007): rank units
    by a targeting score (descending), split into ``n_buckets``
    population quantiles, and report the cumulative incremental
    responders Qini(k) = R_t(k) − R_c(k)·N_t(k)/N_c(k) per bucket.

    The decile boundaries come from the DISTINCT-SCORE level table
    (the stratified_ate / weighted-median pattern), so the only window
    runs over distinct score values — never over units. Per-bucket
    cells are exact int64 from one aggregation; cumulative sums run
    over the ≤ n_buckets relation; the single division happens last.
    """
    u = units.select(
        F.col(treat_col).alias("treat"),
        F.col(score_col).alias("score"),
        F.col(response_col).alias("resp"),
    )
    levels = u.groupBy("score").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    w = Window.orderBy(F.col("score").desc()).rowsBetween(Window.unboundedPreceding, -1)
    levels = levels.withColumn(
        "cum_before", F.coalesce(F.sum("n_l").over(w), F.lit(0)).cast("long")
    )
    total = levels.agg(F.sum("n_l").cast("long").alias("u_total"))
    levels = levels.crossJoin(F.broadcast(total)).select(
        "score",
        F.expr(f"cast({n_buckets} * cum_before div u_total as bigint)").alias("bucket"),
    )
    per = (
        u.join(F.broadcast(levels), "score")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
            F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
            F.sum(F.when(F.col("treat") == 1, F.col("resp")).otherwise(0))
            .cast("long")
            .alias("r_t"),
            F.sum(F.when(F.col("treat") == 0, F.col("resp")).otherwise(0))
            .cast("long")
            .alias("r_c"),
        )
    )
    cw = (
        Window.orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.sum("n_t").over(cw).cast("long").alias("cum_n_t"),
        F.sum("n_c").over(cw).cast("long").alias("cum_n_c"),
        F.sum("r_t").over(cw).cast("long").alias("cum_r_t"),
        F.sum("r_c").over(cw).cast("long").alias("cum_r_c"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return cum.withColumn(
        "qini",
        F.when(
            F.col("cum_n_c") > 0,
            F.round(d("cum_r_t") - d("cum_r_c") * d("cum_n_t") / d("cum_n_c"), 6),
        ),
    ).orderBy("bucket")


def switchback_readout(
    events: DataFrame,
    ts_us_col: str,
    value_cents_col: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Switchback (time-split) experiment readout: assign alternating
    time buckets to treat/control (bucket parity — the deterministic
    stand-in for the deploy schedule), compute each bucket's mean value
    as an EXACT e2 fixed-point integer m_e2 = (100·Σcents) div n, and
    report per-arm means with the cluster-robust (bucket-level)
    standard error.

    Bucket means must be integers because the arm-level moments
    (Σm, Σm²) are unordered sums — int64 keeps them associative and
    engine-exact where a float sum would not be. m_e2 ≤ ~5e6 for
    cent-scale values, so Σm² stays in int64 up to ~1e5 buckets; the
    variance combine runs in double ON those exact ints (the CUPED
    precedent). One map-combined aggregation over the fact table; the
    bucket relation is time-bounded, never fact-scale.
    """
    b = events.select(
        # integer div — float division of epoch-µs loses precision past 2^53
        F.expr(f"cast({ts_us_col} as bigint) div {int(bucket_us)}")
        .cast("long")
        .alias("bucket"),
        F.col(value_cents_col).alias("c"),
    )
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("c").cast("long").alias("s_b"),
    )
    per = per.select(
        (F.col("bucket") % 2).cast("long").alias("arm"),
        F.expr("(100 * s_b) div n_b").cast("long").alias("m_e2"),
        "n_b",
    )
    arm = per.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n_b").cast("long").alias("n_events"),
        F.sum("m_e2").cast("long").alias("sm"),
        F.sum(F.col("m_e2") * F.col("m_e2")).cast("long").alias("smm"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = (d("sm") / d("n_buckets") / F.lit(100.0)).alias("mean_cents")
    var_between = F.when(
        F.col("n_buckets") > 1,
        (d("n_buckets") * d("smm") - d("sm") * d("sm"))
        / (d("n_buckets") * (d("n_buckets") - F.lit(1.0))),
    )
    return arm.select(
        "arm",
        "n_buckets",
        "n_events",
        mean,
        F.sqrt(var_between / d("n_buckets")).alias("se_cluster_e2"),
    ).orderBy("arm")


def regression_discontinuity(
    units: DataFrame,
    running_col: str,
    outcome_cents_col: str,
    bandwidth: int = 5,
) -> DataFrame:
    """Sharp regression-discontinuity readout with a data-derived
    integer cutoff (the global integer mean of the running variable —
    exact: Σx div n) and local-linear fits on each side within
    ``bandwidth`` (Imbens & Lemieux 2008).

    Each side's OLS of y on (x − cutoff) uses the closed normal
    equations over five exact int64 moments; slope/intercept are
    double-from-ints with identical expression trees on both engines
    (the grouped_ols precedent), so the jump estimate is
    bit-deterministic. Two map-combined aggregations, no windows.
    """
    u = units.select(
        F.col(running_col).cast("long").alias("x"),
        F.col(outcome_cents_col).cast("long").alias("y"),
    )
    cut = u.agg(F.expr("sum(x) div count(*)").cast("long").alias("cutoff"))
    cu = u.crossJoin(F.broadcast(cut)).withColumn("z", F.col("x") - F.col("cutoff"))
    cu = cu.filter((F.col("z") >= -bandwidth) & (F.col("z") <= bandwidth))
    side = cu.withColumn("side", F.when(F.col("z") < 0, F.lit("left")).otherwise(F.lit("right")))
    mo = side.groupBy("side").agg(
        F.max("cutoff").cast("long").alias("cutoff"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("z") * F.col("y")).cast("long").alias("szy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    det = d("n") * d("szz") - d("sz") * d("sz")
    slope = F.when(det != 0, (d("n") * d("szy") - d("sz") * d("sy")) / det)
    mo = mo.withColumn("slope", slope).withColumn(
        "intercept_at_cut",
        F.when(
            F.col("slope").isNotNull(),
            (d("sy") - F.col("slope") * d("sz")) / d("n"),
        ).otherwise(d("sy") / d("n")),
    )
    return mo.select(
        "side",
        "cutoff",
        F.lit(bandwidth).cast("long").alias("bandwidth"),
        "n",
        F.round("slope", 6).alias("slope_cents"),
        F.round("intercept_at_cut", 6).alias("intercept_cents"),
    ).orderBy("side")


def delta_method_ratio(
    per_unit: DataFrame,
    num_cents_col: str,
    den_count_col: str,
    metric_name: str,
    z: float = 1.959964,
) -> DataFrame:
    """Ratio-metric mean and delta-method CI (Deng et al. KDD 2018 —
    the variance of revenue-per-view when the unit of randomization is
    the USER, not the view). Five exact int64 moments in one pass;
    the delta-method variance of x̄/ȳ,
        (varx − 2·R·covxy + R²·vary) / (n·ȳ²),
    is evaluated in double ON those exact ints. Moments stay in int64
    for |x| ≤ ~3e5 cents and n ≤ ~1e8 units; beyond that pre-scale the
    numerator (documented bound, the grouped_ols class)."""
    x, y = F.col(num_cents_col), F.col(den_count_col)
    m = per_unit.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nm1 = d("n") * (d("n") - F.lit(1.0))
    varx = (d("n") * d("sxx") - d("sx") * d("sx")) / nm1
    vary = (d("n") * d("syy") - d("sy") * d("sy")) / nm1
    covxy = (d("n") * d("sxy") - d("sx") * d("sy")) / nm1
    xbar = d("sx") / d("n")
    ybar = d("sy") / d("n")
    r = xbar / ybar
    var_r = (varx - F.lit(2.0) * r * covxy + r * r * vary) / (d("n") * ybar * ybar)
    se = F.sqrt(var_r)
    return m.select(
        F.lit(metric_name).alias("metric"),
        "n",
        F.col("sx").alias("sum_num_cents"),
        F.col("sy").alias("sum_den"),
        F.round(r, 6).alias("ratio_cents"),
        F.round(se, 6).alias("se_cents"),
        F.round(r - F.lit(z) * se, 6).alias("ci_lo_cents"),
        F.round(r + F.lit(z) * se, 6).alias("ci_hi_cents"),
    )


def power_mde_table(
    counts: DataFrame,
    horizons: list[int],
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> DataFrame:
    """Pre-experiment power planning: for each horizon (days), the
    minimum detectable effect of a two-proportion test at 5%/80% given
    the observed base rate and daily traffic. ``counts`` is ONE row
    (n_events, n_success, n_days) of exact ints; the table explodes a
    literal horizon array, n_per_arm = (days·daily) div 2 stays
    integer, and MDE = (z_a+z_b)·sqrt(2·p̂(1−p̂)/n) is double-from-ints
    (IEEE-exact: identical operands both engines)."""
    hs = F.array(*[F.lit(int(h)) for h in horizons])
    t = counts.select(
        "n_events", "n_success", "n_days", F.explode(hs).alias("horizon_days")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    t = t.withColumn(
        "n_per_arm",
        F.expr("(horizon_days * (n_events div n_days)) div 2").cast("long"),
    )
    p = d("n_success") / d("n_events")
    mde = F.lit(z_alpha + z_beta) * F.sqrt(
        F.lit(2.0) * p * (F.lit(1.0) - p) / d("n_per_arm")
    )
    return t.select(
        F.col("horizon_days").cast("long").alias("horizon_days"),
        "n_per_arm",
        F.round(p, 6).alias("p_base"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    ).orderBy("horizon_days")


def iv_wald_estimate(
    units: DataFrame,
    instrument_col: str,
    treatment_col: str,
    outcome_cents_col: str,
) -> DataFrame:
    """Instrumental-variable (Wald/LATE) readout → one row:
    (n_z1, n_z0, take_up_z1, take_up_z0, first_stage, itt_cents,
    late_cents). With a binary instrument z, binary treatment d and
    outcome y, LATE = (E[y|z=1] − E[y|z=0]) / (E[d|z=1] − E[d|z=0])
    (Angrist & Imbens 1994) — the encouragement-design estimator for
    when assignment is random but COMPLIANCE is not. Six exact int64
    cells from one map-combined pass; every mean/ratio is a double of
    exact ints; the estimate is NULL when the first stage is zero
    (instrument irrelevant) rather than a division error."""
    z, d0, y = (
        F.col(instrument_col),
        F.col(treatment_col),
        F.col(outcome_cents_col),
    )
    cell = lambda zz, c: F.sum(F.when(z == zz, c).otherwise(0)).cast("long")  # noqa: E731
    agg = units.agg(
        cell(1, F.lit(1)).alias("n_z1"),
        cell(0, F.lit(1)).alias("n_z0"),
        cell(1, d0).alias("d_z1"),
        cell(0, d0).alias("d_z0"),
        cell(1, y).alias("y_z1"),
        cell(0, y).alias("y_z0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    itt = d("y_z1") / d("n_z1") - d("y_z0") / d("n_z0")
    fs = d("d_z1") / d("n_z1") - d("d_z0") / d("n_z0")
    return agg.select(
        "n_z1",
        "n_z0",
        F.round(d("d_z1") / d("n_z1"), 6).alias("take_up_z1"),
        F.round(d("d_z0") / d("n_z0"), 6).alias("take_up_z0"),
        F.round(fs, 6).alias("first_stage"),
        F.round(itt, 6).alias("itt_cents"),
        F.when(fs != 0, F.round(itt / fs, 6)).alias("late_cents"),
    )
