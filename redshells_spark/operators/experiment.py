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
    u = units.select(t.alias("treat"), yc.alias("y"), x.alias("x"))
    levels = u.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    w = Window.orderBy(F.col("x").asc()).rowsBetween(Window.unboundedPreceding, -1)
    levels = levels.withColumn(
        "cum_before", F.coalesce(F.sum("n_l").over(w), F.lit(0)).cast("long")
    )
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
