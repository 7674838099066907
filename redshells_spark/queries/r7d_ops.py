"""Round-7 batch 4: product/marketing analytics completion — RFM
segmentation (exact quintile scores via distributed rank), weekly
growth accounting (new/retained/resurrected/churned + quick ratio),
DAU/MAU stickiness, weekday-seasonal robust outliers (median + MAD on
count-level tables), log-log price elasticity per return flag
(e4-quantized integer OLS), McNemar's paired-classifier test, and
per-source token-distribution KL divergence.

House determinism rules as r7c_ops.py: integer aggregation everywhere,
e4/e9 quantization of per-row transcendental terms before any sum,
final scalar formulas single-shot and rounded in-query. Order
statistics over fact-proportional relations (RFM ranks) go through
data/sharding.distributed_rank; medians/MADs run on value-COUNT level
tables (domain-bounded) with partitioned windows.

Reference parity: extends the behavioral-analytics readout family
(reference's logged-click data model,
app/word_item_similarity/make_click_train_data.py) with the classic
growth/retention/value summaries a production feedback pipeline emits.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000
_WEEK_US = 604_800_000_000

_OCENTS = "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"


# ------------------------------------------------- RFM segmentation


@q(
    "rfm_segmentation",
    f"""WITH mx AS (SELECT max(epoch_us(o_orderdate)) AS mxd FROM orders),
       c AS (SELECT o_custkey,
                CAST(((SELECT mxd FROM mx) - max(epoch_us(o_orderdate)))
                     // {_DAY_US} AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum({_OCENTS}) AS BIGINT) AS monetary_e2
             FROM orders GROUP BY 1),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
       rr AS (SELECT o_custkey, frequency, monetary_e2,
                CAST(row_number() OVER (ORDER BY recency_days ASC, o_custkey ASC)
                  AS BIGINT) AS ir,
                CAST(row_number() OVER (ORDER BY frequency ASC, o_custkey ASC)
                  AS BIGINT) AS if_,
                CAST(row_number() OVER (ORDER BY monetary_e2 ASC, o_custkey ASC)
                  AS BIGINT) AS im
              FROM c),
       sc AS (SELECT CAST(1 + 5 * (ir - 1) // n.n AS BIGINT) AS r_score,
                     CAST(1 + 5 * (if_ - 1) // n.n AS BIGINT) AS f_score,
                     CAST(1 + 5 * (im - 1) // n.n AS BIGINT) AS m_score,
                     monetary_e2
              FROM rr CROSS JOIN n)
       SELECT r_score, f_score, m_score,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(monetary_e2) AS BIGINT) AS total_spend_e2
       FROM sc GROUP BY 1, 2, 3""",
)
def _rfm_segmentation(spark, sf_dir):
    """RFM segmentation (Hughes 1994): recency (days since last
    order, scored so FRESH customers rank low→score 1 ordering kept
    symmetric with F/M for cross-engine simplicity), frequency and
    monetary quintiles — score = 1 + 5*(rank-1) div n with ranks from
    data/sharding.distributed_rank (range shuffle + offset map, NO
    single-reducer sort at 10^9 customers; custkey tie-break makes the
    rank total). Output is the segment-level cell table (<=125 rows)
    with customer counts and exact cent totals — the classic CRM
    targeting cube."""
    from redshells_spark.data.sharding import distributed_rank

    o = _t(spark, sf_dir, "orders")
    od_us = event_us(o, "o_orderdate").alias("od")
    base = o.select("o_custkey", od_us, money_units(F.col("o_totalprice"), 100).alias("ce"))
    mx = base.agg(F.max("od").alias("mxd"))
    c = (
        base.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_od"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("ce").cast("long").alias("monetary_e2"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.expr(f"(mxd - last_od) div {_DAY_US}").cast("long").alias("recency_days"),
            "frequency",
            "monetary_e2",
        )
    )
    n = c.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r1 = distributed_rank(c, [F.col("recency_days").asc(), F.col("o_custkey").asc()], out_col="ir0")
    r2 = distributed_rank(
        r1, [F.col("frequency").asc(), F.col("o_custkey").asc()], out_col="if0"
    )
    r3 = distributed_rank(
        r2, [F.col("monetary_e2").asc(), F.col("o_custkey").asc()], out_col="im0"
    )
    sc = r3.crossJoin(F.broadcast(n)).select(
        F.expr("cast(1 + 5 * ir0 div n as long)").alias("r_score"),
        F.expr("cast(1 + 5 * if0 div n as long)").alias("f_score"),
        F.expr("cast(1 + 5 * im0 div n as long)").alias("m_score"),
        "monetary_e2",
    )
    return sc.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_e2").cast("long").alias("total_spend_e2"),
    )


# ------------------------------------------------- growth accounting


@q(
    "growth_accounting_weekly",
    f"""WITH a AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // {_WEEK_US} AS week
              FROM events),
       f AS (SELECT user_id, min(week) AS first_week FROM a GROUP BY 1),
       wk AS (SELECT DISTINCT week FROM a),
       stats AS (SELECT w.week,
            CAST(count(cur.user_id) AS BIGINT) AS n_active,
            CAST(sum(CASE WHEN f.first_week = w.week THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
            CAST(sum(CASE WHEN prev.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
            CAST(sum(CASE WHEN prev.user_id IS NULL
                           AND f.first_week < w.week THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
           FROM wk w
           JOIN a cur ON cur.week = w.week
           JOIN f ON f.user_id = cur.user_id
           LEFT JOIN a prev ON prev.user_id = cur.user_id
                            AND prev.week = w.week - 1
           GROUP BY 1),
       ch AS (SELECT w.week, CAST(count(*) AS BIGINT) AS n_churned
              FROM wk w
              JOIN a prev ON prev.week = w.week - 1
              LEFT JOIN a cur ON cur.user_id = prev.user_id
                              AND cur.week = w.week
              WHERE cur.user_id IS NULL
              GROUP BY 1)
       SELECT CAST(s.week AS BIGINT) AS week, s.n_active, s.n_new,
              s.n_retained, s.n_resurrected,
              CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned,
              CASE WHEN coalesce(c.n_churned, 0) > 0 THEN
                round(CAST(s.n_new + s.n_resurrected AS DOUBLE)
                      / CAST(c.n_churned AS DOUBLE), 4)
              END AS quick_ratio
       FROM stats s LEFT JOIN ch c ON c.week = s.week""",
)
def _growth_accounting_weekly(spark, sf_dir):
    """Weekly growth accounting (the Social Capital MAU decomposition):
    active(w) = new(w) + retained(w) + resurrected(w), with churned(w)
    = active(w-1) - retained(w) and the quick ratio (new+resurrected)/
    churned. ONE user-keyed fact shuffle (map-side-dedup'd
    collect_set of weeks) plus one explode and one week-bounded
    aggregate — new/retained/resurrected/churned are all array tests
    against the user's own week set, so there is no self-join, no
    window, and no second fact pass; a user's week count is bounded by
    the calendar, so the set rows stay small at 10^9 users. The
    product-growth companion to retention_cohorts."""
    ev = _t(spark, sf_dir, "events")
    # ONE fact-scale shuffle: the per-user week SET (map-side-dedup'd
    # collect_set) carries everything the former distinct + min-week
    # agg + two user-keyed self-joins derived — new/retained/
    # resurrected are array tests against the user's own week set, and
    # each (user, week) row also emits its churn contribution at
    # week+1 when the user is absent then. Weeks nobody was active in
    # never occur (every event has a user), and churn emissions landing
    # past a user's horizon drop in the final left join exactly as the
    # self-join formulation dropped them.
    pu = (
        ev.select("user_id", event_us(ev).alias("us"))
        .select("user_id", F.expr(f"us div {_WEEK_US}").cast("long").alias("week"))
        .groupBy("user_id")
        .agg(F.collect_set("week").alias("ws"))
        .select("ws", F.array_min("ws").alias("fw"))
    )
    act = F.struct(
        F.col("w").alias("week"),
        F.lit(1).alias("is_active"),
        (F.col("fw") == F.col("w")).cast("int").alias("is_new"),
        F.array_contains("ws", F.col("w") - 1).cast("int").alias("is_ret"),
        (
            ~F.array_contains("ws", F.col("w") - 1)
            & (F.col("fw") < F.col("w"))
        )
        .cast("int")
        .alias("is_res"),
        F.lit(0).alias("is_churn"),
    )
    churn = F.struct(
        (F.col("w") + 1).alias("week"),
        F.lit(0).alias("is_active"),
        F.lit(0).alias("is_new"),
        F.lit(0).alias("is_ret"),
        F.lit(0).alias("is_res"),
        F.lit(1).alias("is_churn"),
    )
    contrib = (
        pu.select(F.explode("ws").alias("w"), "ws", "fw")
        .select(
            F.explode(
                F.when(
                    ~F.array_contains("ws", F.col("w") + 1),
                    F.array(act, churn),
                ).otherwise(F.array(act))
            ).alias("c")
        )
        .select("c.*")
    )
    byweek = contrib.groupBy("week").agg(
        F.sum("is_active").cast("long").alias("n_active"),
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum("is_ret").cast("long").alias("n_retained"),
        F.sum("is_res").cast("long").alias("n_resurrected"),
        F.sum("is_churn").cast("long").alias("n_churned"),
    )
    # weeks with only churn emissions (nobody active) are exactly the
    # rows the former stats-side inner join dropped; active weeks with
    # no churn already hold the exact 0 the former coalesce produced —
    # so the stats⋈ch join collapses into one filter
    out = byweek.filter(F.col("n_active") > 0).select(
        F.col("week").cast("long"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.col("n_churned").cast("long").alias("n_churned"),
        F.when(
            F.col("n_churned") > 0,
            F.round(
                (F.col("n_new") + F.col("n_resurrected")).cast("double")
                / F.col("n_churned").cast("double"),
                4,
            ),
        ).alias("quick_ratio"),
    )
    return out


# ------------------------------------------------- DAU/MAU stickiness


@q(
    "dau_mau_stickiness",
    f"""WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // {_DAY_US} AS day,
                          epoch_us(ts) // {28 * _DAY_US} AS period
              FROM events),
       dau AS (SELECT period, day, CAST(count(*) AS BIGINT) AS dau
               FROM d GROUP BY 1, 2),
       agg AS (SELECT period, CAST(sum(dau) AS BIGINT) AS sum_dau,
                      CAST(count(*) AS BIGINT) AS n_days
               FROM dau GROUP BY 1),
       mau AS (SELECT period, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
               FROM d GROUP BY 1)
       SELECT CAST(a.period AS BIGINT) AS period, a.n_days, a.sum_dau, m.mau,
              CAST(a.sum_dau * 1000000 // (a.n_days * m.mau) AS BIGINT)
                AS stickiness_e6
       FROM agg a JOIN mau m USING (period)""",
)
def _dau_mau_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per 28-day period: mean daily actives over
    period actives, the engagement-frequency readout product teams
    track beside growth accounting. Integer end to end — the ratio is
    e6-quantized with int64 division (sum_dau*1e6 div (days*mau)), so
    no float exists anywhere. Two distinct-aggregations over the
    (user, day) activity relation; 28-day periods keep the bucketing
    pure integer arithmetic (calendar months would drag timezone
    semantics into the contract)."""
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.select("user_id", event_us(ev).alias("us"))
        .select(
            "user_id",
            F.expr(f"us div {_DAY_US}").cast("long").alias("day"),
            F.expr(f"us div {28 * _DAY_US}").cast("long").alias("period"),
        )
        .distinct()
    )
    # one aggregation pass over the distinct activity relation: d is
    # distinct (user, day) rows, so count(*) IS sum-of-daily-DAU, and
    # a day belongs to exactly one period (period = day div 28) so the
    # distinct-day count equals the dau-branch's group count — no
    # dau/mau self-join, one events scan instead of two
    agg = d.groupBy("period").agg(
        F.count(F.lit(1)).cast("long").alias("sum_dau"),
        F.countDistinct("day").cast("long").alias("n_days"),
        F.countDistinct("user_id").cast("long").alias("mau"),
    )
    return agg.select(
        F.col("period").cast("long"),
        "n_days",
        "sum_dau",
        "mau",
        F.expr("sum_dau * 1000000 div (n_days * mau)")
        .cast("long")
        .alias("stickiness_e6"),
    )


# --------------------------------------- weekday-seasonal outliers


@q(
    "weekday_seasonal_outliers",
    f"""WITH days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v,
                    CAST(d.t % 7 AS BIGINT) AS wd
             FROM days d LEFT JOIN pc USING (t)),
       lv AS (SELECT wd, v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2),
       cum AS (SELECT wd, v, c,
                CAST(sum(c) OVER (PARTITION BY wd ORDER BY v ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                CAST(sum(c) OVER (PARTITION BY wd) AS BIGINT) AS n
               FROM lv),
       med AS (SELECT wd, CAST(min(v) AS BIGINT) AS med
               FROM cum WHERE 2 * cw >= n GROUP BY 1),
       r AS (SELECT s.t, s.v, s.wd, CAST(s.v - m.med AS BIGINT) AS resid
             FROM s JOIN med m USING (wd)),
       alv AS (SELECT abs(resid) AS av, CAST(count(*) AS BIGINT) AS c
               FROM r GROUP BY 1),
       acum AS (SELECT av, c,
                 CAST(sum(c) OVER (ORDER BY av ASC ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cw,
                 CAST(sum(c) OVER () AS BIGINT) AS n
                FROM alv),
       mad AS (SELECT CAST(min(av) AS BIGINT) AS mad
               FROM acum WHERE 2 * cw >= n)
       SELECT r.t, r.v, r.wd, m2.med AS weekday_median, r.resid,
              (SELECT mad FROM mad) AS mad,
              CAST(2 * abs(r.resid) > 7 * (SELECT mad FROM mad) AS BIGINT)
                AS is_outlier
       FROM r JOIN med m2 USING (wd)
       WHERE 2 * abs(r.resid) > 7 * (SELECT mad FROM mad)""",
)
def _weekday_seasonal_outliers(spark, sf_dir):
    """Seasonal-robust outlier detection on daily purchase counts (the
    S-H-ESD shape, Hochenbaum et al. 2017, with exact medians instead
    of sample quantiles): subtract the per-weekday MEDIAN, flag days
    where |residual| > 3.5 x global MAD — the comparison kept exact as
    2|resid| > 7*MAD in int64. Both medians come from value-COUNT
    level tables (count domain, not day rows): the weekday median via
    a PARTITIONED cumulative-weight window, the MAD via the same
    selection on |residual| levels. Returns only flagged days."""
    # the shared cached daily purchase series (one conditional groupBy,
    # zero-purchase days folded in) replaces the distinct-days +
    # left-join double scan; the before-plan re-expanded that subtree
    # per reference (24 events scans, 66 Exchanges)
    s = _daily_purchases(spark, sf_dir).select(
        "t", "v", (F.col("t") % 7).cast("long").alias("wd")
    )
    lv = s.groupBy("wd", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.partitionBy("wd").orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("wd")
    cum = lv.withColumn("cw", F.sum("c").over(wc).cast("long")).withColumn(
        "n", F.sum("c").over(wn).cast("long")
    )
    med = (
        cum.filter(2 * F.col("cw") >= F.col("n"))
        .groupBy("wd")
        .agg(F.min("v").cast("long").alias("med"))
    )
    r = s.join(F.broadcast(med), "wd").select(
        "t", "v", "wd", (F.col("v") - F.col("med")).cast("long").alias("resid"),
        F.col("med").alias("weekday_median"),
    )
    alv = r.groupBy(F.abs(F.col("resid")).alias("av")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wa = Window.orderBy(F.col("av").asc()).rowsBetween(Window.unboundedPreceding, 0)
    tot = alv.agg(F.sum("c").cast("long").alias("n"))
    acum = alv.crossJoin(F.broadcast(tot)).withColumn(
        "cw", F.sum("c").over(wa).cast("long")
    )
    mad = (
        acum.filter(2 * F.col("cw") >= F.col("n"))
        .agg(F.min("av").cast("long").alias("mad"))
    )
    return (
        r.crossJoin(F.broadcast(mad))
        .filter(2 * F.abs(F.col("resid")) > 7 * F.col("mad"))
        .select(
            "t",
            "v",
            "wd",
            "weekday_median",
            "resid",
            "mad",
            (2 * F.abs(F.col("resid")) > 7 * F.col("mad"))
            .cast("long")
            .alias("is_outlier"),
        )
    )


# --------------------------------------------- price elasticity


@q(
    "price_elasticity_by_flag",
    """WITH b AS (SELECT l_returnflag,
                CAST(floor(ln(CAST(l_extendedprice AS DOUBLE)) * 10000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lx,
                CAST(floor(ln(CAST(l_quantity AS DOUBLE)) * 10000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ly
              FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0),
       s AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
                    CAST(sum(lx * lx) AS BIGINT) AS sxx,
                    CAST(sum(lx * ly) AS BIGINT) AS sxy,
                    CAST(sum(ly * ly) AS BIGINT) AS syy
             FROM b GROUP BY 1)
       SELECT l_returnflag, n,
              round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                AS elasticity,
              round((CAST(sy AS DOUBLE)
                     - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * CAST(sx AS DOUBLE))
                    / CAST(n AS DOUBLE) / CAST(10000 AS DOUBLE), 6)
                AS intercept_ln,
              round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
       FROM s ORDER BY l_returnflag""",
)
def _price_elasticity_by_flag(spark, sf_dir):
    """Log-log price elasticity of demand per return flag: OLS slope
    of ln(quantity) on ln(extendedprice) — the econometric readout for
    pricing teams, the grouped-OLS family's log-domain member. Per-row
    logs are e4-quantized (int64 moment sums stay within range at
    factor-100: |lx|<=1.2e5 so sum(lx*ly) <= ~1e10 per row — 6e9 rows
    headroom); slope/intercept/r2 use DOUBLE-cast moment
    products (n*sxy at 10^9-row groups exceeds int64 — the factor-10
    differential caught the int form overflowing; the int64 SUMS stay
    exact, only the final one-shot products are double)."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)).select(
        "l_returnflag",
        F.floor(F.log(F.col("l_extendedprice").cast("double")) * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("lx"),
        F.floor(F.log(F.col("l_quantity").cast("double")) * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("ly"),
    )
    s = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
        F.sum(F.col("ly") * F.col("ly")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    deny = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.round(num / den, 6).alias("elasticity"),
        F.round(
            (F.col("sy").cast("double") - num / den * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / F.lit(10000.0),
            6,
        ).alias("intercept_ln"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    ).orderBy("l_returnflag")


# --------------------------------------------- McNemar's test


@q(
    "mcnemar_rule_compare",
    """WITH d AS (SELECT
            CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS pred_a,
            CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) >= 40
                 THEN 1 ELSE 0 END AS pred_b,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth
           FROM documents),
       cells AS (SELECT
            CAST(sum(CASE WHEN pred_a = truth AND pred_b <> truth
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN pred_a <> truth AND pred_b = truth
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN pred_a = truth AND pred_b = truth
                     THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
            CAST(sum(CASE WHEN pred_a <> truth AND pred_b <> truth
                     THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
           FROM d)
       SELECT b, c, both_right, both_wrong,
              CASE WHEN b + c > 0 THEN
                round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                      / CAST(b + c AS DOUBLE), 6)
              END AS chi2,
              CASE WHEN b + c > 0 THEN
                CAST(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                     / CAST(b + c AS DOUBLE) > CAST(3.841 AS DOUBLE) AS BIGINT)
              ELSE 0 END AS reject_005
       FROM cells""",
)
def _mcnemar_rule_compare(spark, sf_dir):
    """McNemar's paired test (continuity-corrected, McNemar 1947)
    comparing two deterministic document filters — a char-length rule
    vs a token-count rule — against the language label: the b/c
    discordant cells are exact int64 sums over one scan; chi2 =
    (|b-c|-1)^2/(b+c) is the final one-shot formula. This is the
    paired-classifier significance check an eval harness runs before
    swapping quality filters (companion to fleiss_kappa_ratings /
    cohen_kappa_positions on the agreement side)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    d = docs.select(
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("pred_a"),
        F.when(F.size(toks) >= 40, 1).otherwise(0).alias("pred_b"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
    )
    cells = d.agg(
        F.sum(
            F.when((F.col("pred_a") == F.col("truth")) & (F.col("pred_b") != F.col("truth")), 1).otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when((F.col("pred_a") != F.col("truth")) & (F.col("pred_b") == F.col("truth")), 1).otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.when((F.col("pred_a") == F.col("truth")) & (F.col("pred_b") == F.col("truth")), 1).otherwise(0)
        )
        .cast("long")
        .alias("both_right"),
        F.sum(
            F.when((F.col("pred_a") != F.col("truth")) & (F.col("pred_b") != F.col("truth")), 1).otherwise(0)
        )
        .cast("long")
        .alias("both_wrong"),
    )
    chi = (
        ((F.abs(F.col("b") - F.col("c")) - 1) * (F.abs(F.col("b") - F.col("c")) - 1))
        .cast("double")
        / (F.col("b") + F.col("c")).cast("double")
    )
    return cells.select(
        "b",
        "c",
        "both_right",
        "both_wrong",
        F.when(F.col("b") + F.col("c") > 0, F.round(chi, 6)).alias("chi2"),
        F.when(F.col("b") + F.col("c") > 0, (chi > F.lit(3.841)).cast("long"))
        .otherwise(F.lit(0))
        .alias("reject_005"),
    )


# --------------------------------------------- per-source token KL


@q(
    "source_token_kl",
    f"""WITH {_TOK_SQL},
       src AS (SELECT d.source, t.token
               FROM tok t JOIN documents d USING (doc_id)),
       cs AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c_s
              FROM src GROUP BY 1, 2),
       ns AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s
              FROM cs GROUP BY 1),
       ct AS (SELECT token, CAST(count(*) AS BIGINT) AS c_t FROM src GROUP BY 1),
       nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t FROM ct),
       terms AS (SELECT cs.source,
                CAST(floor((CAST(cs.c_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
                           * ln((CAST(cs.c_s AS DOUBLE) * CAST(nt.n_t AS DOUBLE))
                                / (CAST(ns.n_s AS DOUBLE) * CAST(ct.c_t AS DOUBLE)))
                           * CAST(1000000000 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS term_e9
              FROM cs JOIN ns USING (source) JOIN ct USING (token)
              CROSS JOIN nt)
       SELECT s.source, n.n_s AS n_tokens,
              round(CAST(s.kl_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)
                AS kl_divergence
       FROM (SELECT source, CAST(sum(term_e9) AS BIGINT) AS kl_e9
             FROM terms GROUP BY 1) s
       JOIN ns n USING (source)""",
)
def _source_token_kl(spark, sf_dir):
    """Per-source token-distribution drift: KL(p_source || p_corpus)
    over the unigram vocabulary — the domain-shift readout a data-mix
    pipeline tracks per source next to psi_value_drift (PSI on values;
    this is its lexical twin). Each KL term p*ln(p/q) is one double
    expression over four exact int64 counts, e9-quantized BEFORE the
    per-source sum (vocab-bounded, <=|V| terms per source); zero-count
    tokens contribute nothing by construction since terms only exist
    for observed (source, token) pairs."""
    toks = _tokens(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    src = (
        toks.select("doc_id", F.explode("tokens").alias("token"))
        .join(docs, "doc_id")
        .select("source", "token")
    )
    # ONE fact aggregation: the (source, token) counts are
    # vocab x source bounded and the per-source totals, corpus token
    # counts, and grand total all fold from them — unpinned, ns/ct/nt
    # each re-ran the token explode + dim join (6 scans at the r8 audit)
    cs = (
        src.groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_s"))
        .localCheckpoint(eager=True)
    )
    ns = cs.groupBy("source").agg(F.sum("c_s").cast("long").alias("n_s"))
    ct = cs.groupBy("token").agg(F.sum("c_s").cast("long").alias("c_t"))
    nt = ct.agg(F.sum("c_t").cast("long").alias("n_t"))
    p = F.col("c_s").cast("double") / F.col("n_s").cast("double")
    ratio = (F.col("c_s").cast("double") * F.col("n_t").cast("double")) / (
        F.col("n_s").cast("double") * F.col("c_t").cast("double")
    )
    terms = (
        cs.join(F.broadcast(ns), "source")
        .join(F.broadcast(ct), "token")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            F.floor(p * F.log(ratio) * F.lit(1.0e9) + F.lit(0.5))
            .cast("long")
            .alias("term_e9"),
        )
    )
    kl = terms.groupBy("source").agg(F.sum("term_e9").cast("long").alias("kl_e9"))
    return kl.join(F.broadcast(ns), "source").select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.round(F.col("kl_e9").cast("double") / F.lit(1.0e9), 6).alias(
            "kl_divergence"
        ),
    )


# --------------------------------------- Markov removal attribution

_MARKOV_CHANNELS = ["signup", "view", "click", "error"]


def _markov_oracle_sql(horizon: int = 16) -> str:
    chs = _MARKOV_CHANNELS
    base = """ev0 AS (SELECT user_id AS u, event_type AS t,
                      epoch_us(ts) AS us, event_id AS eid FROM events),
       fp AS (SELECT u, min(ROW(us, eid)) AS f FROM ev0
              WHERE t = 'purchase' GROUP BY 1),
       pre AS MATERIALIZED (SELECT e.u, e.t, e.us, e.eid, fp.u IS NOT NULL AS conv
               FROM ev0 e LEFT JOIN fp ON fp.u = e.u
               WHERE e.t <> 'purchase'
                 AND (fp.u IS NULL OR ROW(e.us, e.eid) < fp.f)),
       ordered AS (SELECT u, t, conv,
                lag(t) OVER (PARTITION BY u ORDER BY us ASC, eid ASC) AS prev,
                row_number() OVER (PARTITION BY u ORDER BY us DESC, eid DESC)
                  AS rdesc
               FROM pre),
       tmid AS (SELECT coalesce(prev, 'start') AS src, t AS dst FROM ordered),
       tend AS (SELECT t AS src, CASE WHEN conv THEN 'conv' ELSE 'null' END AS dst
                FROM ordered WHERE rdesc = 1),
       tempty AS (SELECT 'start' AS src, 'conv' AS dst
                  FROM fp LEFT JOIN (SELECT DISTINCT u FROM pre) p ON p.u = fp.u
                  WHERE p.u IS NULL),
       cnt AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
               FROM (SELECT * FROM tmid UNION ALL SELECT * FROM tend
                     UNION ALL SELECT * FROM tempty) GROUP BY 1, 2)"""
    parts = [base]
    for v in ["base"] + chs:
        if v == "base":
            cv = "cnt_base AS (SELECT src, dst, c FROM cnt)"
        else:
            cv = (
                f"cnt_{v} AS (SELECT src, CASE WHEN dst = '{v}' THEN 'null' "
                f"ELSE dst END AS dst, CAST(sum(c) AS BIGINT) AS c "
                f"FROM cnt WHERE src <> '{v}' GROUP BY 1, 2)"
            )
        tv = (
            f"tot_{v} AS (SELECT src, CAST(sum(c) AS BIGINT) AS tt "
            f"FROM cnt_{v} GROUP BY 1),\n       "
            f"tr_{v} AS MATERIALIZED (SELECT c.src, c.dst, "
            f"round(CAST(c.c AS DOUBLE) / CAST(t.tt AS DOUBLE), 10) AS p "
            f"FROM cnt_{v} c JOIN tot_{v} t USING (src)),\n       "
            f"v0_{v} AS (SELECT DISTINCT src AS node, CAST(0 AS DOUBLE) AS value "
            f"FROM tr_{v} UNION ALL SELECT 'conv', CAST(1 AS DOUBLE) "
            f"UNION ALL SELECT 'null', CAST(0 AS DOUBLE))"
        )
        steps = []
        prev = f"v0_{v}"
        for i in range(1, horizon + 1):
            steps.append(
                f"v{i}_{v} AS (SELECT t.src AS node, "
                f"round(sum(t.p * vv.value), 10) AS value "
                f"FROM tr_{v} t JOIN {prev} vv ON vv.node = t.dst GROUP BY 1 "
                f"UNION ALL SELECT 'conv', CAST(1 AS DOUBLE) "
                f"UNION ALL SELECT 'null', CAST(0 AS DOUBLE))"
            )
            prev = f"v{i}_{v}"
        pc = f"pc_{v} AS MATERIALIZED (SELECT value AS pc FROM {prev} WHERE node = 'start')"
        parts.append(",\n       ".join([cv, tv] + steps + [pc]))
    eff = {
        ch: (
            f"greatest(round(CAST(1 AS DOUBLE) - (SELECT pc FROM pc_{ch}) "
            f"/ (SELECT pc FROM pc_base), 6), CAST(0 AS DOUBLE))"
        )
        for ch in chs
    }
    total = " + ".join(eff[ch] for ch in chs)
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{ch}' AS channel, (SELECT pc FROM pc_base) AS pc_base,
              (SELECT pc FROM pc_{ch}) AS pc_removed,
              {eff[ch]} AS removal_effect,
              CASE WHEN {total} > 0
                   THEN round({eff[ch]} / ({total}), 6) END AS attribution_share"""
        for ch in chs
    )
    return "WITH " + ",\n       ".join(parts) + "\n       " + rows


@q("markov_attribution", _markov_oracle_sql(16))
def _markov_attribution(spark, sf_dir):
    """Markov-chain multi-touch attribution by removal effect (Anderl
    et al. 2014): user journeys (events strictly before the first
    purchase, (time, event_id)-ordered) become a first-order chain over
    start/channels/conv/null; each channel's credit is the relative
    drop in the BOUNDED-HORIZON conversion probability (16 value-
    iteration steps, each rounded to 10 decimals — the pagerank
    cross-engine idiom) when the channel is cut from the graph. The
    chain solves run on the (channels+2)^2-bounded transition level
    table; journey derivation is one user-partitioned window. The
    data-driven counterpart of attribution_revenue's positional rules.
    operators/markov.py."""
    from redshells_spark.operators.markov import (
        journey_transition_counts,
        removal_effect_attribution,
    )

    ev = _t(spark, sf_dir, "events")
    ev2 = ev.select(
        "user_id", "event_type", "event_id", event_us(ev).alias("us")
    )
    cnt = journey_transition_counts(ev2)
    return removal_effect_attribution(spark, cnt, _MARKOV_CHANNELS, horizon=16)
