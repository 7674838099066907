"""Round-8 batch 6: population-estimation, rank-concordance, drift
monitoring, retention modeling, and staleness completions — the
Chapman capture-recapture estimate of the active-user population (the
overlap-based companion to HLL/KMV cardinality sketches), Kendall's W
concordance across three deterministic nation rankings (the
multi-judge completion of ARI/NMI/kendall-tau), a per-week PSI drift
series against the first week (the time-series form of the one-shot
psi_value_drift), an exponential retention-decay fit over pooled
cohort ages (the model on top of retention_cohorts), and the
staleness profile of the tolerance as-of join (percentiles of how old
the joined state is — the feature-store SLA readout).

House determinism rules: population/rank/overlap algebra exact int64;
signed e6 errors as sign × non-negative div; ln terms e9-quantized
per level BEFORE summation (the bigram-entropy idiom); percentiles by
cumulative-weight selection over bounded level tables, never a global
fact-proportional sort.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US


# ------------------------------------------- capture-recapture


@q(
    "capture_recapture_users",
    f"""WITH b AS (SELECT CAST(min(epoch_us(ts)) // {_DAY_US} AS BIGINT) AS d0
               FROM events),
       e AS (SELECT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events),
       s1 AS (SELECT DISTINCT user_id FROM e, b WHERE e.d < b.d0 + 15),
       s2 AS (SELECT DISTINCT user_id FROM e, b WHERE e.d >= b.d0 + 15),
       m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM s1
             JOIN s2 USING (user_id)),
       c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
                    (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
                    m.m AS m,
                    (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM e)
                      AS true_n
             FROM m),
       est AS (SELECT n1, n2, m, true_n,
                      CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
                        AS chapman
               FROM c)
       SELECT n1, n2, m, chapman, true_n,
              CAST(CASE WHEN chapman >= true_n
                   THEN ((chapman - true_n) * 1000000) // true_n
                   ELSE -(((true_n - chapman) * 1000000) // true_n)
                   END AS BIGINT) AS err_e6
       FROM est""",
)
def _capture_recapture_users(spark, sf_dir):
    """Chapman capture-recapture estimate (1951) of the active-user
    population from two time-split "captures" (first 15 days vs the
    rest): N̂ = (n1+1)(n2+1)/(m+1) − 1 — the overlap-based cardinality
    estimate ecologists use, here the closed-form sanity check beside
    the HLL/KMV sketches (it needs only three exact counts, no
    hashing). The estimate, the true distinct count, and the signed e6
    relative error are all exact integers (sign outside the div). Two
    distinct-aggregations and one semi-join — fact-scale work is the
    day-tagged scan."""
    ev = _t(spark, sf_dir, "events")
    e = ev.withColumn("us", event_us(ev, "ts")).select(
        "user_id", F.expr(f"us div {_DAY_US}").cast("long").alias("d")
    )
    d0 = e.agg(F.min("d").cast("long").alias("d0"))
    # ONE per-user aggregate carries both capture flags: n1/n2/m/true_n
    # are sums over it — the set-algebra form re-ran the events scan
    # per distinct/count (9 scans at the r8 audit); |s1 ∩ s2| is exactly
    # the users flagged in both windows, true_n the user-row count
    peru = (
        e.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("d") < F.col("d0") + 15, 1).otherwise(0)).alias(
                "in1"
            ),
            F.max(F.when(F.col("d") >= F.col("d0") + 15, 1).otherwise(0)).alias(
                "in2"
            ),
        )
    )
    c = peru.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.when((F.col("in1") == 1) & (F.col("in2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("m"),
        F.count(F.lit(1)).cast("long").alias("true_n"),
    )
    est = c.withColumn(
        "chapman",
        F.expr("cast((n1 + 1) * (n2 + 1) div (m + 1) - 1 as long)"),
    )
    return est.select(
        "n1",
        "n2",
        "m",
        "chapman",
        "true_n",
        F.expr(
            "cast(case when chapman >= true_n"
            " then ((chapman - true_n) * 1000000) div true_n"
            " else -(((true_n - chapman) * 1000000) div true_n)"
            " end as long)"
        ).alias("err_e6"),
    )


# --------------------------------------------------- Kendall's W


@q(
    "kendall_w_rankings",
    """WITH rev AS (SELECT s.s_nationkey AS nationkey,
                        CAST(sum(CAST(floor(l.l_extendedprice * 100
                                      + CAST(0.5 AS DOUBLE)) AS BIGINT)
                             * (100 - CAST(floor(l.l_discount * 100
                                      + CAST(0.5 AS DOUBLE)) AS BIGINT)))
                             AS BIGINT) AS rev_u,
                        CAST(count(*) AS BIGINT) AS n_items,
                        CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
                 FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                 GROUP BY 1),
       rk AS (SELECT nationkey,
                     CAST(row_number() OVER (ORDER BY rev_u DESC,
                                             nationkey ASC) AS BIGINT) AS r1,
                     CAST(row_number() OVER (ORDER BY n_items DESC,
                                             nationkey ASC) AS BIGINT) AS r2,
                     CAST(row_number() OVER (ORDER BY n_orders DESC,
                                             nationkey ASC) AS BIGINT) AS r3
              FROM rev),
       d2 AS (SELECT n,
                     CAST(sum((2 * (r1 + r2 + r3) - 3 * (n + 1))
                              * (2 * (r1 + r2 + r3) - 3 * (n + 1)))
                          AS BIGINT) AS sum_d2_x4
              FROM rk CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n
                                  FROM rk) nn
              GROUP BY n)
       SELECT n AS n_items, CAST(3 AS BIGINT) AS k_judges, sum_d2_x4,
              CAST(sum_d2_x4 * 1000000 // (3 * (n * n * n - n)) AS BIGINT)
                AS w_e6,
              round(CAST(n - 1 AS DOUBLE) * CAST(sum_d2_x4 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)), 6) AS chi2
       FROM d2""",
)
def _kendall_w_rankings(spark, sf_dir):
    """Kendall's coefficient of concordance W (1939) across three
    deterministic nation rankings — by supplier revenue, by lineitem
    count, by distinct orders — "do the three business lenses agree on
    the league table?", the multi-judge completion of the pairwise
    kendall_tau/rbo agreement family. Full-order row_number rankings
    (tie-break nationkey) mean no tie correction; deviations are kept
    on the ×2 scale so ΣD²×4 is exact int64, W_e6 = ΣD²×4·1e6 div
    (3(n³−n)) (the 4k²/12 factor with k=3 reduces exactly), and the
    chi² = k(n−1)W readout is one fixed IEEE tree. Everything after the one fact groupBy is the 25-row nation
    relation."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum(
                money_units(F.col("l_extendedprice"))
                * (F.lit(100) - money_units(F.col("l_discount")))
            )
            .cast("long")
            .alias("rev_u"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
    )
    w1 = Window.orderBy(F.col("rev_u").desc(), F.col("nationkey").asc())
    w2 = Window.orderBy(F.col("n_items").desc(), F.col("nationkey").asc())
    w3 = Window.orderBy(F.col("n_orders").desc(), F.col("nationkey").asc())
    rk = rev.select(
        "nationkey",
        F.row_number().over(w1).cast("long").alias("r1"),
        F.row_number().over(w2).cast("long").alias("r2"),
        F.row_number().over(w3).cast("long").alias("r3"),
    )
    nn = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    d2 = (
        rk.crossJoin(F.broadcast(nn))
        .select(
            "n",
            (
                (2 * (F.col("r1") + F.col("r2") + F.col("r3")) - 3 * (F.col("n") + 1))
                * (2 * (F.col("r1") + F.col("r2") + F.col("r3")) - 3 * (F.col("n") + 1))
            )
            .cast("long")
            .alias("dx4"),
        )
        .groupBy("n")
        .agg(F.sum("dx4").cast("long").alias("sum_d2_x4"))
    )
    nd = F.col("n").cast("double")
    # 4k²(n³−n)/12 with k=3 reduces to the EXACT integer 3(n³−n) —
    # no fractional denominator enters the e6 division
    chi2 = (nd - 1.0) * F.col("sum_d2_x4").cast("double") / (
        nd * nd * nd - nd
    )
    return d2.select(
        F.col("n").alias("n_items"),
        F.lit(3).cast("long").alias("k_judges"),
        "sum_d2_x4",
        F.expr(
            "cast(sum_d2_x4 * 1000000 div (3 * (n * n * n - n)) as long)"
        ).alias("w_e6"),
        F.round(chi2, 6).alias("chi2"),
    )


# ------------------------------------------------ weekly PSI series


@q(
    "psi_weekly_series",
    f"""WITH p AS (SELECT epoch_us(ts) // {_WEEK_US} AS w,
                        least(CAST(floor(value / 10) AS BIGINT), 9) AS bin
               FROM events WHERE event_type = 'purchase'),
       w0 AS (SELECT CAST(min(w) AS BIGINT) AS w0 FROM p),
       cnt AS (SELECT w, bin, CAST(count(*) AS BIGINT) AS c
               FROM p GROUP BY 1, 2),
       tot AS (SELECT w, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
       grid AS (SELECT t.w, b.bin, coalesce(c.c, 0) AS c, t.n
                FROM tot t CROSS JOIN (SELECT unnest(range(10)) AS bin) b
                LEFT JOIN cnt c ON c.w = t.w AND c.bin = b.bin),
       sm AS (SELECT w, bin,
                     (CAST(c + 1 AS DOUBLE)) / (CAST(n + 10 AS DOUBLE)) AS pr,
                     n
              FROM grid),
       base AS (SELECT s.bin, s.pr AS p0 FROM sm s, w0
                WHERE s.w = w0.w0),
       terms AS (SELECT s.w, s.n,
                        CAST(floor((s.pr - b.p0) * ln(s.pr / b.p0)
                                   * 1000000000 + CAST(0.5 AS DOUBLE))
                             AS BIGINT) AS t_e9
                 FROM sm s JOIN base b ON b.bin = s.bin)
       SELECT w, CAST(max(n) AS BIGINT) AS n_events,
              CAST(sum(t_e9) AS BIGINT) AS psi_e9
       FROM terms GROUP BY 1 ORDER BY 1""",
)
def _psi_weekly_series(spark, sf_dir):
    """Per-week Population Stability Index of the purchase-value
    distribution against the FIRST week — the time-series form of the
    one-shot psi_value_drift: the monitoring dashboard a model owner
    actually watches (PSI > 0.2 per week = investigate). Ten fixed
    $10-wide bins with add-one smoothing (no empty-bin NULLs on
    either engine); each bin's (p_w−p_0)·ln(p_w/p_0) term is
    e9-quantized BEFORE the sum (the bigram-entropy idiom), so the
    weekly PSI is an exact int64 sum of 10 integers. The first week's
    own row is the exact-zero self-comparison anchor. One fact-scale
    (week, bin) groupBy."""
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("us", event_us(ev, "ts"))
        .select(
            F.expr(f"us div {_WEEK_US}").cast("long").alias("w"),
            F.least(F.floor(F.col("value") / 10).cast("long"), F.lit(9)).alias(
                "bin"
            ),
        )
    )
    # week x 10-bin bounded; the weekly totals, the grid and the
    # first-week anchor all derive from it (ONE fact aggregation)
    cnt = (
        p.groupBy("w", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = cnt.groupBy("w").agg(F.sum("c").cast("long").alias("n"))
    bins = spark.range(10).select(F.col("id").cast("long").alias("bin"))
    grid = (
        tot.crossJoin(F.broadcast(bins))
        .join(cnt, ["w", "bin"], "left")
        .select(
            "w",
            "bin",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "n",
        )
    )
    sm = grid.select(
        "w",
        "bin",
        ((F.col("c") + 1).cast("double") / (F.col("n") + 10).cast("double")).alias(
            "pr"
        ),
        "n",
    )
    w0 = cnt.agg(F.min("w").cast("long").alias("w0"))
    base = (
        sm.crossJoin(F.broadcast(w0))
        .filter(F.col("w") == F.col("w0"))
        .select("bin", F.col("pr").alias("p0"))
    )
    terms = sm.join(F.broadcast(base), "bin").select(
        "w",
        "n",
        F.floor(
            (F.col("pr") - F.col("p0"))
            * F.log(F.col("pr") / F.col("p0"))
            * F.lit(1_000_000_000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_e9"),
    )
    return (
        terms.groupBy("w")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.sum("t_e9").cast("long").alias("psi_e9"),
        )
        .orderBy("w")
    )


# -------------------------------------------- retention decay fit


@q(
    "retention_decay_fit",
    f"""WITH e AS (SELECT user_id, epoch_us(ts) // {_WEEK_US} AS w
               FROM events),
       uw AS (SELECT DISTINCT user_id, w FROM e),
       coh AS (SELECT user_id, CAST(min(w) AS BIGINT) AS c FROM uw GROUP BY 1),
       maxw AS (SELECT CAST(max(w) AS BIGINT) AS mw FROM uw),
       act AS (SELECT u.w - c.c AS age, CAST(count(*) AS BIGINT) AS active
               FROM uw u JOIN coh c USING (user_id)
               WHERE u.w - c.c >= 1
               GROUP BY 1),
       elig AS (SELECT a.age, CAST(count(*) AS BIGINT) AS eligible
                FROM coh c CROSS JOIN maxw
                JOIN (SELECT DISTINCT u.w - c2.c AS age
                      FROM uw u JOIN coh c2 USING (user_id)
                      WHERE u.w - c2.c >= 1) a
                  ON c.c + a.age <= maxw.mw
                GROUP BY 1),
       r AS (SELECT a.age,
                    CAST(a.active * 1000000 // e.eligible AS BIGINT) AS rate_e6
             FROM act a JOIN elig e USING (age)
             WHERE a.active > 0),
       lp AS (SELECT age,
                     CAST(floor(ln(CAST(rate_e6 AS DOUBLE)
                                   / CAST(1000000 AS DOUBLE))
                                * 1000000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                       AS lr_e9
              FROM r),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(age) AS BIGINT) AS sx,
                    CAST(sum(lr_e9) AS BIGINT) AS sy,
                    CAST(sum(age * lr_e9) AS BIGINT) AS sxy,
                    CAST(sum(age * age) AS BIGINT) AS sxx
             FROM lp),
       fit AS (SELECT n,
                      CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        / CAST(1000000000 AS DOUBLE) AS slope,
                      (CAST(sy AS DOUBLE) / CAST(1000000000 AS DOUBLE)
                       - (CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE)
                          / CAST(1000000000 AS DOUBLE))
                         * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE) AS intercept
               FROM m WHERE n >= 2 AND n * sxx - sx * sx <> 0)
       SELECT n AS n_points, round(slope, 6) AS slope,
              round(intercept, 6) AS intercept,
              round(CASE WHEN slope < 0
                    THEN CAST(-0.6931471805599453 AS DOUBLE) / slope
                    ELSE CAST(0 AS DOUBLE) END, 6) AS half_life_weeks
       FROM fit""",
)
def _retention_decay_fit(spark, sf_dir):
    """Exponential retention-decay fit over pooled cohort ages: the
    log-linear OLS ln(retention(age)) ~ age whose slope gives the
    retention half-life — the MODEL on top of retention_cohorts'
    table (a growth team quotes "half-life 3 weeks", not a matrix).
    Pooled age-level rates are exact e6 integer ratios
    (active-at-age over cohort-eligible-at-age); their logs are
    e9-quantized per level before the exact int64 OLS moments (the
    zipf idiom); slope/intercept/half-life (−ln2/slope, ln2 as a
    shared literal) are one fixed IEEE tree. Degenerate (<2 ages)
    corpora emit no row on either side."""
    ev = _t(spark, sf_dir, "events")
    uw = (
        ev.withColumn("us", event_us(ev, "ts"))
        .select(
            "user_id", F.expr(f"us div {_WEEK_US}").cast("long").alias("w")
        )
        .distinct()
        # (user, week) distinct rows feed the cohort map, the max-week
        # probe and the age join — pin or the events scan+dedup re-runs
        # per consumer (6 scans at the r8 audit)
        .localCheckpoint(eager=True)
    )
    coh = uw.groupBy("user_id").agg(
        F.min("w").cast("long").alias("c")
    ).localCheckpoint(eager=True)  # per-user; the age join and the
    # eligibility grid both consume it
    maxw = uw.agg(F.max("w").cast("long").alias("mw"))
    act = (
        uw.join(coh, "user_id")
        .select((F.col("w") - F.col("c")).cast("long").alias("age"))
        .filter(F.col("age") >= 1)
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("long").alias("active"))
        .localCheckpoint(eager=True)  # age-level bounded; feeds the
        # age domain and the rate join
    )
    ages = act.select("age").distinct()
    elig = (
        coh.crossJoin(F.broadcast(maxw))
        .crossJoin(F.broadcast(ages))
        .filter(F.col("c") + F.col("age") <= F.col("mw"))
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("long").alias("eligible"))
    )
    r = (
        act.join(elig, "age")
        .filter(F.col("active") > 0)
        .select(
            "age",
            F.expr("cast(active * 1000000 div eligible as long)").alias(
                "rate_e6"
            ),
        )
    )
    lp = r.select(
        "age",
        F.floor(
            F.log(F.col("rate_e6").cast("double") / F.lit(1_000_000.0))
            * F.lit(1_000_000_000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr_e9"),
    )
    m = lp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("age").cast("long").alias("sx"),
        F.sum("lr_e9").cast("long").alias("sy"),
        F.sum(F.col("age") * F.col("lr_e9")).cast("long").alias("sxy"),
        F.sum(F.col("age") * F.col("age")).cast("long").alias("sxx"),
    )
    slope = (
        (
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / F.lit(1_000_000_000.0)
    )
    intercept = (
        F.col("sy").cast("double") / F.lit(1_000_000_000.0)
        - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return (
        m.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        )
        .select(
            F.col("n").alias("n_points"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(
                F.when(
                    slope < 0, F.lit(-0.6931471805599453) / slope
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("half_life_weeks"),
        )
    )


# --------------------------------------- feature staleness profile


@q(
    "feature_staleness_profile",
    f"""WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_us(ts) AS us
                  FROM events WHERE event_type IN ('click', 'purchase')),
       marked AS (SELECT event_id, user_id, event_type, us,
                         max(CASE WHEN event_type = 'purchase'
                             THEN us END) OVER (
                           PARTITION BY user_id
                           ORDER BY us ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) AS last_p_us
                  FROM e),
       clk AS (SELECT CASE WHEN last_p_us IS NOT NULL
                            AND us - last_p_us <= {_DAY_US}
                           THEN (us - last_p_us) // 1000000 END AS gap_s
               FROM marked WHERE event_type = 'click'),
       agg AS (SELECT CAST(count(*) AS BIGINT) AS n_clicks,
                      CAST(count(gap_s) AS BIGINT) AS n_matched,
                      CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS gap_sum_s,
                      CAST(coalesce(max(gap_s), 0) AS BIGINT) AS max_gap_s
               FROM clk),
       lvl AS (SELECT gap_s, CAST(count(*) AS BIGINT) AS c
               FROM clk WHERE gap_s IS NOT NULL GROUP BY 1),
       cum AS (SELECT gap_s,
                      CAST(sum(c) OVER (ORDER BY gap_s ASC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
               FROM lvl),
       q AS (SELECT a.n_matched,
                    (SELECT min(gap_s) FROM cum
                     WHERE cw * 2 >= a.n_matched) AS p50_s,
                    (SELECT min(gap_s) FROM cum
                     WHERE cw * 10 >= a.n_matched * 9) AS p90_s,
                    (SELECT min(gap_s) FROM cum
                     WHERE cw * 100 >= a.n_matched * 99) AS p99_s
             FROM agg a)
       SELECT a.n_clicks, a.n_matched,
              CAST(a.n_matched * 1000000 // a.n_clicks AS BIGINT)
                AS match_rate_e6,
              CAST(CASE WHEN a.n_matched > 0
                   THEN a.gap_sum_s // a.n_matched ELSE 0 END AS BIGINT)
                AS mean_gap_s,
              CAST(coalesce(q.p50_s, 0) AS BIGINT) AS p50_gap_s,
              CAST(coalesce(q.p90_s, 0) AS BIGINT) AS p90_gap_s,
              CAST(coalesce(q.p99_s, 0) AS BIGINT) AS p99_gap_s,
              a.max_gap_s
       FROM agg a CROSS JOIN q""",
)
def _feature_staleness_profile(spark, sf_dir):
    """Staleness profile of the tolerance as-of join: when a click
    reads its latest ≤24h-old purchase, HOW old is that state —
    match rate, mean, exact p50/p90/p99 and max gap in whole seconds.
    The feature-store SLA readout on top of asof_join_tolerance
    (age-of-information, the metric a platform team alerts on). Gaps
    quantize to seconds so the percentile level table is bounded by
    the 86 400-second tolerance domain regardless of corpus size;
    percentiles select by cumulative weight (ceil(q·n) ⟺ cw·den ≥
    n·num in integers); every ratio is an exact integer division."""
    ev = _t(spark, sf_dir, "events")
    e = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .withColumn("us", event_us(ev, "ts"))
        .select("event_id", "user_id", "event_type", "us")
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = e.withColumn(
        "last_p_us",
        F.max(F.when(F.col("event_type") == "purchase", F.col("us"))).over(wu),
    )
    clk = marked.filter(F.col("event_type") == "click").select(
        F.when(
            F.col("last_p_us").isNotNull()
            & (F.col("us") - F.col("last_p_us") <= F.lit(_DAY_US)),
            F.expr(f"(us - last_p_us) div 1000000"),
        )
        .cast("long")
        .alias("gap_s")
    )
    agg = clk.agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.count("gap_s").cast("long").alias("n_matched"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("long").alias("gap_sum_s"),
        F.coalesce(F.max("gap_s"), F.lit(0)).cast("long").alias("max_gap_s"),
    )
    lvl = (
        clk.filter(F.col("gap_s").isNotNull())
        .groupBy("gap_s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wcum = Window.orderBy(F.col("gap_s").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = lvl.select("gap_s", F.sum("c").over(wcum).cast("long").alias("cw"))
    cj = cum.crossJoin(F.broadcast(agg.select("n_matched")))
    qs = cj.agg(
        F.min(F.when(F.col("cw") * 2 >= F.col("n_matched"), F.col("gap_s"))).alias(
            "p50_s"
        ),
        F.min(
            F.when(F.col("cw") * 10 >= F.col("n_matched") * 9, F.col("gap_s"))
        ).alias("p90_s"),
        F.min(
            F.when(F.col("cw") * 100 >= F.col("n_matched") * 99, F.col("gap_s"))
        ).alias("p99_s"),
    )
    return agg.crossJoin(qs).select(
        "n_clicks",
        "n_matched",
        F.expr("cast(n_matched * 1000000 div n_clicks as long)").alias(
            "match_rate_e6"
        ),
        F.expr(
            "cast(case when n_matched > 0 then gap_sum_s div n_matched"
            " else 0 end as long)"
        ).alias("mean_gap_s"),
        F.coalesce(F.col("p50_s"), F.lit(0)).cast("long").alias("p50_gap_s"),
        F.coalesce(F.col("p90_s"), F.lit(0)).cast("long").alias("p90_gap_s"),
        F.coalesce(F.col("p99_s"), F.lit(0)).cast("long").alias("p99_gap_s"),
        "max_gap_s",
    )
