"""Round-7 batch 9: nonparametric-test and survival completion tier —
Wilcoxon signed-rank (paired, tie-corrected midranks), Cochran's Q
across binary event-type indicators, the Wald-Wolfowitz runs test on
the daily series, restricted mean survival time (RMST) from the
Kaplan-Meier curve, and the Ljung-Box portmanteau test over the
lag-1..7 autocorrelations.

House determinism rules: all rank/count algebra exact int64 on level
tables (doubled midranks, cnt^3 tie terms); survival steps consume the
r6-rounded KM curve as exact e6 integers; z / Q / LB statistics are
one final fixed IEEE tree; windows only over value-domain, day, or
duration level tables.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


# --------------------------------------------- Wilcoxon signed-rank


@q(
    "wilcoxon_signed_rank",
    """WITH u AS (
         SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS BIGINT) AS d
         FROM events GROUP BY 1),
       nz AS (SELECT abs(d) AS a, CAST(d > 0 AS INT) AS pos
              FROM u WHERE d <> 0),
       lvl AS (SELECT a, CAST(count(*) AS BIGINT) AS cnt,
                      CAST(sum(pos) AS BIGINT) AS pcnt
               FROM nz GROUP BY 1),
       rk AS (SELECT a, cnt, pcnt,
                     CAST(2 * (sum(cnt) OVER (ORDER BY a ASC
                            ROWS UNBOUNDED PRECEDING) - cnt)
                          + cnt + 1 AS BIGINT) AS r2
              FROM lvl),
       s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                    CAST(sum(pcnt * r2) AS BIGINT) AS w2_plus,
                    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
             FROM rk)
       SELECT n, w2_plus,
              CAST(n * (n + 1) // 2 AS BIGINT) AS e_w2,
              CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS BIGINT) AS var12,
              round(CAST(w2_plus - n * (n + 1) // 2 AS DOUBLE)
                    / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS DOUBLE)
                           / CAST(12 AS DOUBLE)), 6) AS z,
              CAST(CASE WHEN abs(CAST(w2_plus - n * (n + 1) // 2 AS DOUBLE)
                    / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS DOUBLE)
                           / CAST(12 AS DOUBLE))) > CAST(1.96 AS DOUBLE)
                   THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM s""",
)
def _wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test (Wilcoxon 1945) on the paired
    per-user (purchases - clicks) count difference — the paired-sample
    companion to Mann-Whitney: are purchase and click volumes
    systematically different WITHIN users? Zero differences drop (the
    standard treatment); midranks of |d| are doubled integers over the
    |d| value level table (one bounded window), so W+, its null mean
    n(n+1)/2, and the tie-corrected variance
    12*Var(2W) = 2n(n+1)(2n+1) - sum(t^3-t) are ALL exact int64; z is
    the single final double. Fact-scale work is one user groupBy."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long"))
            - F.sum((F.col("event_type") == "click").cast("long"))
        )
        .cast("long")
        .alias("d")
    )
    nz = u.filter(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("a"), (F.col("d") > 0).cast("int").alias("pos")
    )
    lvl = nz.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pcnt"),
    )
    wa = Window.orderBy(F.col("a").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = lvl.select(
        "a",
        "cnt",
        "pcnt",
        (
            F.lit(2) * (F.sum("cnt").over(wa) - F.col("cnt"))
            + F.col("cnt")
            + F.lit(1)
        )
        .cast("long")
        .alias("r2"),
    )
    s = rk.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("pcnt") * F.col("r2")).cast("long").alias("w2_plus"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("ties"),
    )
    e_w2 = F.expr("cast(n * (n + 1) div 2 as long)")
    var12 = (
        F.lit(2) * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
        - F.col("ties")
    ).cast("long")
    z = (F.col("w2_plus") - e_w2).cast("double") / F.sqrt(
        var12.cast("double") / F.lit(12.0)
    )
    return s.select(
        "n",
        "w2_plus",
        e_w2.alias("e_w2"),
        var12.alias("var12"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(1.96)).cast("long").alias("reject_005"),
    )


# ------------------------------------------------- Cochran's Q


@q(
    "cochran_q_event_types",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
       ty AS (SELECT DISTINCT event_type FROM events),
       cnts AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
       gridn AS (SELECT u.user_id, ty.event_type,
                        CAST(coalesce(cnts.n, 0) AS BIGINT) AS n
                 FROM u CROSS JOIN ty
                 LEFT JOIN cnts ON cnts.user_id = u.user_id
                               AND cnts.event_type = ty.event_type),
       lvl AS (SELECT n, CAST(count(*) AS BIGINT) AS cnt
               FROM gridn GROUP BY 1),
       ncells AS (SELECT CAST(sum(cnt) AS BIGINT) AS nc FROM lvl),
       med AS (SELECT CAST(min(n) AS BIGINT) AS med
               FROM (SELECT n, CAST(sum(cnt) OVER (ORDER BY n ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                     FROM lvl) cw CROSS JOIN ncells
               WHERE cw.cum * 2 >= ncells.nc),
       grid AS (SELECT g.user_id, g.event_type,
                       CAST(g.n > med.med AS BIGINT) AS x
                FROM gridn g CROSS JOIN med),
       cj AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS c_j
              FROM grid GROUP BY 1),
       ri AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS r_i
              FROM grid GROUP BY 1),
       dims AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
       s AS (SELECT CAST(sum(c_j) AS BIGINT) AS t_tot,
                    CAST(sum(c_j * c_j) AS BIGINT) AS sum_c2
             FROM cj),
       sr AS (SELECT CAST(sum(r_i * r_i) AS BIGINT) AS sum_r2 FROM ri)
       SELECT cj.event_type, cj.c_j, dims.k,
              CAST(dims.k - 1 AS BIGINT) AS df,
              CASE WHEN dims.k * s.t_tot - sr.sum_r2 = 0 THEN NULL
                   ELSE round(CAST(dims.k - 1 AS DOUBLE)
                    * CAST(dims.k * s.sum_c2 - s.t_tot * s.t_tot AS DOUBLE)
                    / CAST(dims.k * s.t_tot - sr.sum_r2 AS DOUBLE), 6) END
                AS cochran_q
       FROM cj CROSS JOIN dims CROSS JOIN s CROSS JOIN sr
       ORDER BY cj.event_type""",
)
def _cochran_q_event_types(spark, sf_dir):
    """Cochran's Q test (Cochran 1950) for whether the k event types
    differ in per-user HEAVY-USE incidence — the binary indicator is
    "this user's count of type j exceeds the global median cell count"
    (exact lower median over the complete-grid count level table;
    plain reach>=1 is degenerate on this log where every user touches
    every type). The binary-treatment counterpart of the Friedman test
    on the same complete user x type grid: Q = (k-1)(k*sum(Cj^2) -
    T^2)/(kT - sum(Ri^2)), all sums exact int64, Q the single final
    double (NULL-guarded when the denominator degenerates), shipped
    beside each type's incidence count so the readout shows which
    type deviates."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    ty = ev.select("event_type").distinct()
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    gridn = (
        u.crossJoin(F.broadcast(ty))
        .join(cnts, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        # consumed by the median level table AND the indicator grid
        # (which itself feeds cj + ri) — materialize the |users|x|types|
        # relation once instead of re-running the three events shuffles
        # per reference
        .localCheckpoint(eager=True)
    )
    lvl = gridn.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ncells = lvl.agg(F.sum("cnt").cast("long").alias("nc"))
    wv = Window.orderBy(F.col("n").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lvl.select("n", F.sum("cnt").over(wv).cast("long").alias("cum"))
    med = (
        cw.crossJoin(F.broadcast(ncells))
        .filter(F.col("cum") * 2 >= F.col("nc"))
        .agg(F.min("n").cast("long").alias("med"))
    )
    grid = gridn.crossJoin(F.broadcast(med)).select(
        "user_id",
        "event_type",
        (F.col("n") > F.col("med")).cast("long").alias("x"),
    )
    cj = grid.groupBy("event_type").agg(F.sum("x").cast("long").alias("c_j"))
    ri = grid.groupBy("user_id").agg(F.sum("x").cast("long").alias("r_i"))
    dims = ty.agg(F.count(F.lit(1)).cast("long").alias("k"))
    s = cj.agg(
        F.sum("c_j").cast("long").alias("t_tot"),
        F.sum(F.col("c_j") * F.col("c_j")).cast("long").alias("sum_c2"),
    )
    sr = ri.agg(F.sum(F.col("r_i") * F.col("r_i")).cast("long").alias("sum_r2"))
    out = (
        cj.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(sr))
    )
    den = F.col("k") * F.col("t_tot") - F.col("sum_r2")
    return out.select(
        "event_type",
        "c_j",
        "k",
        (F.col("k") - 1).cast("long").alias("df"),
        F.when(
            den != 0,
            F.round(
                (F.col("k") - 1).cast("double")
                * (F.col("k") * F.col("sum_c2") - F.col("t_tot") * F.col("t_tot"))
                .cast("double")
                / den.cast("double"),
                6,
            ),
        ).alias("cochran_q"),
    ).orderBy("event_type")


# ------------------------------------------------ runs test (daily)


@q(
    "runs_test_daily",
    f"""WITH days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v
             FROM days d LEFT JOIN pc USING (t)),
       lvl AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1),
       nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM lvl),
       cw AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM lvl),
       med AS (SELECT CAST(min(v) AS BIGINT) AS med
               FROM cw CROSS JOIN nn WHERE cw.cum * 2 >= nn.n),
       sg AS (SELECT s.t, CAST(s.v > med.med AS INT) AS sign
              FROM s CROSS JOIN med WHERE s.v <> med.med),
       r AS (SELECT sign,
                    CASE WHEN lag(sign) OVER (ORDER BY t ASC) IS NULL THEN 1
                         WHEN sign <> lag(sign) OVER (ORDER BY t ASC) THEN 1
                         ELSE 0 END AS brk
             FROM sg),
       agg AS (SELECT CAST(sum(sign) AS BIGINT) AS n1,
                      CAST(sum(1 - sign) AS BIGINT) AS n2,
                      CAST(sum(brk) AS BIGINT) AS runs
               FROM r)
       SELECT n1, n2, runs,
              round(CAST(runs AS DOUBLE)
                    - (CAST(1 AS DOUBLE)
                       + CAST(2 * n1 * n2 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE)), 6) AS excess_runs,
              round((CAST(runs AS DOUBLE)
                     - (CAST(1 AS DOUBLE)
                        + CAST(2 * n1 * n2 AS DOUBLE)
                          / CAST(n1 + n2 AS DOUBLE)))
                    / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                           * CAST(2 * n1 * n2 - n1 - n2 AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 - 1 AS DOUBLE))), 6) AS z,
              CAST(CASE WHEN abs((CAST(runs AS DOUBLE)
                     - (CAST(1 AS DOUBLE)
                        + CAST(2 * n1 * n2 AS DOUBLE)
                          / CAST(n1 + n2 AS DOUBLE)))
                    / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                           * CAST(2 * n1 * n2 - n1 - n2 AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 - 1 AS DOUBLE))))
                    > CAST(1.96 AS DOUBLE)
                   THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM agg""",
)
def _runs_test_daily(spark, sf_dir):
    """Wald-Wolfowitz runs test (1940) for serial dependence in the
    daily purchase series: days above/below the exact median (median
    days drop, the standard treatment) form a binary sequence; too few
    runs = positive autocorrelation (streaks), too many = oscillation.
    The median comes from the value level table by cumulative weight,
    run breaks from one lag over the day relation (time-bounded), and
    n1/n2/R are exact int64 feeding the closed-form z. Complements the
    Ljung-Box portmanteau with a distribution-free check."""
    s = _daily_purchases(spark, sf_dir)
    lvl = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    nn = lvl.agg(F.sum("cnt").cast("long").alias("n"))
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lvl.select("v", F.sum("cnt").over(wv).cast("long").alias("cum"))
    med = (
        cw.crossJoin(F.broadcast(nn))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("v").cast("long").alias("med"))
    )
    sg = (
        s.crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("med"))
        .select("t", (F.col("v") > F.col("med")).cast("int").alias("sign"))
    )
    wt = Window.orderBy(F.col("t").asc())
    r = sg.select(
        "sign",
        F.when(F.lag("sign").over(wt).isNull(), F.lit(1))
        .when(F.col("sign") != F.lag("sign").over(wt), F.lit(1))
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    agg = r.agg(
        F.sum("sign").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("sign")).cast("long").alias("n2"),
        F.sum("brk").cast("long").alias("runs"),
    )
    nd = (F.col("n1") + F.col("n2")).cast("double")
    two = (F.lit(2) * F.col("n1") * F.col("n2")).cast("double")
    e_r = F.lit(1.0) + two / nd
    v_r = (
        two
        * (F.lit(2) * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2")).cast(
            "double"
        )
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = (F.col("runs").cast("double") - e_r) / F.sqrt(v_r)
    return agg.select(
        "n1",
        "n2",
        "runs",
        F.round(F.col("runs").cast("double") - e_r, 6).alias("excess_runs"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(1.96)).cast("long").alias("reject_005"),
    )


# ---------------------------------------------------- RMST (survival)


@q(
    "rmst_churn",
    f"""WITH gm AS (SELECT max(epoch_us(ts)) AS mx FROM events),
       u AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
             FROM events GROUP BY 1),
       d AS (SELECT (l - f) // {_HOUR_US} AS t,
                    CASE WHEN l > (SELECT mx FROM gm) - {12 * _HOUR_US}
                         THEN 0 ELSE 1 END AS ev
             FROM u),
       tau AS (SELECT CAST(max(t) AS BIGINT) AS tau FROM d),
       lvl AS (SELECT t, CAST(count(*) AS BIGINT) AS n_at_t,
                      CAST(sum(ev) AS BIGINT) AS d_at_t
               FROM d GROUP BY 1),
       tot AS (SELECT CAST(sum(n_at_t) AS BIGINT) AS n_total FROM lvl),
       lv2 AS (SELECT t, n_at_t, d_at_t,
                      CAST((SELECT n_total FROM tot)
                           - coalesce(sum(n_at_t) OVER (ORDER BY t ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS n_risk
               FROM lvl),
       lv3 AS (SELECT t, d_at_t, n_risk,
                      CASE WHEN d_at_t >= n_risk THEN CAST(-1e30 AS DOUBLE)
                           WHEN d_at_t > 0
                           THEN ln(CAST(1 AS DOUBLE)
                                   - CAST(d_at_t AS DOUBLE)
                                     / CAST(n_risk AS DOUBLE))
                           ELSE CAST(0 AS DOUBLE) END AS ln_term
               FROM lv2),
       s AS (SELECT t,
                    CAST(floor(round(exp(sum(ln_term) OVER (ORDER BY t ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                      * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS s_e6
             FROM lv3 WHERE d_at_t > 0),
       ev2 AS (SELECT t, s_e6,
                      CAST(coalesce(lead(t) OVER (ORDER BY t ASC),
                                    (SELECT tau FROM tau)) - t AS BIGINT)
                        AS gap
               FROM s),
       first_t AS (SELECT CAST(min(t) AS BIGINT) AS t1 FROM ev2),
       acc AS (SELECT CAST(sum(s_e6 * gap) AS BIGINT) AS area_e6 FROM ev2)
       SELECT tau.tau AS tau_hours, tot.n_total,
              CAST(first_t.t1 * 1000000 + acc.area_e6 AS BIGINT) AS rmst_e6,
              round(CAST(first_t.t1 * 1000000 + acc.area_e6 AS DOUBLE)
                    / CAST(1000000 AS DOUBLE), 4) AS rmst_hours
       FROM tau CROSS JOIN tot CROSS JOIN first_t CROSS JOIN acc""",
)
def _rmst_churn(spark, sf_dir):
    """Restricted mean survival time (RMST) to the horizon tau = max
    observed lifetime — the area under the Kaplan-Meier curve, THE
    clinically/product-recommended summary when hazards are not
    proportional (mean hours a user stays active, censoring-adjusted).
    Consumes the same r6-rounded KM survival levels as
    kaplan_meier_churn, re-quantized to exact e6 integers, and folds
    area = S(t_i)*(t_{i+1}-t_i) + the S=1 head segment as one exact
    int64 sum over the duration level table. One lead window over the
    bounded hour domain; fact-scale work is the per-user min/max."""
    from redshells_spark.operators.survival import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    us = event_us(ev).alias("us")
    u = (
        ev.select("user_id", us)
        .groupBy("user_id")
        .agg(F.min("us").alias("f"), F.max("us").alias("l"))
        # 2 ints/user, consumed by the global-max probe and the
        # duration projection — unpinned, the events scan ran per
        # consumer (16 scans at the round-8 plan audit)
        .localCheckpoint(eager=True)
    )
    gm = u.agg(F.max("l").alias("mx"))
    d = u.crossJoin(F.broadcast(gm)).select(
        F.expr(f"(l - f) div {_HOUR_US}").cast("long").alias("t"),
        F.when(F.col("l") > F.col("mx") - F.lit(12 * _HOUR_US), 0)
        .otherwise(1)
        .alias("ev"),
    )
    tau = d.agg(F.max("t").cast("long").alias("tau"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    km = kaplan_meier(d, "t", "ev")  # (t, n_risk, n_events, survival r6)
    s = km.select(
        "t",
        F.floor(F.col("survival") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("s_e6"),
    )
    wl = Window.orderBy(F.col("t").asc())
    ev2 = (
        s.crossJoin(F.broadcast(tau))
        .select(
            "t",
            "s_e6",
            (F.coalesce(F.lead("t").over(wl), F.col("tau")) - F.col("t"))
            .cast("long")
            .alias("gap"),
        )
        # KM-level bounded; the head-segment and area probes both read it
        .localCheckpoint(eager=True)
    )
    first_t = ev2.agg(F.min("t").cast("long").alias("t1"))
    acc = ev2.agg(F.sum(F.col("s_e6") * F.col("gap")).cast("long").alias("area_e6"))
    out = (
        tau.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(first_t))
        .crossJoin(F.broadcast(acc))
    )
    rmst_e6 = (F.col("t1") * F.lit(1000000) + F.col("area_e6")).cast("long")
    return out.select(
        F.col("tau").alias("tau_hours"),
        "n_total",
        rmst_e6.alias("rmst_e6"),
        F.round(rmst_e6.cast("double") / F.lit(1000000.0), 4).alias("rmst_hours"),
    )


# ------------------------------------------------------- Ljung-Box


@q(
    "ljung_box_daily",
    f"""WITH r AS (SELECT min(epoch_us(ts)) // {_DAY_US} AS mn,
                     max(epoch_us(ts)) // {_DAY_US} AS mx FROM events),
       days AS (SELECT unnest(range(r.mn, r.mx + 1)) AS day FROM r),
       e AS (SELECT epoch_us(ts) // {_DAY_US} AS day,
                    CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1),
       c AS (SELECT d.day, CAST(coalesce(e.n, 0) AS BIGINT) AS n
             FROM days d LEFT JOIN e USING (day)),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM c),
       lags AS (SELECT unnest(range(1, 8)) AS lag),
       p AS (SELECT l.lag,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(sum(a.n) AS BIGINT) AS sa,
                    CAST(sum(b.n) AS BIGINT) AS sb,
                    CAST(sum(a.n * b.n) AS BIGINT) AS sab,
                    CAST(sum(a.n * a.n) AS BIGINT) AS saa,
                    CAST(sum(b.n * b.n) AS BIGINT) AS sbb
             FROM c a CROSS JOIN lags l JOIN c b ON b.day = a.day + l.lag
             GROUP BY 1),
       rr AS (SELECT lag,
                     CAST(floor((CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                               - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                              / sqrt((CAST(n_pairs AS DOUBLE)
                                      * CAST(saa AS DOUBLE)
                                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                                     * (CAST(n_pairs AS DOUBLE)
                                        * CAST(sbb AS DOUBLE)
                                        - CAST(sb AS DOUBLE)
                                          * CAST(sb AS DOUBLE)))
                              * CAST(1000000 AS DOUBLE)
                              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS r_e6
              FROM p),
       terms AS (SELECT rr.lag,
                        CAST(rr.r_e6 * rr.r_e6 // (nn.nd - rr.lag) AS BIGINT)
                          AS term
                 FROM rr CROSS JOIN nn),
       s AS (SELECT CAST(sum(term) AS BIGINT) AS sum_terms FROM terms)
       SELECT nn.nd AS n_days, s.sum_terms, CAST(7 AS BIGINT) AS df,
              round(CAST(nn.nd AS DOUBLE) * CAST(nn.nd + 2 AS DOUBLE)
                    * CAST(s.sum_terms AS DOUBLE)
                    / CAST(1000000000000 AS DOUBLE), 4) AS lb_stat,
              CAST(CASE WHEN CAST(nn.nd AS DOUBLE) * CAST(nn.nd + 2 AS DOUBLE)
                             * CAST(s.sum_terms AS DOUBLE)
                             / CAST(1000000000000 AS DOUBLE)
                             > CAST(14.0671 AS DOUBLE)
                        THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM nn CROSS JOIN s""",
)
def _ljung_box_daily(spark, sf_dir):
    """Ljung-Box portmanteau test (1978) over the lag-1..7 daily
    event-count autocorrelations — "is this series white noise?", the
    gate a forecasting pipeline runs before trusting residuals. Each
    lag's correlation is the same moment-sum Pearson tree
    autocorrelation_lags ships, e6-quantized; per-lag terms
    r^2/(n-k) are exact integer divisions and LB = n(n+2)*sum is the
    single final double against the chi2(7) 5% critical value. The
    lag pair join is 7 shifted self-joins of the bounded day relation."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("us", event_us(ev, "ts"))
    r = ev.agg(
        F.expr(f"min(us) div {_DAY_US}").cast("long").alias("mn"),
        F.expr(f"max(us) div {_DAY_US}").cast("long").alias("mx"),
    )
    days = r.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day")
    )
    e = ev.groupBy(F.expr(f"us div {_DAY_US}").cast("long").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    c = days.join(e, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    ).localCheckpoint(eager=True)  # day-level bounded; the count probe
    # and both shifted self-join sides consume it (6 scans unpinned)
    nn = c.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    a = c.select(F.col("day").alias("da"), F.col("n").alias("na"))
    b = c.select(F.col("day").alias("db"), F.col("n").alias("nb"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("na").cast("long").alias("sa"),
            F.sum("nb").cast("long").alias("sb"),
            F.sum(F.col("na") * F.col("nb")).cast("long").alias("sab"),
            F.sum(F.col("na") * F.col("na")).cast("long").alias("saa"),
            F.sum(F.col("nb") * F.col("nb")).cast("long").alias("sbb"),
        )
    )
    num = (
        F.col("n_pairs").cast("double") * F.col("sab").cast("double")
        - F.col("sa").cast("double") * F.col("sb").cast("double")
    )
    den = F.sqrt(
        (
            F.col("n_pairs").cast("double") * F.col("saa").cast("double")
            - F.col("sa").cast("double") * F.col("sa").cast("double")
        )
        * (
            F.col("n_pairs").cast("double") * F.col("sbb").cast("double")
            - F.col("sb").cast("double") * F.col("sb").cast("double")
        )
    )
    rr = p.select(
        "lag",
        F.floor(num / den * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("r_e6"),
    )
    terms = rr.crossJoin(F.broadcast(nn)).select(
        F.expr("cast(r_e6 * r_e6 div (nd - lag) as long)").alias("term")
    )
    s = terms.agg(F.sum("term").cast("long").alias("sum_terms"))
    lb = (
        F.col("nd").cast("double")
        * (F.col("nd") + 2).cast("double")
        * F.col("sum_terms").cast("double")
        / F.lit(1.0e12)
    )
    return nn.crossJoin(F.broadcast(s)).select(
        F.col("nd").alias("n_days"),
        "sum_terms",
        F.lit(7).cast("long").alias("df"),
        F.round(lb, 4).alias("lb_stat"),
        (lb > F.lit(14.0671)).cast("long").alias("reject_005"),
    )
