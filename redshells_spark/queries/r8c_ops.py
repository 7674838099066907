"""Round-8 batch 3: classical-test, concentration, changepoint, and
intermittent-demand completions — Kruskal-Wallis (the k-sample rank
test completing the Mann-Whitney/Wilcoxon/Friedman family), the
Herfindahl-Hirschman concentration index per market, the Pettitt
changepoint test on the daily series, OHLC daily bars (the warehouse
first/last/min/max rollup), and Croston's method for intermittent
demand (completing the SES/Holt/Theta forecasting family).

House determinism rules: rank algebra exact int64 on value level
tables (doubled midranks); shares and mean ranks integer-floored at a
documented scale on BOTH engines; recurrences rounded half-up to 10
decimals per step (the holt idiom); final test statistics one fixed
IEEE tree over exact ints.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v
             FROM days d LEFT JOIN pc USING (t))"""


# --------------------------------------------------- Kruskal-Wallis


@q(
    "kruskal_wallis_order_totals",
    """WITH b AS (
         SELECT CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS v,
                o_orderpriority AS g
         FROM orders),
       glvl AS (SELECT v, g, CAST(count(*) AS BIGINT) AS cg
                FROM b GROUP BY 1, 2),
       lvl AS (SELECT v, CAST(sum(cg) AS BIGINT) AS t FROM glvl GROUP BY 1),
       rk AS (SELECT v, t,
                     CAST(2 * coalesce(sum(t) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          + t + 1 AS BIGINT) AS r2
              FROM lvl),
       grp AS (SELECT g.g, CAST(sum(g.cg) AS BIGINT) AS ng,
                      CAST(sum(g.cg * r.r2) AS BIGINT) AS r2sum
               FROM glvl g JOIN rk r ON r.v = g.v
               GROUP BY 1),
       grp2 AS (SELECT ng, r2sum,
                       CAST(sum(ng) OVER () AS BIGINT) AS n,
                       CAST(r2sum // ng - sum(ng) OVER () - 1 AS BIGINT) AS dev2
                FROM grp),
       tot AS (SELECT n, CAST(sum(ng * dev2 * dev2) AS BIGINT) AS s2
               FROM grp2 GROUP BY n),
       ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_t FROM lvl),
       h AS (SELECT n,
                    CAST(3 AS DOUBLE) * CAST(s2 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) AS h_raw,
                    CAST(1 AS DOUBLE)
                      - CAST(tie_t AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS c
             FROM tot CROSS JOIN ties)
       SELECT n, round(h_raw, 6) AS h,
              round(h_raw / c, 6) AS h_tie_corrected,
              CAST(CASE WHEN h_raw / c > CAST(9.487729036781154 AS DOUBLE)
                   THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM h""",
)
def _kruskal_wallis_order_totals(spark, sf_dir):
    """Kruskal-Wallis H test (1952) of order-total distributions across
    the five order priorities — the k-sample completion of the rank
    family (Mann-Whitney = 2 samples, Friedman = blocked, this =
    independent k groups). Midranks over the cent-value level table are
    doubled integers (the wilcoxon idiom); the group term uses the
    FLOORED doubled mean rank m2_g = r2sum div ng — both engines floor
    identically, so H is engine-exact under the documented convention
    (the same floor convention as every e6 share in the repo; the
    deviation from the textbook mean rank is < 1 rank unit and the
    doubled deviation (m2_g − (N+1)) keeps n_g·dev² inside int64 to
    factor 100). H = 3·Σ n_g dev2² / (N(N+1)) since the doubled scale
    contributes 4 and 12/4 = 3; tie correction C = 1 − Σ(t³−t)/(N³−N);
    reject at the chi²₄ 5% point. Fact-scale work is one (cent,
    priority) groupBy; every window is over the value level table."""
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        money_units(F.col("o_totalprice")).alias("v"),
        F.col("o_orderpriority").alias("g"),
    )
    glvl = b.groupBy("v", "g").agg(F.count(F.lit(1)).cast("long").alias("cg"))
    lvl = glvl.groupBy("v").agg(F.sum("cg").cast("long").alias("t"))
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = lvl.select(
        "v",
        "t",
        (F.lit(2) * F.coalesce(F.sum("t").over(wv), F.lit(0)) + F.col("t") + 1)
        .cast("long")
        .alias("r2"),
    )
    grp = (
        glvl.join(rk, "v")
        .groupBy("g")
        .agg(
            F.sum("cg").cast("long").alias("ng"),
            F.sum(F.col("cg") * F.col("r2")).cast("long").alias("r2sum"),
        )
    )
    # dev2 = floored doubled mean rank − doubled overall mean (N+1);
    # the group relation is 5 rows, so the global windows are bounded
    grp2 = grp.select(
        "ng",
        F.sum("ng").over(Window.partitionBy()).cast("long").alias("n"),
        F.expr("cast(r2sum div ng as long)").alias("m2"),
    ).select(
        "ng", "n", (F.col("m2") - F.col("n") - 1).cast("long").alias("dev2")
    )
    tot = grp2.groupBy("n").agg(
        F.sum(F.col("ng") * F.col("dev2") * F.col("dev2"))
        .cast("long")
        .alias("s2")
    )
    ties = lvl.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_t")
    )
    h = tot.crossJoin(ties).select(
        "n",
        (
            F.lit(3.0)
            * F.col("s2").cast("double")
            / (F.col("n").cast("double") * (F.col("n") + 1).cast("double"))
        ).alias("h_raw"),
        (
            F.lit(1.0)
            - F.col("tie_t").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("n").cast("double")
                * F.col("n").cast("double")
                - F.col("n").cast("double")
            )
        ).alias("c"),
    )
    return h.select(
        "n",
        F.round(F.col("h_raw"), 6).alias("h"),
        F.round(F.col("h_raw") / F.col("c"), 6).alias("h_tie_corrected"),
        (
            (F.col("h_raw") / F.col("c") > F.lit(9.487729036781154)).cast(
                "long"
            )
        ).alias("reject_005"),
    )


# ------------------------------------------- Herfindahl concentration


@q(
    "herfindahl_concentration",
    """WITH r AS (
         SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
                CAST(sum(CAST(floor(l.l_extendedprice * 100
                                    + CAST(0.5 AS DOUBLE)) AS BIGINT)
                         * (100 - CAST(floor(l.l_discount * 100
                                    + CAST(0.5 AS DOUBLE)) AS BIGINT)))
                     AS BIGINT) AS rev_u
         FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
         GROUP BY 1, 2),
       nat AS (SELECT nationkey, CAST(sum(rev_u) AS BIGINT) AS tot_u,
                      CAST(count(*) AS BIGINT) AS n_suppliers
               FROM r GROUP BY 1),
       sh AS (SELECT r.nationkey,
                     CAST(r.rev_u * 1000000 // nat.tot_u AS BIGINT) AS share_e6
              FROM r JOIN nat USING (nationkey))
       SELECT s.nationkey,
              n.n_suppliers,
              CAST(sum(s.share_e6 * s.share_e6) // 1000000 AS BIGINT)
                AS hhi_e6,
              CAST(max(s.share_e6) AS BIGINT) AS top_share_e6
       FROM sh s JOIN nat n USING (nationkey)
       GROUP BY 1, 2
       ORDER BY 1""",
)
def _herfindahl_concentration(spark, sf_dir):
    """Herfindahl-Hirschman concentration index of supplier revenue
    within each supplier nation — "how concentrated is each market",
    the antitrust-standard readout (HHI > 0.25 = highly concentrated)
    beside the theil_atkinson inequality family. Revenue is the exact
    e4-dollar integer unit sum (the _REV_SUM idiom); shares are e6
    integer floors of that exact ratio (both engines floor
    identically), and HHI_e6 = Σ share_e6² div 1e6 is pure int64
    (share² ≤ 1e12, supplier count bounded). One fact-scale groupBy on
    (supplier); everything after is supplier-level."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(
                money_units(F.col("l_extendedprice"))
                * (F.lit(100) - money_units(F.col("l_discount")))
            )
            .cast("long")
            .alias("rev_u")
        )
        # supplier-level rows; the nation totals and the share
        # projection both consume it — unpinned, the fact groupBy ran
        # twice (6 scans at the r8 audit)
        .localCheckpoint(eager=True)
    )
    nat = r.groupBy("nationkey").agg(
        F.sum("rev_u").cast("long").alias("tot_u"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    sh = r.join(nat, "nationkey").select(
        "nationkey",
        F.expr("cast(rev_u * 1000000 div tot_u as long)").alias("share_e6"),
    )
    return (
        sh.groupBy("nationkey")
        .agg(
            F.expr(
                "cast(sum(share_e6 * share_e6) div 1000000 as long)"
            ).alias("hhi_e6"),
            F.max("share_e6").cast("long").alias("top_share_e6"),
        )
        .join(nat.select("nationkey", "n_suppliers"), "nationkey")
        .select("nationkey", "n_suppliers", "hhi_e6", "top_share_e6")
        .orderBy("nationkey")
    )


# --------------------------------------------- Pettitt changepoint


@q(
    "pettitt_changepoint_daily",
    f"""WITH {_DAILY_SQL},
       lvl AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1),
       rk AS (SELECT v,
                     CAST(2 * coalesce(sum(cnt) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          + cnt + 1 AS BIGINT) AS r2
              FROM lvl),
       dr AS (SELECT s.t, r.r2,
                     CAST(row_number() OVER (ORDER BY s.t ASC) AS BIGINT) AS i,
                     CAST(count(*) OVER () AS BIGINT) AS tn
              FROM s JOIN rk r ON r.v = s.v),
       u AS (SELECT t, i, tn,
                    CAST(sum(r2) OVER (ORDER BY i ASC
                       ROWS UNBOUNDED PRECEDING) - i * (tn + 1) AS BIGINT)
                      AS u2
             FROM dr),
       k AS (SELECT t, u2, tn,
                    row_number() OVER (ORDER BY abs(u2) DESC, t ASC) AS rn
             FROM u WHERE i < tn)
       SELECT t AS t_star, CAST(abs(u2) AS BIGINT) AS k_stat,
              round(CAST(2 AS DOUBLE) * exp(
                 CAST(-6 AS DOUBLE) * CAST(u2 AS DOUBLE) * CAST(u2 AS DOUBLE)
                 / (CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE)
                    + CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE))), 6) AS p_approx,
              CAST(CASE WHEN CAST(2 AS DOUBLE) * exp(
                 CAST(-6 AS DOUBLE) * CAST(u2 AS DOUBLE) * CAST(u2 AS DOUBLE)
                 / (CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE)
                    + CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE)))
                 < CAST(0.05 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)
                AS reject_005
       FROM k WHERE rn = 1""",
)
def _pettitt_changepoint_daily(spark, sf_dir):
    """Pettitt changepoint test (1979) on the dense daily purchase
    series — the nonparametric "did the level shift, and when"
    companion to page_hinkley (running-mean monitor) and
    mean_shift_changepoint (exact binary-split): U_t = 2·Σ_{i≤t}R_i −
    t(T+1) over the midranks of the full series, K = max|U_t|, with
    the standard p ≈ 2exp(−6K²/(T³+T²)). Doubled midranks over the
    count level table make every U_t exact int64 directly: Σ_{i≤t}r2_i
    = 2·ΣR_i, so u2 = Σr2 − t(T+1) IS the textbook U_t (integer even
    when midranks are half-integers). Argmax tie-breaks on the
    earliest day in both engines. All windows are over the day-level
    relation (time-bounded)."""
    s = _daily_purchases(spark, sf_dir)
    lvl = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = lvl.select(
        "v",
        (F.lit(2) * F.coalesce(F.sum("cnt").over(wv), F.lit(0)) + F.col("cnt") + 1)
        .cast("long")
        .alias("r2"),
    )
    wt = Window.orderBy(F.col("t").asc())
    dr = (
        s.join(rk, "v")
        .select(
            "t",
            "r2",
            F.row_number().over(wt).cast("long").alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("tn"),
        )
    )
    wu = Window.orderBy(F.col("i").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    u = dr.select(
        "t",
        "i",
        "tn",
        (F.sum("r2").over(wu) - F.col("i") * (F.col("tn") + 1))
        .cast("long")
        .alias("u2"),
    )
    wk = Window.orderBy(F.abs(F.col("u2")).desc(), F.col("t").asc())
    k = (
        u.filter(F.col("i") < F.col("tn"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
    )
    p = F.lit(2.0) * F.exp(
        F.lit(-6.0)
        * F.col("u2").cast("double")
        * F.col("u2").cast("double")
        / (
            F.col("tn").cast("double")
            * F.col("tn").cast("double")
            * F.col("tn").cast("double")
            + F.col("tn").cast("double") * F.col("tn").cast("double")
        )
    )
    return k.select(
        F.col("t").alias("t_star"),
        F.abs(F.col("u2")).cast("long").alias("k_stat"),
        F.round(p, 6).alias("p_approx"),
        (p < F.lit(0.05)).cast("long").alias("reject_005"),
    )


# ----------------------------------------------------- OHLC daily bars


@q(
    "ohlc_daily_value",
    f"""WITH p AS (
         SELECT epoch_us(ts) // {_DAY_US} AS t, event_id,
                CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c,
                epoch_us(ts) AS us
         FROM events WHERE event_type = 'purchase'),
       o AS (SELECT t, c,
                    row_number() OVER (PARTITION BY t
                       ORDER BY us ASC, event_id ASC) AS rn_a,
                    row_number() OVER (PARTITION BY t
                       ORDER BY us DESC, event_id DESC) AS rn_z
             FROM p)
       SELECT t,
              CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_c,
              CAST(max(c) AS BIGINT) AS high_c,
              CAST(min(c) AS BIGINT) AS low_c,
              CAST(max(CASE WHEN rn_z = 1 THEN c END) AS BIGINT) AS close_c,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(c) AS BIGINT) AS total_c
       FROM o
       GROUP BY 1 ORDER BY 1""",
)
def _ohlc_daily_value(spark, sf_dir):
    """Daily OHLC bars over purchase values — the warehouse
    first/last/min/max rollup (open = value of the first event by
    (ts, event_id), close = last; the time-series-table staple).
    Values are exact cents; open/close come from per-day row_number
    windows (partitioned by day — per-partition work is a day's
    events, never global), folded through one grouped aggregate with
    flag-gated max. Output is day-bounded."""
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("us", event_us(ev, "ts"))
        .select(
            F.expr(f"us div {_DAY_US}").cast("long").alias("t"),
            "event_id",
            money_units(F.col("value")).alias("c"),
            "us",
        )
    )
    wa = Window.partitionBy("t").orderBy(F.col("us").asc(), F.col("event_id").asc())
    wz = Window.partitionBy("t").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    o = p.select(
        "t",
        "c",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    return (
        o.groupBy("t")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("c"))).cast("long").alias("open_c"),
            F.max("c").cast("long").alias("high_c"),
            F.min("c").cast("long").alias("low_c"),
            F.max(F.when(F.col("rn_z") == 1, F.col("c"))).cast("long").alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("total_c"),
        )
        .orderBy("t")
    )


# ---------------------------------------------- Croston intermittent


@q(
    "croston_intermittent",
    f"""WITH RECURSIVE days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events
              WHERE event_type = 'purchase' AND user_id % 97 = 0
              GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v,
                    CAST(row_number() OVER (ORDER BY d.t ASC) AS BIGINT) AS i
             FROM days d LEFT JOIN pc ON pc.t = d.t),
       dem AS (SELECT t, v, i,
                      CAST(row_number() OVER (ORDER BY i ASC) AS BIGINT) AS k,
                      CAST(i - coalesce(lag(i) OVER (ORDER BY i ASC), 0)
                           AS BIGINT) AS gap
               FROM s WHERE v > 0),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dem),
       it(k, z, p) AS (
         SELECT CAST(1 AS BIGINT), CAST(d.v AS DOUBLE), CAST(d.gap AS DOUBLE)
         FROM dem d WHERE d.k = 1
         UNION ALL
         SELECT it.k + 1,
                round(CAST(0.2 AS DOUBLE) * CAST(x.v AS DOUBLE)
                      + CAST(0.8 AS DOUBLE) * it.z, 10),
                round(CAST(0.2 AS DOUBLE) * CAST(x.gap AS DOUBLE)
                      + CAST(0.8 AS DOUBLE) * it.p, 10)
         FROM it JOIN dem x ON x.k = it.k + 1
         CROSS JOIN nn WHERE it.k + 1 <= nn.n)
       SELECT d.k, d.t, d.v, d.gap, it.z AS z_level, it.p AS p_level,
              round(it.z / it.p, 10) AS demand_rate
       FROM it JOIN dem d ON d.k = it.k
       ORDER BY d.k""",
)
def _croston_intermittent(spark, sf_dir):
    """Croston's method (1972) for intermittent demand over the sparse
    daily purchase series of the user_id % 97 cohort (a fixed hash
    slice — deterministically sparse at any corpus scale): SES
    (alpha=0.2) runs separately on the non-zero demand SIZES and on
    the INTERVALS between demand days; the demand-rate forecast is
    z/p. This is the standard spare-parts/slow-mover baseline the
    SES/Holt/Theta family misses (plain SES biases toward zero on
    intermittent series). Initialization: z₁ = first demand size,
    p₁ = index of the first demand day (gap from series start).
    Recurrences rounded half-up to 10 decimals per step on BOTH
    engines (the holt idiom); the sequential solve runs on the
    collected demand-day table (time-bounded). Fact-scale work is one
    filtered daily groupBy."""
    from redshells_spark.operators.markov import _round_half_up as rhu

    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("us", event_us(ev, "ts"))
    # day spine from the shared cached daily series (same distinct-day
    # set); only the cohort-filtered counts need their own scan
    days = _daily_purchases(spark, sf_dir).select("t")
    pc = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0)
        )
        .groupBy(F.expr(f"us div {_DAY_US}").cast("long").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    s = (
        days.join(pc, "t", "left")
        .select("t", F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("v"))
        .orderBy("t")
        .collect()
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("t", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("gap", T.LongType()),
            T.StructField("z_level", T.DoubleType()),
            T.StructField("p_level", T.DoubleType()),
            T.StructField("demand_rate", T.DoubleType()),
        ]
    )
    dem = [(i + 1, int(r["t"]), int(r["v"])) for i, r in enumerate(s) if r["v"] > 0]
    if not dem:
        return spark.createDataFrame([], schema)
    rows, z, p, prev_i = [], None, None, 0
    for k, (i, t, v) in enumerate(dem, start=1):
        gap = i - prev_i
        prev_i = i
        if k == 1:
            z, p = float(v), float(gap)
        else:
            z = rhu(0.2 * float(v) + 0.8 * z, 10)
            p = rhu(0.2 * float(gap) + 0.8 * p, 10)
        rows.append(
            Row(
                k=k,
                t=t,
                v=v,
                gap=gap,
                z_level=z,
                p_level=p,
                demand_rate=rhu(z / p, 10),
            )
        )
    return spark.createDataFrame(rows, schema).orderBy("k")
