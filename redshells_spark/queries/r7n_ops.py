"""Round-7 batch 14: distributional-summary completion — the
generalized-mean family (arithmetic / geometric / harmonic + CV) per
segment, the Pareto revenue-share curve (what share of revenue the top
x% of customers carry), and a lognormal method-of-moments fit of
customer spend (the body model that complements the GPD tail fit).

House rules: ln terms e9-quantized per row-group before summation,
reciprocals e12-quantized; share thresholds by exact cumweight over
the per-customer revenue level table; every statistic a ratio of
exact int64 sums with one final IEEE tree.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403


# --------------------------------------------- generalized means


@q(
    "generalized_means_by_segment",
    """WITH j AS (
         SELECT c.c_mktsegment AS segment,
                CAST(floor(o.o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) // 100 AS v
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       t AS (SELECT segment,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(v) AS BIGINT) AS s,
                    CAST(sum(v * v) AS BIGINT) AS ss,
                    CAST(sum(CAST(floor(ln(CAST(v AS DOUBLE))
                                        * 1000000000
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sln_e9,
                    CAST(sum(CAST(floor(CAST(1000000000000 AS DOUBLE)
                                        / CAST(v AS DOUBLE)
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sinv_e12
             FROM j GROUP BY 1)
       SELECT segment, n,
              round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_arith,
              round(exp(CAST(sln_e9 AS DOUBLE) / CAST(n AS DOUBLE)
                        / CAST(1000000000 AS DOUBLE)), 4) AS mean_geo,
              round(CAST(n AS DOUBLE)
                    / (CAST(sinv_e12 AS DOUBLE)
                       / CAST(1000000000000 AS DOUBLE)), 4) AS mean_harm,
              round(sqrt((CAST(ss AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         / CAST(n - 1 AS DOUBLE))
                    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv
       FROM t ORDER BY segment""",
)
def _generalized_means_by_segment(spark, sf_dir):
    """The generalized-mean family per market segment: arithmetic,
    geometric (exp of the mean e9-quantized log), harmonic (reciprocal
    of the mean e12-quantized reciprocal), and the coefficient of
    variation — the AM >= GM >= HM ladder whose gaps measure spend
    dispersion (pinned in tests), with HM the correct average for
    rate-like quantities and GM for growth-like ones. All sums exact
    int64 in dollars; one map-combined groupBy, no windows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as long) div 100").alias("v"),
    )
    t = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
        F.sum(
            F.floor(
                F.log(F.col("v").cast("double")) * F.lit(1000000000.0) + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sln_e9"),
        F.sum(
            F.floor(
                F.lit(1.0e12) / F.col("v").cast("double") + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sinv_e12"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    return t.select(
        "segment",
        "n",
        F.round(mean, 4).alias("mean_arith"),
        F.round(
            F.exp(F.col("sln_e9").cast("double") / nd / F.lit(1000000000.0)), 4
        ).alias("mean_geo"),
        F.round(
            nd / (F.col("sinv_e12").cast("double") / F.lit(1.0e12)), 4
        ).alias("mean_harm"),
        F.round(
            F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double") / nd
                )
                / (F.col("n") - 1).cast("double")
            )
            / mean,
            6,
        ).alias("cv"),
    ).orderBy("segment")


# --------------------------------------------- Pareto share curve


@q(
    "pareto_share_curve",
    """WITH cu AS (SELECT o_custkey,
                CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                              AS BIGINT)) AS BIGINT) AS rev
         FROM orders GROUP BY 1),
       lvl AS (SELECT rev, CAST(count(*) AS BIGINT) AS cnt
               FROM cu GROUP BY 1),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                      CAST(sum(rev * cnt) AS BIGINT) AS r FROM lvl),
       cw AS (SELECT rev,
                     CAST(sum(cnt) OVER (ORDER BY rev DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                     CAST(sum(rev * cnt) OVER (ORDER BY rev DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_r
              FROM lvl),
       fr AS (SELECT unnest([1, 5, 10, 20, 50]) AS pct),
       pick AS (SELECT fr.pct,
                       CAST(coalesce(max(cwt.cum_n), 0) AS BIGINT) AS n_top,
                       CAST(coalesce(max(cwt.cum_r), 0) AS BIGINT) AS r_top
                FROM fr LEFT JOIN (SELECT cw.cum_n, cw.cum_r, tot.n
                                   FROM cw CROSS JOIN tot) cwt
                  ON cwt.cum_n * 100 <= cwt.n * fr.pct
                GROUP BY 1)
       SELECT pick.pct, pick.n_top,
              CAST((pick.r_top // 1000) * 1000000 // (tot.r // 1000)
                   AS BIGINT) AS rev_share_e6
       FROM pick CROSS JOIN tot ORDER BY pick.pct""",
)
def _pareto_share_curve(spark, sf_dir):
    """Pareto revenue-concentration curve: the exact share of total
    revenue carried by the top 1/5/10/20/50% of customers (by spend) —
    the "is this an 80/20 business" readout that complements the Gini
    / HHI indices of revenue_concentration with the interpretable
    curve points. Per-customer revenue folds to a value LEVEL table;
    the top-x% cut is the largest cumulative-count prefix within the
    exact integer bound cum_n*100 <= n*pct (whole levels only — ties
    at the boundary stay together, deterministically); shares are
    exact e6 integer divisions of cent sums. The pct list is LEFT
    joined so the output is always exactly 5 rows — a pct whose bound
    admits no level prefix (e.g. >1% of customers tie at the top
    revenue level when pct=1) reports n_top=0, rev_share_e6=0 instead
    of silently dropping the row."""
    o = _t(spark, sf_dir, "orders")
    cu = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev")
    )
    lvl = cu.groupBy("rev").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = lvl.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("rev") * F.col("cnt")).cast("long").alias("r"),
    )
    w = Window.orderBy(F.col("rev").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lvl.select(
        "rev",
        F.sum("cnt").over(w).cast("long").alias("cum_n"),
        F.sum(F.col("rev") * F.col("cnt")).over(w).cast("long").alias("cum_r"),
    )
    fr = spark.createDataFrame([(1,), (5,), (10,), (20,), (50,)], "pct long")
    pick = (
        F.broadcast(fr)
        .join(
            cw.crossJoin(F.broadcast(tot)),
            F.col("cum_n") * 100 <= F.col("n") * F.col("pct"),
            "left",
        )
        .groupBy("pct")
        .agg(
            F.coalesce(F.max("cum_n"), F.lit(0)).cast("long").alias("n_top"),
            F.coalesce(F.max("cum_r"), F.lit(0)).cast("long").alias("r_top"),
        )
    )
    return (
        pick.crossJoin(F.broadcast(tot))
        .select(
            "pct",
            "n_top",
            # tenth-dollar pre-division keeps r_top*1e6 inside int64
            # at 10x (total cents * 1e6 overflows — caught at f10)
            F.expr(
                "cast((r_top div 1000) * 1000000 div (r div 1000) as long)"
            ).alias("rev_share_e6"),
        )
        .orderBy("pct")
    )


# --------------------------------------------- lognormal spend fit


@q(
    "lognormal_spend_fit",
    """WITH cu AS (SELECT o_custkey,
                CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                              AS BIGINT)) AS BIGINT) // 100 AS rev
         FROM orders GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(floor(ln(CAST(rev AS DOUBLE))
                                        * 1000000000
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sln_e9,
                    CAST(sum(CAST(floor(ln(CAST(rev AS DOUBLE))
                                        * ln(CAST(rev AS DOUBLE))
                                        * 1000000000
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sln2_e9
             FROM cu WHERE rev > 0)
       SELECT n,
              round(CAST(sln_e9 AS DOUBLE) / CAST(n AS DOUBLE)
                    / CAST(1000000000 AS DOUBLE), 6) AS mu,
              round(sqrt((CAST(sln2_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)
                          - (CAST(sln_e9 AS DOUBLE)
                             / CAST(1000000000 AS DOUBLE))
                            * (CAST(sln_e9 AS DOUBLE)
                               / CAST(1000000000 AS DOUBLE))
                            / CAST(n AS DOUBLE))
                         / CAST(n - 1 AS DOUBLE)), 6) AS sigma,
              round(exp(CAST(sln_e9 AS DOUBLE) / CAST(n AS DOUBLE)
                        / CAST(1000000000 AS DOUBLE)), 4) AS implied_median,
              round(exp(CAST(sln_e9 AS DOUBLE) / CAST(n AS DOUBLE)
                        / CAST(1000000000 AS DOUBLE)
                        + ((CAST(sln2_e9 AS DOUBLE)
                            / CAST(1000000000 AS DOUBLE)
                            - (CAST(sln_e9 AS DOUBLE)
                               / CAST(1000000000 AS DOUBLE))
                              * (CAST(sln_e9 AS DOUBLE)
                                 / CAST(1000000000 AS DOUBLE))
                              / CAST(n AS DOUBLE))
                           / CAST(n - 1 AS DOUBLE))
                          / CAST(2 AS DOUBLE)), 4) AS implied_mean
       FROM t""",
)
def _lognormal_spend_fit(spark, sf_dir):
    """Lognormal fit of per-customer total spend (dollars) by moments
    of the log — the standard BODY model for spend/income
    distributions (the GPD fit handles the tail; together they are the
    composite model risk teams use): mu and sigma from e9-quantized
    per-customer ln terms (both moments exact int64 sums), plus the
    implied median exp(mu) and mean exp(mu + sigma^2/2) whose gap IS
    the skewness readout. One groupBy + one aggregate; no windows."""
    o = _t(spark, sf_dir, "orders")
    cu = o.groupBy("o_custkey").agg(
        F.expr(
            "cast(sum(cast(floor(o_totalprice * 100 + 0.5d) as long)) div 100"
            " as long)"
        ).alias("rev")
    )
    ln = F.log(F.col("rev").cast("double"))
    t = cu.filter(F.col("rev") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(ln * F.lit(1000000000.0) + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sln_e9"),
        F.sum(F.floor(ln * ln * F.lit(1000000000.0) + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sln2_e9"),
    )
    nd = F.col("n").cast("double")
    m = F.col("sln_e9").cast("double") / nd / F.lit(1000000000.0)
    var = (
        F.col("sln2_e9").cast("double") / F.lit(1000000000.0)
        - (F.col("sln_e9").cast("double") / F.lit(1000000000.0))
        * (F.col("sln_e9").cast("double") / F.lit(1000000000.0))
        / nd
    ) / (F.col("n") - 1).cast("double")
    return t.select(
        "n",
        F.round(m, 6).alias("mu"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        F.round(F.exp(m), 4).alias("implied_median"),
        F.round(F.exp(m + var / F.lit(2.0)), 4).alias("implied_mean"),
    )


# ------------------------------------------ Cramér-von Mises (L2)


@q(
    "cvm_two_sample",
    """WITH b AS (
         SELECT CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
         FROM events WHERE event_type IN ('click', 'purchase')),
       pv AS (SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
                     CAST(sum(1 - is1) AS BIGINT) AS c2
              FROM b GROUP BY 1),
       n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                    CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
       cum AS (SELECT v, c1, c2,
                      CAST(sum(c1) OVER (ORDER BY v ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
                      CAST(sum(c2) OVER (ORDER BY v ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
               FROM pv),
       tm AS (SELECT CAST(floor(
                       CAST(c1 + c2 AS DOUBLE)
                       * (CAST(cum1 * n.n2 - cum2 * n.n1 AS DOUBLE)
                          / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)))
                       * (CAST(cum1 * n.n2 - cum2 * n.n1 AS DOUBLE)
                          / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)))
                       * CAST(1000000000 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT) AS t_e9
              FROM cum CROSS JOIN n)
       SELECT n.n1, n.n2,
              CAST(s.sum_t AS BIGINT) AS sum_t_e9,
              round(CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
                    / (CAST(n.n1 + n.n2 AS DOUBLE)
                       * CAST(n.n1 + n.n2 AS DOUBLE))
                    * CAST(s.sum_t AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)
                AS cvm_t,
              CAST(CASE WHEN CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
                    / (CAST(n.n1 + n.n2 AS DOUBLE)
                       * CAST(n.n1 + n.n2 AS DOUBLE))
                    * CAST(s.sum_t AS DOUBLE) / CAST(1000000000 AS DOUBLE)
                    > CAST(0.461 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)
                AS reject_005
       FROM (SELECT sum(t_e9) AS sum_t FROM tm) s CROSS JOIN n""",
)
def _cvm_two_sample(spark, sf_dir):
    """Two-sample Cramér-von Mises test between the click and purchase
    value distributions — the L2 companion to ks_two_sample (sup norm)
    and emd_price_histogram (L1): T = n1*n2/(n1+n2)^2 * sum over the
    pooled sample of (F1-F2)^2, folded over the value LEVEL table with
    per-level multiplicity c1+c2. Each level's squared CDF gap is one
    fixed IEEE tree over exact int64 cumsums, e9-quantized before the
    sum; the 5% decision uses the asymptotic critical value 0.461
    (Anderson 1962). CvM sees distributed small gaps KS misses."""
    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
        (F.col("event_type") == "click").cast("long").alias("is1"),
    )
    pv = b.groupBy("v").agg(
        F.sum("is1").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("is1")).cast("long").alias("c2"),
    )
    n = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pv.select(
        "v",
        "c1",
        "c2",
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
    )
    gap = (
        (F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double"))
    )
    tm = cum.crossJoin(F.broadcast(n)).select(
        F.floor(
            (F.col("c1") + F.col("c2")).cast("double")
            * gap
            * gap
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_e9")
    )
    s = tm.agg(F.sum("t_e9").cast("long").alias("sum_t"))
    out = s.crossJoin(F.broadcast(n))
    nd = (F.col("n1") + F.col("n2")).cast("double")
    t = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / (nd * nd)
        * F.col("sum_t").cast("double")
        / F.lit(1000000000.0)
    )
    return out.select(
        "n1",
        "n2",
        F.col("sum_t").alias("sum_t_e9"),
        F.round(t, 6).alias("cvm_t"),
        (t > F.lit(0.461)).cast("long").alias("reject_005"),
    )
