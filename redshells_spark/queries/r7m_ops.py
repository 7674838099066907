"""Round-7 batch 13: dependence, decomposition, and decision-readout
tier — empirical tail-dependence coefficients (the copula statistic
behind joint-extreme risk), the mix/rate (shift-share) decomposition
of average order value between periods, Laspeyres/Paasche/Fisher price
indices, Fellegi-Sunter record-linkage field weights, and UCB bandit
arm indices.

House rules: thresholds and medians via level-table cumweight
selection; per-part/per-segment rational terms quantized e6 BEFORE
summation; m/u probabilities exact e6 ratios with NULL-guarded log
weights; every fact-scale leg is one map-combined aggregate.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000


# ------------------------------------------------ tail dependence


@q(
    "tail_dependence_lambda",
    """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) AS y
         FROM lineitem),
       lx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
       ly AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
       qx AS (SELECT CAST(min(v) AS BIGINT) AS x95
              FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM lx) c
              CROSS JOIN nn WHERE c.cum * 20 >= nn.n * 19),
       qy AS (SELECT CAST(min(v) AS BIGINT) AS y95
              FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM ly) c
              CROSS JOIN nn WHERE c.cum * 20 >= nn.n * 19),
       qxl AS (SELECT CAST(min(v) AS BIGINT) AS x05
               FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM lx) c
               CROSS JOIN nn WHERE c.cum * 20 >= nn.n),
       qyl AS (SELECT CAST(min(v) AS BIGINT) AS y05
               FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM ly) c
               CROSS JOIN nn WHERE c.cum * 20 >= nn.n),
       agg AS (SELECT
                 CAST(sum(CASE WHEN b.x > qx.x95 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_xu,
                 CAST(sum(CASE WHEN b.x > qx.x95 AND b.y > qy.y95
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_uu,
                 CAST(sum(CASE WHEN b.x <= qxl.x05 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_xl,
                 CAST(sum(CASE WHEN b.x <= qxl.x05 AND b.y <= qyl.y05
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_ll
               FROM b CROSS JOIN qx CROSS JOIN qy
               CROSS JOIN qxl CROSS JOIN qyl)
       SELECT qx.x95, qy.y95, agg.n_xu, agg.n_uu,
              CAST(agg.n_uu * 1000000 // agg.n_xu AS BIGINT) AS lambda_u_e6,
              agg.n_xl, agg.n_ll,
              CAST(agg.n_ll * 1000000 // agg.n_xl AS BIGINT) AS lambda_l_e6
       FROM agg CROSS JOIN qx CROSS JOIN qy""",
)
def _tail_dependence_lambda(spark, sf_dir):
    """Empirical upper/lower tail-dependence coefficients (the copula
    lambda_U = P(Y > q95(Y) | X > q95(X)) and its lower mirror)
    between quantity and extended price — the joint-extremes statistic
    that Pearson/Spearman cannot see (two variables can be
    uncorrelated yet crash together). Quantile thresholds come from
    the two value level tables by cumulative weight; the conditional
    probabilities are exact e6 integer ratios from one map-combined
    pass; under independence lambda ~ 0.05 (the conditioning mass),
    so the readout is directly interpretable."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    # one level table per variable, materialized — the hi and lo
    # thresholds (and n, folded from the x levels) all derive from it;
    # the earlier per-threshold rebuild expanded the lineitem scan ~7x
    lx = (
        b.groupBy(F.col("x").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # quantity domain: tiny
    )
    ly = (
        b.groupBy(F.col("y").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # cent-value domain: << fact rows
    )
    nn = lx.agg(F.sum("cnt").cast("long").alias("n"))

    def _thr(lv, hi, out):
        w = Window.orderBy(F.col("v").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cw = lv.select("v", F.sum("cnt").over(w).cast("long").alias("cum"))
        cond = (
            (F.col("cum") * 20 >= F.col("n") * 19)
            if hi
            else (F.col("cum") * 20 >= F.col("n"))
        )
        return (
            cw.crossJoin(F.broadcast(nn))
            .filter(cond)
            .agg(F.min("v").cast("long").alias(out))
        )

    qx = _thr(lx, True, "x95")
    qy = _thr(ly, True, "y95")
    qxl = _thr(lx, False, "x05")
    qyl = _thr(ly, False, "y05")
    agg = (
        b.crossJoin(F.broadcast(qx))
        .crossJoin(F.broadcast(qy))
        .crossJoin(F.broadcast(qxl))
        .crossJoin(F.broadcast(qyl))
        .agg(
            F.sum((F.col("x") > F.col("x95")).cast("long"))
            .cast("long")
            .alias("n_xu"),
            F.sum(
                ((F.col("x") > F.col("x95")) & (F.col("y") > F.col("y95"))).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_uu"),
            F.sum((F.col("x") <= F.col("x05")).cast("long"))
            .cast("long")
            .alias("n_xl"),
            F.sum(
                ((F.col("x") <= F.col("x05")) & (F.col("y") <= F.col("y05"))).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_ll"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(qx))
        .crossJoin(F.broadcast(qy))
        .select(
            "x95",
            "y95",
            "n_xu",
            "n_uu",
            F.expr("cast(n_uu * 1000000 div n_xu as long)").alias("lambda_u_e6"),
            "n_xl",
            "n_ll",
            F.expr("cast(n_ll * 1000000 div n_xl as long)").alias("lambda_l_e6"),
        )
    )


# --------------------------------------------- mix/rate decomposition


@q(
    "mix_rate_decomposition",
    f"""WITH o AS (SELECT o_custkey,
                CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) AS cents,
                epoch_us(o_orderdate) // {_DAY_US} AS day
         FROM orders),
       lv AS (SELECT day, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1),
       nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM lv),
       med AS (SELECT CAST(min(day) AS BIGINT) AS med
               FROM (SELECT day, CAST(sum(cnt) OVER (ORDER BY day ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM lv) c
               CROSS JOIN nn WHERE c.cum * 2 >= nn.n),
       j AS (SELECT c.c_mktsegment AS segment,
                    CASE WHEN o.day <= med.med THEN 0 ELSE 1 END AS period,
                    o.cents
             FROM o JOIN customer c ON o.o_custkey = c.c_custkey
             CROSS JOIN med),
       per AS (SELECT segment, period, CAST(count(*) AS BIGINT) AS n_g,
                      CAST(sum(cents) AS BIGINT) AS s_g
               FROM j GROUP BY 1, 2),
       tot AS (SELECT period, CAST(sum(n_g) AS BIGINT) AS n_p
               FROM per GROUP BY 1),
       wide AS (SELECT p0.segment,
                       p0.n_g AS n0, p0.s_g AS s0, t0.n_p AS np0,
                       p1.n_g AS n1, p1.s_g AS s1, t1.n_p AS np1
                FROM per p0
                JOIN per p1 ON p1.segment = p0.segment AND p1.period = 1
                JOIN tot t0 ON t0.period = 0
                JOIN tot t1 ON t1.period = 1
                WHERE p0.period = 0)
       SELECT segment,
              CAST(n0 * 1000000 // np0 AS BIGINT) AS w0_e6,
              CAST(n1 * 1000000 // np1 AS BIGINT) AS w1_e6,
              round(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100, 4) AS r0,
              round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100, 4) AS r1,
              round((CAST(n1 AS DOUBLE) / CAST(np1 AS DOUBLE)
                     - CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
                    * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100, 4)
                AS mix_effect,
              round((CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100, 4)
                AS rate_effect,
              round((CAST(n1 AS DOUBLE) / CAST(np1 AS DOUBLE)
                     - CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100, 4)
                AS interaction
       FROM wide ORDER BY segment""",
)
def _mix_rate_decomposition(spark, sf_dir):
    """Mix/rate (shift-share, Oaxaca-style) decomposition of the
    change in average order value between the first and second half of
    the order history, by market segment: delta = sum (w1-w0)*r0
    [composition shifted] + sum w0*(r1-r0) [behavior changed] + the
    interaction — the decomposition every "why did the average move"
    question needs. The period split is the exact median order day
    (level cumweight); weights are exact e6 integer shares; every
    effect is one fixed IEEE tree over exact int64 (count, cents-sum)
    moments. The three effect columns sum to the total change exactly
    (pinned in tests)."""
    o0 = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    o = o0.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.expr(f"cast(unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US} as long)").alias(
            "day"
        ),
    )
    lv = (
        o.groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # day-level bounded; the total and the cumulative-weight
        # median scan both consume it
        .localCheckpoint(eager=True)
    )
    nn = lv.agg(F.sum("cnt").cast("long").alias("n"))
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lv.select("day", F.sum("cnt").over(w).cast("long").alias("cum"))
    med = (
        cw.crossJoin(F.broadcast(nn))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("day").cast("long").alias("med"))
    )
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .crossJoin(F.broadcast(med))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("day") <= F.col("med"), 0).otherwise(1).alias("period"),
            "cents",
        )
    )
    per = (
        j.groupBy("segment", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("cents").cast("long").alias("s_g"),
        )
        # segment x period bounded; tot/p0/p1 each re-ran the orders
        # scan + dim join without the pin (16 scans at the r8 audit)
        .localCheckpoint(eager=True)
    )
    tot = per.groupBy("period").agg(F.sum("n_g").cast("long").alias("n_p"))
    p0 = per.filter(F.col("period") == 0).select(
        "segment", F.col("n_g").alias("n0"), F.col("s_g").alias("s0")
    )
    p1 = per.filter(F.col("period") == 1).select(
        "segment", F.col("n_g").alias("n1"), F.col("s_g").alias("s1")
    )
    t0 = tot.filter(F.col("period") == 0).select(F.col("n_p").alias("np0"))
    t1 = tot.filter(F.col("period") == 1).select(F.col("n_p").alias("np1"))
    wide = (
        p0.join(p1, "segment")
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    w0 = F.col("n0").cast("double") / F.col("np0").cast("double")
    w1 = F.col("n1").cast("double") / F.col("np1").cast("double")
    r0 = F.col("s0").cast("double") / F.col("n0").cast("double")
    r1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    return wide.select(
        "segment",
        F.expr("cast(n0 * 1000000 div np0 as long)").alias("w0_e6"),
        F.expr("cast(n1 * 1000000 div np1 as long)").alias("w1_e6"),
        F.round(r0 / 100, 4).alias("r0"),
        F.round(r1 / 100, 4).alias("r1"),
        F.round((w1 - w0) * r0 / 100, 4).alias("mix_effect"),
        F.round(w0 * (r1 - r0) / 100, 4).alias("rate_effect"),
        F.round((w1 - w0) * (r1 - r0) / 100, 4).alias("interaction"),
    ).orderBy("segment")


# ------------------------------------------------ price indices


@q(
    "price_indices_periods",
    f"""WITH li AS (SELECT l.l_partkey AS part,
                CASE WHEN epoch_us(o.o_orderdate) // {_DAY_US} <=
                  (SELECT CAST(min(day) AS BIGINT) FROM (
                     SELECT day, CAST(sum(cnt) OVER (ORDER BY day ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                            CAST((SELECT count(*) FROM orders) AS BIGINT) AS n
                     FROM (SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
                                  CAST(count(*) AS BIGINT) AS cnt
                           FROM orders GROUP BY 1)) c WHERE c.cum * 2 >= c.n)
                THEN 0 ELSE 1 END AS period,
                CAST(l_quantity AS BIGINT) AS q,
                CAST(floor(l.l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) AS rev
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       pp AS (SELECT part, period, CAST(sum(q) AS BIGINT) AS q,
                     CAST(sum(rev) AS BIGINT) AS rev
              FROM li GROUP BY 1, 2),
       bp AS (SELECT p0.part, p0.q AS q0, p0.rev AS rev0,
                       p1.q AS q1, p1.rev AS rev1
                FROM pp p0 JOIN pp p1 ON p1.part = p0.part AND p1.period = 1
                WHERE p0.period = 0),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                    CAST(sum(rev0) AS BIGINT) AS sum_p0q0,
                    CAST(sum(rev1) AS BIGINT) AS sum_p1q1,
                    CAST(sum(CAST(floor(CAST(rev1 AS DOUBLE)
                                        / CAST(q1 AS DOUBLE)
                                        * CAST(q0 AS DOUBLE)
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sum_p1q0,
                    CAST(sum(CAST(floor(CAST(rev0 AS DOUBLE)
                                        / CAST(q0 AS DOUBLE)
                                        * CAST(q1 AS DOUBLE)
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                         AS BIGINT) AS sum_p0q1
             FROM bp)
       SELECT n_parts,
              round(CAST(sum_p1q0 AS DOUBLE) / CAST(sum_p0q0 AS DOUBLE), 6)
                AS laspeyres,
              round(CAST(sum_p1q1 AS DOUBLE) / CAST(sum_p0q1 AS DOUBLE), 6)
                AS paasche,
              round(sqrt((CAST(sum_p1q0 AS DOUBLE) / CAST(sum_p0q0 AS DOUBLE))
                         * (CAST(sum_p1q1 AS DOUBLE)
                            / CAST(sum_p0q1 AS DOUBLE))), 6) AS fisher
       FROM s""",
)
def _price_indices_periods(spark, sf_dir):
    """Laspeyres, Paasche, and Fisher price indices between the first
    and second half of the order history over parts sold in BOTH
    periods — the canonical basket-weighted price-change measures
    (Laspeyres weights by old quantities, Paasche by new, Fisher is
    their geometric mean and the one national statistics ship).
    Per-part unit values rev/qty enter the cross terms as cent-rounded
    integers (floor +0.5 per part, then exact int64 sums), while the
    like-period terms sum(p0q0)/sum(p1q1) ARE the exact revenue cents.
    The period split reuses the exact median order day."""
    o0 = _t(spark, sf_dir, "orders")
    li0 = _t(spark, sf_dir, "lineitem")
    o = o0.select(
        "o_orderkey",
        F.expr(
            f"cast(unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US} as long)"
        ).alias("day"),
    )
    lv = (
        o.groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # day-level bounded; the total and the cumulative-weight
        # median scan both consume it
        .localCheckpoint(eager=True)
    )
    nn = lv.agg(F.sum("cnt").cast("long").alias("n"))
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lv.select("day", F.sum("cnt").over(w).cast("long").alias("cum"))
    med = (
        cw.crossJoin(F.broadcast(nn))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("day").cast("long").alias("med"))
    )
    li = (
        li0.join(o, li0["l_orderkey"] == o["o_orderkey"])
        .crossJoin(F.broadcast(med))
        .select(
            F.col("l_partkey").alias("part"),
            F.when(F.col("day") <= F.col("med"), 0).otherwise(1).alias("period"),
            F.col("l_quantity").cast("long").alias("q"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("rev"),
        )
    )
    pp = (
        li.groupBy("part", "period")
        .agg(
            F.sum("q").cast("long").alias("q"),
            F.sum("rev").cast("long").alias("rev"),
        )
        # 2 longs per (part, period); both period slices consume it -
        # unpinned, the lineitem x orders join ran twice
        .localCheckpoint(eager=True)
    )
    p0 = pp.filter(F.col("period") == 0).select(
        "part", F.col("q").alias("q0"), F.col("rev").alias("rev0")
    )
    p1 = pp.filter(F.col("period") == 1).select(
        "part", F.col("q").alias("q1"), F.col("rev").alias("rev1")
    )
    both = p0.join(p1, "part")
    s = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev0").cast("long").alias("sum_p0q0"),
        F.sum("rev1").cast("long").alias("sum_p1q1"),
        F.sum(
            F.floor(
                F.col("rev1").cast("double")
                / F.col("q1").cast("double")
                * F.col("q0").cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sum_p1q0"),
        F.sum(
            F.floor(
                F.col("rev0").cast("double")
                / F.col("q0").cast("double")
                * F.col("q1").cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sum_p0q1"),
    )
    lasp = F.col("sum_p1q0").cast("double") / F.col("sum_p0q0").cast("double")
    paas = F.col("sum_p1q1").cast("double") / F.col("sum_p0q1").cast("double")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ------------------------------------------ Fellegi-Sunter weights


@q(
    "fellegi_sunter_weights",
    """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
       b AS (SELECT name, string_split(name, ' ')[2] AS blk,
                    length(name) AS len,
                    string_split(name, ' ')[1] AS adj,
                    length(regexp_replace(string_split(name, ' ')[1],
                                          '[^aeiou]', '', 'g')) AS vc
             FROM n),
       p AS (SELECT a.name AS na, b2.name AS nb,
                    CAST(levenshtein(a.name, b2.name) <= 3 AS INT) AS is_m,
                    CAST(a.len = b2.len AS INT) AS f_len,
                    CAST(a.vc = b2.vc AS INT) AS f_first,
                    CAST(levenshtein(a.adj, b2.adj) <= 2 AS INT) AS f_last
             FROM b a JOIN b b2 ON a.blk = b2.blk AND a.name < b2.name),
       agg AS (SELECT CAST(sum(is_m) AS BIGINT) AS n_m,
                      CAST(sum(1 - is_m) AS BIGINT) AS n_u,
                      CAST(sum(is_m * f_len) AS BIGINT) AS m_len,
                      CAST(sum((1 - is_m) * f_len) AS BIGINT) AS u_len,
                      CAST(sum(is_m * f_first) AS BIGINT) AS m_first,
                      CAST(sum((1 - is_m) * f_first) AS BIGINT) AS u_first,
                      CAST(sum(is_m * f_last) AS BIGINT) AS m_last,
                      CAST(sum((1 - is_m) * f_last) AS BIGINT) AS u_last
               FROM p),
       f AS (SELECT 'equal_length' AS field, n_m, n_u,
                    CAST(m_len * 1000000 // n_m AS BIGINT) AS m_e6,
                    CAST(u_len * 1000000 // n_u AS BIGINT) AS u_e6
             FROM agg
             UNION ALL
             SELECT 'same_vowel_count', n_m, n_u,
                    CAST(m_first * 1000000 // n_m AS BIGINT),
                    CAST(u_first * 1000000 // n_u AS BIGINT)
             FROM agg
             UNION ALL
             SELECT 'adj_lev_le2', n_m, n_u,
                    CAST(m_last * 1000000 // n_m AS BIGINT),
                    CAST(u_last * 1000000 // n_u AS BIGINT)
             FROM agg)
       SELECT field, n_m, n_u, m_e6, u_e6,
              CASE WHEN m_e6 > 0 AND u_e6 > 0
                   THEN round(ln(CAST(m_e6 AS DOUBLE) / CAST(u_e6 AS DOUBLE)),
                              6) END AS log_weight
       FROM f ORDER BY field""",
)
def _fellegi_sunter_weights(spark, sf_dir):
    """Fellegi-Sunter record-linkage field weights (1969) estimated on
    the blocked part-name pairs fuzzy_name_match scores: the match
    class is the block pairs within edit distance 3 (the query's own
    match definition), the non-match class the rest of the block, and
    for each comparison field (equal length / same adjective vowel
    count / adjective edit distance <= 2) the m- and u-probabilities
    are exact e6 ratios with
    log(m/u) — the per-field agreement weight a linkage scorer sums.
    NULL-guarded when a field never agrees in a class. Pairwise work
    is Σ block² over DISTINCT names (the fuzzy_name_match bound)."""
    part = _t(spark, sf_dir, "part")
    n = part.select(F.col("p_name").alias("name")).distinct()
    adj = F.element_at(F.split(F.col("name"), " "), 1)
    b = n.select(
        "name",
        F.element_at(F.split(F.col("name"), " "), 2).alias("blk"),
        F.length("name").alias("len"),
        adj.alias("adj"),
        F.length(F.regexp_replace(adj, "[^aeiou]", "")).alias("vc"),
    ).localCheckpoint(eager=True)  # distinct names + blocking features;
    # both self-join sides consume it
    a = b.select(
        F.col("name").alias("na"), F.col("blk"), F.col("len").alias("len_a"),
        F.col("vc").alias("vc_a"), F.col("adj").alias("adj_a"),
    )
    b2 = b.select(
        F.col("name").alias("nb"), F.col("blk"), F.col("len").alias("len_b"),
        F.col("vc").alias("vc_b"), F.col("adj").alias("adj_b"),
    )
    p = (
        a.join(b2, "blk")
        .filter(F.col("na") < F.col("nb"))
        .select(
            (F.levenshtein("na", "nb") <= 3).cast("int").alias("is_m"),
            (F.col("len_a") == F.col("len_b")).cast("int").alias("f_len"),
            (F.col("vc_a") == F.col("vc_b")).cast("int").alias("f_first"),
            (F.levenshtein("adj_a", "adj_b") <= 2).cast("int").alias("f_last"),
        )
    )
    agg = p.agg(
        F.sum("is_m").cast("long").alias("n_m"),
        F.sum(F.lit(1) - F.col("is_m")).cast("long").alias("n_u"),
        F.sum(F.col("is_m") * F.col("f_len")).cast("long").alias("m_len"),
        F.sum((F.lit(1) - F.col("is_m")) * F.col("f_len")).cast("long").alias("u_len"),
        F.sum(F.col("is_m") * F.col("f_first")).cast("long").alias("m_first"),
        F.sum((F.lit(1) - F.col("is_m")) * F.col("f_first"))
        .cast("long")
        .alias("u_first"),
        F.sum(F.col("is_m") * F.col("f_last")).cast("long").alias("m_last"),
        F.sum((F.lit(1) - F.col("is_m")) * F.col("f_last"))
        .cast("long")
        .alias("u_last"),
    ).localCheckpoint(eager=True)  # 1 row; the 3-field union read it
    # three times, re-running the blocked pair join each time
    rows = []
    for fname, mcol, ucol in (
        ("equal_length", "m_len", "u_len"),
        ("same_vowel_count", "m_first", "u_first"),
        ("adj_lev_le2", "m_last", "u_last"),
    ):
        rows.append(
            agg.select(
                F.lit(fname).alias("field"),
                "n_m",
                "n_u",
                F.expr(f"cast({mcol} * 1000000 div n_m as long)").alias("m_e6"),
                F.expr(f"cast({ucol} * 1000000 div n_u as long)").alias("u_e6"),
            )
        )
    f = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return f.select(
        "field",
        "n_m",
        "n_u",
        "m_e6",
        "u_e6",
        F.when(
            (F.col("m_e6") > 0) & (F.col("u_e6") > 0),
            F.round(
                F.log(F.col("m_e6").cast("double") / F.col("u_e6").cast("double")),
                6,
            ),
        ).alias("log_weight"),
    ).orderBy("field")


# --------------------------------------------------- UCB arm indices


@q(
    "ucb_arm_indices",
    """WITH arms AS (SELECT event_type AS arm,
                CAST(count(*) AS BIGINT) AS n_a,
                CAST(sum(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE))
                              AS BIGINT)) AS BIGINT) AS s_c
         FROM events GROUP BY 1),
       tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS t FROM arms),
       mx AS (SELECT CAST(max(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE))
                                   AS BIGINT)) AS BIGINT) AS max_c
              FROM events),
       idx AS (SELECT arms.arm, arms.n_a,
                      round(CAST(arms.s_c AS DOUBLE)
                            / CAST(arms.n_a AS DOUBLE)
                            / CAST(mx.max_c AS DOUBLE), 6) AS mean_norm,
                      round(CAST(arms.s_c AS DOUBLE)
                            / CAST(arms.n_a AS DOUBLE)
                            / CAST(mx.max_c AS DOUBLE)
                            + sqrt(CAST(2 AS DOUBLE) * ln(CAST(tot.t AS DOUBLE))
                                   / CAST(arms.n_a AS DOUBLE)), 6) AS ucb
               FROM arms CROSS JOIN tot CROSS JOIN mx)
       SELECT arm, n_a, mean_norm, ucb,
              CAST(CASE WHEN row_number() OVER (
                     ORDER BY ucb DESC, arm ASC) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS pull_next
       FROM idx ORDER BY arm""",
)
def _ucb_arm_indices(spark, sf_dir):
    """UCB1 bandit indices (Auer et al. 2002) over event types as arms
    with max-normalized cent values as rewards: index = mean +
    sqrt(2 ln T / n) — the optimism bonus that decides which arm an
    explore/exploit loop pulls next (the online companion to the
    offline ips_policy_value estimator). Counts and cent sums are
    exact int64 per arm; the index is one fixed IEEE tree; the
    pull_next flag is a full-tie-break rank over the arm level table."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum(cents).cast("long").alias("s_c"),
    )
    tot = arms.agg(F.sum("n_a").cast("long").alias("t"))
    mx = ev.agg(F.max(cents).cast("long").alias("max_c"))
    idx = arms.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(mx))
    mean_norm = (
        F.col("s_c").cast("double")
        / F.col("n_a").cast("double")
        / F.col("max_c").cast("double")
    )
    ucb = mean_norm + F.sqrt(
        F.lit(2.0) * F.log(F.col("t").cast("double")) / F.col("n_a").cast("double")
    )
    out = idx.select(
        "arm",
        "n_a",
        F.round(mean_norm, 6).alias("mean_norm"),
        F.round(ucb, 6).alias("ucb"),
    )
    wr = Window.orderBy(F.col("ucb").desc(), F.col("arm").asc())
    return out.withColumn(
        "pull_next", (F.row_number().over(wr) == 1).cast("long")
    ).orderBy("arm")
