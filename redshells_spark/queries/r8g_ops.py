"""Round-8 batch 7: trend, market-microstructure, and burstiness
completions — the Cox-Stuart paired-halves trend sign test (the
assumption-free quick check beside Mann-Kendall's full pair scan),
price dispersion of per-unit prices within parts by brand (the
"law of one price" audit), and order-interarrival burstiness (CV² of
per-customer order gaps — Poisson-vs-bursty arrival classification,
the temporal companion of negbin_overdispersion_fit's count view).

House determinism rules: sign/gap/moment algebra exact int64;
per-unit prices integer-floored cents (both engines); CV²/z one fixed
IEEE tree over exact ints, rounded 6.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v
             FROM days d LEFT JOIN pc USING (t))"""


# --------------------------------------------------- Cox-Stuart


@q(
    "cox_stuart_trend",
    f"""WITH {_DAILY_SQL},
       idx AS (SELECT v,
                      CAST(row_number() OVER (ORDER BY t ASC) AS BIGINT) AS i,
                      CAST(count(*) OVER () AS BIGINT) AS tn
               FROM s),
       h AS (SELECT tn, tn // 2 AS half FROM idx LIMIT 1),
       pairs AS (SELECT a.v AS va, b.v AS vb
                 FROM idx a JOIN h ON a.i <= h.half
                 JOIN idx b ON b.i = a.i + (h.tn - h.tn % 2) // 2
                    + (h.tn % 2)),
       cnt AS (SELECT CAST(sum(CASE WHEN vb > va THEN 1 ELSE 0 END)
                           AS BIGINT) AS pos,
                      CAST(sum(CASE WHEN vb < va THEN 1 ELSE 0 END)
                           AS BIGINT) AS neg
               FROM pairs)
       SELECT pos, neg, CAST(pos + neg AS BIGINT) AS n_pairs,
              round((CAST(pos AS DOUBLE) - CAST(pos + neg AS DOUBLE)
                     / CAST(2 AS DOUBLE))
                    / sqrt(CAST(pos + neg AS DOUBLE) / CAST(4 AS DOUBLE)),
                    6) AS z,
              CAST(CASE WHEN abs((CAST(pos AS DOUBLE)
                    - CAST(pos + neg AS DOUBLE) / CAST(2 AS DOUBLE))
                    / sqrt(CAST(pos + neg AS DOUBLE) / CAST(4 AS DOUBLE)))
                    > CAST(1.96 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)
                AS reject_005
       FROM cnt WHERE pos + neg > 0""",
)
def _cox_stuart_trend(spark, sf_dir):
    """Cox-Stuart trend test (1955) on the daily purchase series: pair
    day i of the first half with day i + ⌈T/2⌉ of the second half,
    count sign(later − earlier), and test the sign count against
    Binomial(n, ½) — the O(T) assumption-free trend check beside
    Mann-Kendall's O(T²) pair scan (same null, far cheaper; the
    standard first look). Ties drop (the standard treatment); the
    pair join is index-shifted (one row per first-half day, never
    T²); z is the normal approximation over exact integer sign
    counts. All windows over the day relation (time-bounded)."""
    s = _daily_purchases(spark, sf_dir)
    wt = Window.orderBy(F.col("t").asc())
    idx = s.select(
        "v",
        F.row_number().over(wt).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("tn"),
    )
    # shift = ceil(T/2) = (T - T%2)/2 + T%2; pairs are (i, i+shift)
    # with i <= floor(T/2) — the odd middle day drops (standard)
    a = idx.select(
        F.col("v").alias("va"),
        "i",
        "tn",
        F.expr("(tn - tn % 2) div 2 + (tn % 2)").alias("shift"),
        F.expr("tn div 2").alias("half"),
    ).filter(F.col("i") <= F.col("half"))
    b = idx.select(F.col("v").alias("vb"), F.col("i").alias("j"))
    pairs = a.join(b, F.col("j") == F.col("i") + F.col("shift"))
    cnt = pairs.agg(
        F.sum((F.col("vb") > F.col("va")).cast("long"))
        .cast("long")
        .alias("pos"),
        F.sum((F.col("vb") < F.col("va")).cast("long"))
        .cast("long")
        .alias("neg"),
    )
    npairs = (F.col("pos") + F.col("neg")).cast("long")
    z = (
        F.col("pos").cast("double") - npairs.cast("double") / F.lit(2.0)
    ) / F.sqrt(npairs.cast("double") / F.lit(4.0))
    return cnt.filter(npairs > 0).select(
        "pos",
        "neg",
        npairs.alias("n_pairs"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(1.96)).cast("long").alias("reject_005"),
    )


# ------------------------------------------- price dispersion


@q(
    "price_dispersion_by_brand",
    """WITH up AS (
         SELECT l_partkey AS partkey,
                CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT)
                  // CAST(l_quantity AS BIGINT) AS unit_c
         FROM lineitem WHERE l_quantity > 0),
       pm AS (SELECT partkey, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(unit_c) AS BIGINT) AS s1,
                     CAST(sum(unit_c * unit_c) AS BIGINT) AS s2
              FROM up GROUP BY 1 HAVING count(*) >= 2),
       cv AS (SELECT partkey,
                     CAST(floor(sqrt(greatest(CAST(s2 AS DOUBLE)
                                / CAST(n AS DOUBLE)
                                - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                  * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
                                CAST(0 AS DOUBLE)))
                          / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                          * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cv_e6
              FROM pm WHERE s1 > 0)
       SELECT p.p_brand AS brand,
              CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(c.cv_e6) // count(*) AS BIGINT) AS avg_cv_e6,
              CAST(max(c.cv_e6) AS BIGINT) AS max_cv_e6
       FROM cv c JOIN part p ON p.p_partkey = c.partkey
       GROUP BY 1 ORDER BY 1""",
)
def _price_dispersion_by_brand(spark, sf_dir):
    """Price dispersion of per-unit sale prices WITHIN each part,
    summarized by brand — the "law of one price" audit (high CV =
    the same part trades at very different unit prices; the pricing
    team's inconsistency report beside price_elasticity's demand
    view). Unit price is the integer-floored cent ratio
    cents div quantity (both engines floor); per-part moments are
    exact int64; each part's CV = σ/μ is one fixed IEEE tree
    half-up-rounded to e6 BEFORE the brand average, so the brand
    rollup is pure integer division. Single-sale parts drop (no
    dispersion is defined), identically on both sides."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    up = li.filter(F.col("l_quantity") > 0).select(
        F.col("l_partkey").alias("partkey"),
        F.expr(
            "cast(floor(l_extendedprice * 100 + cast(0.5 as double)) as bigint)"
            " div cast(l_quantity as bigint)"
        ).alias("unit_c"),
    )
    pm = (
        up.groupBy("partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("unit_c").cast("long").alias("s1"),
            F.sum(F.col("unit_c") * F.col("unit_c")).cast("long").alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.greatest(
        F.col("s2").cast("double") / nd - mean * mean, F.lit(0.0)
    )
    cv = pm.filter(F.col("s1") > 0).select(
        "partkey",
        F.floor(F.sqrt(var) / mean * F.lit(1_000_000) + F.lit(0.5))
        .cast("long")
        .alias("cv_e6"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        cv.join(part, cv["partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr("cast(sum(cv_e6) div count(1) as long)").alias(
                "avg_cv_e6"
            ),
            F.max("cv_e6").cast("long").alias("max_cv_e6"),
        )
        .orderBy("brand")
    )


# ------------------------------------- interarrival burstiness


@q(
    "order_interarrival_burstiness",
    f"""WITH o AS (SELECT o_custkey AS custkey,
                        epoch_us(o_orderdate) // {_DAY_US} AS d
               FROM orders),
       od AS (SELECT DISTINCT custkey, d FROM o),
       gaps AS (SELECT custkey,
                       CAST(d - lag(d) OVER (PARTITION BY custkey
                          ORDER BY d ASC) AS BIGINT) AS g
                FROM od QUALIFY g IS NOT NULL),
       cm AS (SELECT custkey, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(g) AS BIGINT) AS s1,
                     CAST(sum(g * g) AS BIGINT) AS s2
              FROM gaps GROUP BY 1 HAVING count(*) >= 2),
       cv2 AS (SELECT custkey,
                      CAST(floor((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                                 / ((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                                 * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                        AS cv2_e6
               FROM cm WHERE s1 > 0),
       seg AS (SELECT c_custkey, c_mktsegment FROM customer)
       SELECT s.c_mktsegment AS segment,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(v.cv2_e6) // count(*) AS BIGINT) AS avg_cv2_e6,
              CAST(sum(CASE WHEN v.cv2_e6 > 1000000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_bursty
       FROM cv2 v JOIN seg s ON s.c_custkey = v.custkey
       GROUP BY 1 ORDER BY 1""",
)
def _order_interarrival_burstiness(spark, sf_dir):
    """Order-interarrival burstiness by market segment: the squared
    coefficient of variation CV² of each customer's order-date gaps —
    the arrival-process classifier (CV² ≈ 1 Poisson, > 1 bursty,
    < 1 regular) and the temporal companion of
    negbin_overdispersion_fit's count view. Distinct order DAYS per
    customer feed lag-gaps (per-customer window, never global);
    per-customer moments are exact int64; CV² is one fixed IEEE tree
    half-up e6-rounded BEFORE the segment average so the rollup is
    pure integer division. Customers with < 2 gaps drop on both
    sides; n_bursty counts CV² > 1."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    o = o.withColumn("od_us", event_us(o, "o_orderdate"))
    od = o.select(
        F.col("o_custkey").alias("custkey"),
        F.expr(f"od_us div {_DAY_US}").cast("long").alias("d"),
    ).distinct()
    wc = Window.partitionBy("custkey").orderBy(F.col("d").asc())
    gaps = od.select(
        "custkey", (F.col("d") - F.lag("d").over(wc)).cast("long").alias("g")
    ).filter(F.col("g").isNotNull())
    cm = (
        gaps.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("g").cast("long").alias("s1"),
            F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mean * mean
    cv2 = cm.filter(F.col("s1") > 0).select(
        "custkey",
        F.floor(var / (mean * mean) * F.lit(1_000_000) + F.lit(0.5))
        .cast("long")
        .alias("cv2_e6"),
    )
    seg = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        cv2.join(seg, cv2["custkey"] == seg["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr("cast(sum(cv2_e6) div count(1) as long)").alias(
                "avg_cv2_e6"
            ),
            F.sum((F.col("cv2_e6") > 1_000_000).cast("long"))
            .cast("long")
            .alias("n_bursty"),
        )
        .orderBy("segment")
    )
