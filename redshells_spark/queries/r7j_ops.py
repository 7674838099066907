"""Round-7 batch 10: classical-inference completion and pretraining
transforms — one-way ANOVA and the Brown-Forsythe (median-centered
Levene) variance-homogeneity test across market segments, the DeLong
confidence interval for exact AUC, and the T5 span-corruption
transform over document tokens.

House determinism rules: all group moments exact int64 (dollar units
keep squares int64-safe); placements and their second moments
e9/e12-quantized per score level BEFORE summation; mask positions from
the portable 60-bit md5 hash; windows over score/value level tables or
partitioned per document.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.text import _duck_h60  # noqa: E402

_T5_H = _duck_h60("CAST(doc_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR)")

_SEG_DOLLARS_SQL = """j AS (
         SELECT c.c_mktsegment AS segment,
                CAST(floor(o.o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) // 100 AS v
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)"""


def _seg_dollars(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as long) div 100").alias("v"),
    )


# ------------------------------------------------ one-way ANOVA


@q(
    "anova_order_totals",
    f"""WITH {_SEG_DOLLARS_SQL},
       per AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
                      CAST(sum(v) AS BIGINT) AS s_g
               FROM j GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS s,
                      CAST(sum(v * v) AS BIGINT) AS ss,
                      CAST(count(DISTINCT segment) AS BIGINT) AS k
               FROM j),
       ssb AS (SELECT CAST(sum(CAST(floor(
                        CAST(per.s_g AS DOUBLE) * CAST(per.s_g AS DOUBLE)
                        / CAST(per.n_g AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
                 AS sum_sq
              FROM per)
       SELECT per.segment, per.n_g,
              round(CAST(per.s_g AS DOUBLE) / CAST(per.n_g AS DOUBLE), 4)
                AS mean_dollars,
              CAST(tot.k - 1 AS BIGINT) AS df1,
              CAST(tot.n - tot.k AS BIGINT) AS df2,
              round(((CAST(ssb.sum_sq AS DOUBLE)
                      - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                        / CAST(tot.n AS DOUBLE))
                     / CAST(tot.k - 1 AS DOUBLE))
                    / ((CAST(tot.ss AS DOUBLE)
                        - CAST(ssb.sum_sq AS DOUBLE))
                       / CAST(tot.n - tot.k AS DOUBLE)), 4) AS f_stat
       FROM per CROSS JOIN tot CROSS JOIN ssb ORDER BY per.segment""",
)
def _anova_order_totals(spark, sf_dir):
    """One-way ANOVA F test of order totals across market segments —
    the omnibus "do any segments differ at all" gate that precedes the
    per-segment effect sizes (effect_size_by_segment) and BH-corrected
    z-tests. Group sums and the global sum of squares are exact int64
    in dollar units; each group's s_g^2/n_g is one double quantized to
    whole dollar^2 units before the between-group sum (dollar^2 keeps
    the quantized term inside int64 through factor 10) so SSB is partition-order-free; F is
    the single final tree. Output repeats F beside each group's mean
    so the readout is self-contained."""
    j = _seg_dollars(spark, sf_dir)
    # ONE fact aggregation: carry the per-group sum of squares so the
    # grand totals (n, s, ss, k) fold from the pinned segment rows —
    # int64 addition is associative, so the derived totals are
    # bit-identical to the direct aggregation (6 scans -> 2 at build)
    per = (
        j.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("v").cast("long").alias("s_g"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("ss_g"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("ss_g").cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ssb = per.agg(
        F.sum(
            F.floor(
                F.col("s_g").cast("double")
                * F.col("s_g").cast("double")
                / F.col("n_g").cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sum_sq")
    )
    x = (
        per.select("segment", "n_g", "s_g")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ssb))
    )
    sumsq = F.col("sum_sq").cast("double")
    corr = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    f_stat = ((sumsq - corr) / (F.col("k") - 1).cast("double")) / (
        (F.col("ss").cast("double") - sumsq) / (F.col("n") - F.col("k")).cast("double")
    )
    return x.select(
        "segment",
        "n_g",
        F.round(F.col("s_g").cast("double") / F.col("n_g").cast("double"), 4).alias(
            "mean_dollars"
        ),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(f_stat, 4).alias("f_stat"),
    ).orderBy("segment")


# --------------------------------------- Brown-Forsythe (Levene) test


@q(
    "levene_variance_check",
    f"""WITH {_SEG_DOLLARS_SQL},
       lvl AS (SELECT segment, v, CAST(count(*) AS BIGINT) AS cnt
               FROM j GROUP BY 1, 2),
       ns AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS n_g
              FROM lvl GROUP BY 1),
       cw AS (SELECT segment, v,
                     CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY v ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM lvl),
       med AS (SELECT cw.segment, CAST(min(cw.v) AS BIGINT) AS med
               FROM cw JOIN ns USING (segment)
               WHERE cw.cum * 2 >= ns.n_g GROUP BY 1),
       z AS (SELECT j.segment, abs(j.v - med.med) AS z
             FROM j JOIN med USING (segment)),
       per AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
                      CAST(sum(z) AS BIGINT) AS s_g
               FROM z GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(z) AS BIGINT) AS s,
                      CAST(sum(z * z) AS BIGINT) AS ss,
                      CAST(count(DISTINCT segment) AS BIGINT) AS k
               FROM z),
       ssb AS (SELECT CAST(sum(CAST(floor(
                        CAST(per.s_g AS DOUBLE) * CAST(per.s_g AS DOUBLE)
                        / CAST(per.n_g AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
                 AS sum_sq
              FROM per)
       SELECT per.segment, per.n_g, med.med AS median_dollars,
              round(CAST(per.s_g AS DOUBLE) / CAST(per.n_g AS DOUBLE), 4)
                AS mean_absdev,
              CAST(tot.k - 1 AS BIGINT) AS df1,
              CAST(tot.n - tot.k AS BIGINT) AS df2,
              round(((CAST(ssb.sum_sq AS DOUBLE)
                      - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                        / CAST(tot.n AS DOUBLE))
                     / CAST(tot.k - 1 AS DOUBLE))
                    / ((CAST(tot.ss AS DOUBLE)
                        - CAST(ssb.sum_sq AS DOUBLE))
                       / CAST(tot.n - tot.k AS DOUBLE)), 4) AS w_stat
       FROM per JOIN med USING (segment)
       CROSS JOIN tot CROSS JOIN ssb ORDER BY per.segment""",
)
def _levene_variance_check(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity test (Levene's test with
    median centering, 1974) across market segments — the assumption
    gate for the pooled-variance t/F machinery (ANOVA, Cohen's d): are
    segment spend VARIANCES equal? Per-segment exact medians come from
    partitioned level-table cumsums; absolute deviations stay int64 in
    dollars; W is one-way ANOVA on those deviations with the same
    e6-quantized between-group fold as anova_order_totals."""
    j = _seg_dollars(spark, sf_dir)
    # ONE fact-scale pass: everything below derives from the
    # (segment, v) level table — |z| sums fold the level counts
    # (sum cnt*|v-med| == sum |v-med| over rows, exact int64) and the
    # totals fold per-segment sums, so the before-plan's three
    # rebuilds of the orders x customer join (44 scans) collapse
    lvl = (
        j.groupBy("segment", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # value-level: domain-bounded
    )
    ns = lvl.groupBy("segment").agg(F.sum("cnt").cast("long").alias("n_g"))
    wseg = Window.partitionBy("segment").orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lvl.select(
        "segment", "v", F.sum("cnt").over(wseg).cast("long").alias("cum")
    )
    med = (
        cw.join(ns, "segment")
        .filter(F.col("cum") * 2 >= F.col("n_g"))
        .groupBy("segment")
        .agg(F.min("v").cast("long").alias("med"))
    )
    zl = lvl.join(F.broadcast(med), "segment").select(
        "segment", "cnt", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    per = zl.groupBy("segment").agg(
        F.sum("cnt").cast("long").alias("n_g"),
        F.sum(F.col("cnt") * F.col("z")).cast("long").alias("s_g"),
        F.sum(F.col("cnt") * F.col("z") * F.col("z")).cast("long").alias("ss_g"),
    )
    tot = per.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("ss_g").cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ssb = per.agg(
        F.sum(
            F.floor(
                F.col("s_g").cast("double")
                * F.col("s_g").cast("double")
                / F.col("n_g").cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sum_sq")
    )
    x = (
        per.join(F.broadcast(med), "segment")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ssb))
    )
    sumsq = F.col("sum_sq").cast("double")
    corr = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    w_stat = ((sumsq - corr) / (F.col("k") - 1).cast("double")) / (
        (F.col("ss").cast("double") - sumsq) / (F.col("n") - F.col("k")).cast("double")
    )
    return x.select(
        "segment",
        "n_g",
        F.col("med").alias("median_dollars"),
        F.round(F.col("s_g").cast("double") / F.col("n_g").cast("double"), 4).alias(
            "mean_absdev"
        ),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(w_stat, 4).alias("w_stat"),
    ).orderBy("segment")


# ------------------------------------------------ DeLong AUC CI


@q(
    "auc_delong_ci",
    """WITH lv AS (SELECT CAST(l_quantity AS BIGINT) AS s,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS BIGINT) AS pos
           FROM lineitem GROUP BY 1),
       tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
                      CAST(sum(n - pos) AS BIGINT) AS q FROM lv),
       c AS (SELECT s, pos, CAST(n - pos AS BIGINT) AS neg,
                    CAST(coalesce(sum(n - pos) OVER (ORDER BY s ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cumneg_lt,
                    CAST(coalesce(sum(pos) OVER (ORDER BY s DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cumpos_gt
             FROM lv),
       pl AS (SELECT c.s, c.pos, c.neg,
                     CAST(2 * c.cumneg_lt + c.neg AS BIGINT) AS v2,
                     CAST(2 * c.cumpos_gt + c.pos AS BIGINT) AS u2,
                     tot.p, tot.q
              FROM c CROSS JOIN tot),
       mo AS (SELECT CAST(sum(pos * v2) AS BIGINT) AS auc2num,
                     CAST(sum(CAST(floor(
                       CAST(pos AS DOUBLE)
                       * (CAST(v2 AS DOUBLE) / (CAST(2 AS DOUBLE)
                                                * CAST(q AS DOUBLE)))
                       * (CAST(v2 AS DOUBLE) / (CAST(2 AS DOUBLE)
                                                * CAST(q AS DOUBLE)))
                       * CAST(1000000000000 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS a2_e12,
                     CAST(sum(CAST(floor(
                       CAST(neg AS DOUBLE)
                       * (CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE)
                                                * CAST(p AS DOUBLE)))
                       * (CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE)
                                                * CAST(p AS DOUBLE)))
                       * CAST(1000000000000 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS b2_e12
              FROM pl)
       SELECT tot.p AS n_pos, tot.q AS n_neg,
              round(CAST(mo.auc2num AS DOUBLE)
                    / (CAST(2 AS DOUBLE) * CAST(tot.p AS DOUBLE)
                       * CAST(tot.q AS DOUBLE)), 6) AS auc,
              round(sqrt(
                ((CAST(mo.a2_e12 AS DOUBLE) / CAST(1000000000000 AS DOUBLE)
                  - CAST(tot.p AS DOUBLE)
                    * (CAST(mo.auc2num AS DOUBLE)
                       / (CAST(2 AS DOUBLE) * CAST(tot.p AS DOUBLE)
                          * CAST(tot.q AS DOUBLE)))
                    * (CAST(mo.auc2num AS DOUBLE)
                       / (CAST(2 AS DOUBLE) * CAST(tot.p AS DOUBLE)
                          * CAST(tot.q AS DOUBLE))))
                 / CAST(tot.p - 1 AS DOUBLE)) / CAST(tot.p AS DOUBLE)
                + ((CAST(mo.b2_e12 AS DOUBLE) / CAST(1000000000000 AS DOUBLE)
                    - CAST(tot.q AS DOUBLE)
                      * (CAST(mo.auc2num AS DOUBLE)
                         / (CAST(2 AS DOUBLE) * CAST(tot.p AS DOUBLE)
                            * CAST(tot.q AS DOUBLE)))
                      * (CAST(mo.auc2num AS DOUBLE)
                         / (CAST(2 AS DOUBLE) * CAST(tot.p AS DOUBLE)
                            * CAST(tot.q AS DOUBLE))))
                   / CAST(tot.q - 1 AS DOUBLE)) / CAST(tot.q AS DOUBLE)), 6)
                AS se
       FROM tot CROSS JOIN mo""",
)
def _auc_delong_ci(spark, sf_dir):
    """DeLong standard error for the exact AUC (DeLong et al. 1988) —
    the variance of the Mann-Whitney U estimator from per-observation
    PLACEMENTS, computed entirely on the score level table: a
    positive's placement is (2*cumneg_below + neg_at)/(2*N-), a
    negative's is the mirror; both second moments are e12-quantized
    per level before summation so the placement variances are
    partition-order-free. Completes exact_auc with the inferential
    readout (auc, se) every model comparison needs; the midrank
    half-credit convention matches the exact_auc tie treatment."""
    li = _t(spark, sf_dir, "lineitem")
    lv = li.groupBy(F.col("l_quantity").cast("long").alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long"))
        .cast("long")
        .alias("pos"),
    )
    tot = lv.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum(F.col("n") - F.col("pos")).cast("long").alias("q"),
    )
    w_lt = Window.orderBy(F.col("s").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_gt = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = lv.select(
        "s",
        "pos",
        (F.col("n") - F.col("pos")).cast("long").alias("neg"),
        F.coalesce(F.sum(F.col("n") - F.col("pos")).over(w_lt), F.lit(0))
        .cast("long")
        .alias("cumneg_lt"),
        F.coalesce(F.sum("pos").over(w_gt), F.lit(0))
        .cast("long")
        .alias("cumpos_gt"),
    )
    pl = c.crossJoin(F.broadcast(tot)).select(
        "s",
        "pos",
        "neg",
        (F.lit(2) * F.col("cumneg_lt") + F.col("neg")).cast("long").alias("v2"),
        (F.lit(2) * F.col("cumpos_gt") + F.col("pos")).cast("long").alias("u2"),
        "p",
        "q",
    )
    tv = F.col("v2").cast("double") / (F.lit(2.0) * F.col("q").cast("double"))
    tu = F.col("u2").cast("double") / (F.lit(2.0) * F.col("p").cast("double"))
    mo = pl.agg(
        F.sum(F.col("pos") * F.col("v2")).cast("long").alias("auc2num"),
        F.sum(
            F.floor(
                F.col("pos").cast("double") * tv * tv * F.lit(1.0e12) + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("a2_e12"),
        F.sum(
            F.floor(
                F.col("neg").cast("double") * tu * tu * F.lit(1.0e12) + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("b2_e12"),
    )
    x = tot.crossJoin(F.broadcast(mo))
    pd_, qd = F.col("p").cast("double"), F.col("q").cast("double")
    auc = F.col("auc2num").cast("double") / (F.lit(2.0) * pd_ * qd)
    s10 = (
        F.col("a2_e12").cast("double") / F.lit(1.0e12) - pd_ * auc * auc
    ) / (F.col("p") - 1).cast("double")
    s01 = (
        F.col("b2_e12").cast("double") / F.lit(1.0e12) - qd * auc * auc
    ) / (F.col("q") - 1).cast("double")
    se = F.sqrt(s10 / pd_ + s01 / qd)
    return x.select(
        F.col("p").alias("n_pos"),
        F.col("q").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(se, 6).alias("se"),
    )


# --------------------------------------------- T5 span corruption


@q(
    "t5_span_corruption",
    f"""WITH {_TOK_SQL},
       st AS (SELECT doc_id, pos,
                     CAST({_T5_H} % 20 = 0 AS INT) AS start
              FROM tok),
       mk AS (SELECT doc_id, pos,
                     CAST(max(start) OVER (PARTITION BY doc_id ORDER BY pos ASC
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS masked
              FROM st),
       sp AS (SELECT doc_id, pos, masked,
                     CAST(CASE WHEN masked = 1
                               AND coalesce(lag(masked) OVER (
                                 PARTITION BY doc_id ORDER BY pos ASC), 0) = 0
                          THEN 1 ELSE 0 END AS BIGINT) AS span_start
              FROM mk)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(masked) AS BIGINT) AS n_masked,
              CAST(sum(span_start) AS BIGINT) AS n_spans,
              CAST(count(*) - sum(masked) + sum(span_start) AS BIGINT)
                AS input_len,
              CAST(sum(masked) + sum(span_start) + 1 AS BIGINT) AS target_len
       FROM sp GROUP BY 1 ORDER BY doc_id""",
)
def _t5_span_corruption(spark, sf_dir):
    """T5 span-corruption accounting (Raffel et al. 2020): mask spans
    of ~3 tokens starting wherever the portable md5 hash of
    (doc_id|position) lands in 1/20 of its range (~15% corruption
    rate), overlapping starts merging into longer spans exactly as the
    windowed max does; each maximal span is replaced by one sentinel
    on the input side and emitted as sentinel+tokens on the target
    side. Outputs the per-document input/target length accounting a
    seq2seq pretraining batch builder needs — all windows partitioned
    per document, mask placement engine-exact via the md5 fold."""
    from redshells_spark.dedup.simhash import portable_token_hash

    toks = _tokens(spark, sf_dir)
    tok = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"))
    st = tok.select(
        "doc_id",
        "pos",
        (
            portable_token_hash(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("pos").cast("string"),
                )
            )
            % 20
            == 0
        )
        .cast("int")
        .alias("start"),
    )
    wm = Window.partitionBy("doc_id").orderBy(F.col("pos").asc()).rowsBetween(-2, 0)
    mk = st.select(
        "doc_id",
        "pos",
        F.max("start").over(wm).cast("long").alias("masked"),
    )
    wl = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    sp = mk.select(
        "doc_id",
        "masked",
        (
            (F.col("masked") == 1)
            & (F.coalesce(F.lag("masked").over(wl), F.lit(0)) == 0)
        )
        .cast("long")
        .alias("span_start"),
    )
    return (
        sp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("masked").cast("long").alias("n_masked"),
            F.sum("span_start").cast("long").alias("n_spans"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_masked",
            "n_spans",
            (F.col("n_tokens") - F.col("n_masked") + F.col("n_spans"))
            .cast("long")
            .alias("input_len"),
            (F.col("n_masked") + F.col("n_spans") + 1)
            .cast("long")
            .alias("target_len"),
        )
        .orderBy("doc_id")
    )
