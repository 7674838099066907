"""Round-7 batch 12: robust-estimation and series-feature tier — the
two-sample Hodges-Lehmann shift estimator (the location estimate
behind Wilcoxon/Mann-Whitney), seasonal/trend strength features of the
daily series (the Wang-Hyndman-Smith tsfeatures pair), and the
conditional bigram entropy rate of the corpus per language.

House rules: the HL estimator is a weighted median over the bounded
cross of two value level tables (cnt products, cumweight selection —
a fact-scale pairwise diff is never materialized); strength features
are ANOVA-style ratios of e0-quantized integer moments on the
detrended series; entropy terms are e9-quantized per bigram before
the vocabulary-bounded sum.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

_DAY_US = 86_400_000_000


# --------------------------------------------- Hodges-Lehmann shift


@q(
    "hodges_lehmann_shift",
    f"""WITH days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                                   ELSE 0 END) AS BIGINT) AS p,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                   ELSE 0 END) AS BIGINT) AS c
              FROM events GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.p, 0) AS BIGINT) AS p,
                    CAST(coalesce(pc.c, 0) AS BIGINT) AS c
             FROM days d LEFT JOIN pc USING (t)),
       lp AS (SELECT p AS v, CAST(count(*) AS BIGINT) AS cnt
              FROM s GROUP BY 1),
       lc AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS cnt
              FROM s GROUP BY 1),
       dif AS (SELECT lp.v - lc.v AS d,
                      CAST(sum(lp.cnt * lc.cnt) AS BIGINT) AS w
               FROM lp CROSS JOIN lc GROUP BY 1),
       nn AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM dif),
       cw AS (SELECT d, CAST(sum(w) OVER (ORDER BY d ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM dif)
       SELECT nn.n AS n_pairs,
              CAST((SELECT min(d) FROM cw CROSS JOIN nn
                    WHERE cw.cum * 2 >= nn.n) AS BIGINT) AS hl_shift
       FROM nn""",
)
def _hodges_lehmann_shift(spark, sf_dir):
    """Two-sample Hodges-Lehmann shift estimator (1963) between the
    daily purchase and click count distributions — the robust location
    difference associated with the Mann-Whitney test (median of all
    pairwise differences p_i - c_j), 29%-breakdown-robust where the
    mean difference is not. The pairwise-diff multiset is NEVER
    materialized: it folds to the cross of two VALUE level tables with
    cnt products as weights (the Kendall count-algebra idiom), and the
    weighted lower median comes from one cumweight window over the
    bounded diff domain."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("us", event_us(ev, "ts"))
    # the unfiltered day groupBy already contains EVERY observed day
    # (conditional sums give exact zeros), so the former distinct-days
    # left join was an identity — one scan; materialized because both
    # value level tables (lp, lc) re-read it
    s = (
        ev.groupBy(F.expr(f"us div {_DAY_US}").cast("long").alias("t"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("p"),
            F.sum((F.col("event_type") == "click").cast("long"))
            .cast("long")
            .alias("c"),
        )
        .select("p", "c")
        .localCheckpoint(eager=True)  # day-level
    )
    lp = s.groupBy(F.col("p").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    lc = s.groupBy(F.col("c").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    dif = (
        lp.select(F.col("v").alias("vp"), F.col("cnt").alias("cp"))
        .crossJoin(lc.select(F.col("v").alias("vc"), F.col("cnt").alias("cc")))
        .groupBy((F.col("vp") - F.col("vc")).alias("d"))
        .agg(F.sum(F.col("cp") * F.col("cc")).cast("long").alias("w"))
    )
    nn = dif.agg(F.sum("w").cast("long").alias("n"))
    wd = Window.orderBy(F.col("d").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = dif.select("d", F.sum("w").over(wd).cast("long").alias("cum"))
    hl = (
        cw.crossJoin(F.broadcast(nn))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("d").cast("long").alias("hl_shift"))
    )
    return nn.crossJoin(F.broadcast(hl)).select(
        F.col("n").alias("n_pairs"), "hl_shift"
    )


# ------------------------------------------ seasonal/trend strength


@q(
    "series_strength_features",
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                            AS BIGINT) AS v_c
                FROM events GROUP BY 1, 2),
       tr AS (SELECT event_type, day, v_c,
                     CAST(sum(v_c) OVER (PARTITION BY event_type ORDER BY day ASC
                                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                          AS BIGINT) AS t7,
                     CAST(count(*) OVER (PARTITION BY event_type ORDER BY day ASC
                                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                          AS BIGINT) AS t7n
              FROM daily),
       det AS (SELECT event_type, day % 7 AS dow,
                      CAST(7 * v_c AS BIGINT) AS x7,
                      CAST(7 * v_c - t7 AS BIGINT) AS d_x7
               FROM tr WHERE t7n = 7),
       per AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_g,
                      CAST(sum(d_x7) AS BIGINT) AS s_g
               FROM det GROUP BY 1, 2),
       tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(d_x7) AS BIGINT) AS sd,
                      CAST(sum(d_x7 * d_x7) AS BIGINT) AS ssd,
                      CAST(sum(x7) AS BIGINT) AS sx,
                      CAST(sum(x7 * x7) AS BIGINT) AS ssx
               FROM det GROUP BY 1),
       ssb AS (SELECT event_type,
                      CAST(sum(CAST(floor(
                        CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        AS BIGINT)) AS BIGINT) AS sum_sq
               FROM per GROUP BY 1)
       SELECT tot.event_type, tot.n AS n_days,
              CAST(floor(greatest(CAST(0 AS DOUBLE),
                (CAST(ssb.sum_sq AS DOUBLE)
                 - CAST(tot.sd AS DOUBLE) * CAST(tot.sd AS DOUBLE)
                   / CAST(tot.n AS DOUBLE))
                / (CAST(tot.ssd AS DOUBLE)
                   - CAST(tot.sd AS DOUBLE) * CAST(tot.sd AS DOUBLE)
                     / CAST(tot.n AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                AS seasonal_strength_e6,
              CAST(floor(greatest(CAST(0 AS DOUBLE),
                CAST(1 AS DOUBLE)
                - (CAST(tot.ssd AS DOUBLE)
                   - CAST(tot.sd AS DOUBLE) * CAST(tot.sd AS DOUBLE)
                     / CAST(tot.n AS DOUBLE))
                  / (CAST(tot.ssx AS DOUBLE)
                     - CAST(tot.sx AS DOUBLE) * CAST(tot.sx AS DOUBLE)
                       / CAST(tot.n AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                AS trend_strength_e6
       FROM tot JOIN ssb USING (event_type)
       ORDER BY tot.event_type""",
)
def _series_strength_features(spark, sf_dir):
    """Seasonal- and trend-strength features (Wang, Smith & Hyndman
    2006 — the tsfeatures pair every forecasting triage starts with)
    for each event type's daily value series, on the SAME centered
    7-day MA decomposition seasonal_decompose_profile ships:
    seasonal strength = eta^2 of the detrended series across
    day-of-week (ANOVA identity, SSB/SST), trend strength = 1 -
    Var(detrended)/Var(series), both clamped to [0,1] and e6-quantized
    from exact int64 moments (x7 = 7*value keeps the MA exact). Level
    tables are (type x dow)-bounded; windows partitioned per type."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("us", event_us(ev, "ts"))
    daily = ev.groupBy(
        "event_type", F.expr(f"us div {_DAY_US}").cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v_c")
    )
    wt = Window.partitionBy("event_type").orderBy(F.col("day").asc()).rowsBetween(
        -3, 3
    )
    tr = daily.select(
        "event_type",
        "day",
        "v_c",
        F.sum("v_c").over(wt).cast("long").alias("t7"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t7n"),
    )
    det = tr.filter(F.col("t7n") == 7).select(
        "event_type",
        (F.col("day") % 7).alias("dow"),
        (F.lit(7) * F.col("v_c")).cast("long").alias("x7"),
        (F.lit(7) * F.col("v_c") - F.col("t7")).cast("long").alias("d_x7"),
    )
    per = det.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("d_x7").cast("long").alias("s_g"),
    )
    tot = det.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d_x7").cast("long").alias("sd"),
        F.sum(F.col("d_x7") * F.col("d_x7")).cast("long").alias("ssd"),
        F.sum("x7").cast("long").alias("sx"),
        F.sum(F.col("x7") * F.col("x7")).cast("long").alias("ssx"),
    )
    ssb = per.groupBy("event_type").agg(
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
    x = tot.join(ssb, "event_type")
    sst = (
        F.col("ssd").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double")
        / F.col("n").cast("double")
    )
    ssb_d = (
        F.col("sum_sq").cast("double")
        - F.col("sd").cast("double") * F.col("sd").cast("double")
        / F.col("n").cast("double")
    )
    varx = (
        F.col("ssx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
        / F.col("n").cast("double")
    )
    return x.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.floor(
            F.greatest(F.lit(0.0), ssb_d / sst) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("seasonal_strength_e6"),
        F.floor(
            F.greatest(F.lit(0.0), F.lit(1.0) - sst / varx) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("trend_strength_e6"),
    ).orderBy("event_type")


# ------------------------------------------ bigram entropy rate


@q(
    "bigram_entropy_rate",
    """WITH tok AS (
         SELECT doc_id, lang,
                list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         FROM documents),
       t2 AS (SELECT doc_id, lang, unnest(toks) AS token,
                     generate_subscripts(toks, 1) AS pos
              FROM tok),
       bg AS (SELECT lang,
                     token || '|' || lead(token) OVER (
                       PARTITION BY doc_id ORDER BY pos ASC) AS gram,
                     token AS head
              FROM t2 QUALIFY gram IS NOT NULL),
       cb AS (SELECT lang, gram, head, CAST(count(*) AS BIGINT) AS c
              FROM bg GROUP BY 1, 2, 3),
       ch AS (SELECT lang, head, CAST(sum(c) AS BIGINT) AS ch
              FROM cb GROUP BY 1, 2),
       nn AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cb GROUP BY 1),
       tm AS (SELECT cb.lang,
                     CAST(floor(-(CAST(cb.c AS DOUBLE) / CAST(nn.n AS DOUBLE))
                          * ln(CAST(cb.c AS DOUBLE) / CAST(ch.ch AS DOUBLE))
                          * CAST(1000000000 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS t_e9
              FROM cb
              JOIN ch ON ch.lang = cb.lang AND ch.head = cb.head
              JOIN nn ON nn.lang = cb.lang)
       SELECT tm.lang, nn.n AS n_bigrams,
              round(CAST(sum(tm.t_e9) AS DOUBLE)
                    / CAST(1000000000 AS DOUBLE), 6) AS h_cond,
              round(exp(CAST(sum(tm.t_e9) AS DOUBLE)
                        / CAST(1000000000 AS DOUBLE)), 4) AS perplexity
       FROM tm JOIN nn ON nn.lang = tm.lang
       GROUP BY 1, 2 ORDER BY tm.lang""",
)
def _bigram_entropy_rate(spark, sf_dir):
    """Conditional bigram entropy rate H(next|current) per language —
    the corpus predictability statistic behind perplexity-based
    quality filters (low-entropy slices are boilerplate; high-entropy
    ones are noise), computed as -sum p(xy) ln p(y|x) with each term
    e9-quantized over exact bigram/head counts before the
    vocabulary-bounded sum; the per-language perplexity exp(H) is the
    single final double. Complements token_pmi_topk (which ranks
    individual bigrams) with the corpus-level rate."""
    toks = _tokens(spark, sf_dir)
    t2 = toks.select(
        "doc_id", "lang", F.posexplode("tokens").alias("pos", "token")
    )
    wl = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    bg = t2.select(
        "lang",
        F.concat(F.col("token"), F.lit("|"), F.lead("token").over(wl)).alias(
            "gram"
        ),
        F.col("token").alias("head"),
    ).filter(F.col("gram").isNotNull())
    cb = bg.groupBy("lang", "gram", "head").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ch = cb.groupBy("lang", "head").agg(F.sum("c").cast("long").alias("ch"))
    nn = cb.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    tm = (
        cb.join(ch, ["lang", "head"])
        .join(F.broadcast(nn), "lang")
        .select(
            "lang",
            F.floor(
                -(F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("c").cast("double") / F.col("ch").cast("double"))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t_e9"),
        )
    )
    h = tm.groupBy("lang").agg(F.sum("t_e9").cast("long").alias("h_e9"))
    return (
        h.join(F.broadcast(nn), "lang")
        .select(
            "lang",
            F.col("n").alias("n_bigrams"),
            F.round(F.col("h_e9").cast("double") / F.lit(1000000000.0), 6).alias(
                "h_cond"
            ),
            F.round(
                F.exp(F.col("h_e9").cast("double") / F.lit(1000000000.0)), 4
            ).alias("perplexity"),
        )
        .orderBy("lang")
    )
