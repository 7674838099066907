"""Round-8 batch 5: agreement, extreme-value, count-model, seasonal
trend, and temporal-join completions — Cohen's kappa between two
deterministic document judges (the inter-rater readout beside
mcnemar/judge_position_bias), a Gumbel block-maxima fit (the
complement of gpd_tail_fit's peaks-over-threshold), a negative-
binomial moment fit of per-user purchase counts (the model behind
event_dispersion_index's VMR flag), the seasonal Mann-Kendall trend
test (weekday-stratified, completing mann_kendall), and a
tolerance-bounded as-of join (the time-series join asof_join_orders
ships without a staleness bound).

House determinism rules: all confusion/moment/pair-sign sums exact
int64; irrational constants (π, Euler γ, Gumbel quantiles) are Python
literals embedded in BOTH engines; signed integer divisions run as
sign × non-negative div (Spark div truncates, DuckDB // floors);
window orders carry full tie-breaks.
"""

from __future__ import annotations

import math

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.dedup import _LANG_HITS_SQL  # noqa: E402

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""days AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS t
                FROM events),
       pc AS (SELECT epoch_us(ts) // {_DAY_US} AS t,
                     CAST(count(*) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
       s AS (SELECT d.t, CAST(coalesce(pc.v, 0) AS BIGINT) AS v
             FROM days d LEFT JOIN pc USING (t))"""

# the same quality rubric the llm_corpus_pipeline oracle replicates
_QUAL_SQL = """qual AS (
         SELECT doc_id, CAST(round(
             (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN stop_hits / greatest(n_tokens, 1) >= 0.05 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN punct / greatest(n_chars, 1) <= 0.3 THEN 0.3 ELSE 0.0 END), 4) AS DOUBLE) AS quality
         FROM (SELECT doc_id, length(text) AS n_chars,
                 CAST(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the','and','of','to','in','is','that','with','for','it'))) AS BIGINT) AS stop_hits,
                 length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct
               FROM documents) b)"""

_LANG_SQL = f"""lang AS (
         SELECT doc_id, CASE
             WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
             WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
             WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
             WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
         FROM (SELECT doc_id, {_LANG_HITS_SQL} FROM documents) h)"""


# --------------------------------------------------- Cohen's kappa


@q(
    "cohens_kappa_judges",
    f"""WITH {_QUAL_SQL},
       {_LANG_SQL},
       j AS (SELECT CASE WHEN q.quality >= CAST(0.7 AS DOUBLE)
                    THEN 1 ELSE 0 END AS a,
                    CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END AS b
             FROM qual q JOIN lang l USING (doc_id)),
       cm AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(a * b) AS BIGINT) AS n11,
                     CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                     CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                     CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
              FROM j),
       kk AS (SELECT n, n11, n10, n01, n00,
                     CAST(n * (n11 + n00)
                          - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00)) AS BIGINT) AS num,
                     CAST(n * n - ((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00)) AS BIGINT)
                       AS den
              FROM cm)
       SELECT n, n11, n10, n01, n00,
              CAST(CASE WHEN num < 0 THEN -(((-num) * 1000000) // den)
                        ELSE (num * 1000000) // den END AS BIGINT)
                AS kappa_e6
       FROM kk""",
)
def _cohens_kappa_judges(spark, sf_dir):
    """Cohen's kappa (1960) between two deterministic document judges
    — "is it high quality" (quality ≥ 0.7 rubric) vs "is it English"
    (stopword language ID) — the chance-corrected inter-rater
    agreement beside mcnemar_rule_compare's marginal test. Kappa is
    fully rational in the confusion counts: κ = (n·agree − Σ r_i c_i)
    / (n² − Σ r_i c_i), so the e6 readout is an exact signed integer
    division (sign applied OUTSIDE the non-negative div — Spark div
    truncates while DuckDB // floors; the r6 dtype lesson). One doc
    scan per judge, one 4-cell confusion aggregate."""
    from redshells_spark.text.analysis import detect_language, quality_score

    docs = _t(spark, sf_dir, "documents")
    qa = quality_score(docs).select(
        "doc_id", (F.col("quality") >= 0.7).cast("long").alias("a")
    )
    lb = detect_language(docs).select(
        "doc_id", (F.col("lang_pred") == "en").cast("long").alias("b")
    )
    j = qa.join(lb, "doc_id")
    cm = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    kk = cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "cast(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)"
            " + (n01 + n00) * (n10 + n00)) as long)"
        ).alias("num"),
        F.expr(
            "cast(n * n - ((n11 + n10) * (n11 + n01)"
            " + (n01 + n00) * (n10 + n00)) as long)"
        ).alias("den"),
    )
    return kk.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "cast(case when num < 0 then -(((-num) * 1000000) div den)"
            " else (num * 1000000) div den end as long)"
        ).alias("kappa_e6"),
    )


# ------------------------------------------- Gumbel block maxima

_SQRT6_OVER_PI = 0.779696801233676  # √6/π, shared literal
_EULER_GAMMA = 0.5772156649015329
_GUMBEL_Q99 = 4.600149226776579  # −ln(−ln(0.99)), shared literal


@q(
    "block_maxima_gumbel_fit",
    f"""WITH {_DAILY_SQL},
       blk AS (SELECT t // 7 AS w, CAST(max(v) AS BIGINT) AS mx
               FROM s GROUP BY 1),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                    CAST(sum(mx) AS BIGINT) AS s1,
                    CAST(sum(mx * mx) AS BIGINT) AS s2
             FROM blk),
       fit AS (SELECT n_blocks, s1, s2,
                      sqrt(CAST(s2 AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)))
                        * CAST({_SQRT6_OVER_PI} AS DOUBLE) AS beta,
                      CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean
               FROM m WHERE n_blocks >= 2)
       SELECT n_blocks, s1, s2,
              round(mean - CAST({_EULER_GAMMA} AS DOUBLE) * beta, 6) AS mu,
              round(beta, 6) AS beta,
              round(mean - CAST({_EULER_GAMMA} AS DOUBLE) * beta
                    + beta * CAST({_GUMBEL_Q99} AS DOUBLE), 6) AS p99_gumbel
       FROM fit""",
)
def _block_maxima_gumbel_fit(spark, sf_dir):
    """Gumbel fit of weekly block maxima of daily purchase counts
    (method of moments: β = σ√6/π, μ = mean − γβ) — the block-maxima
    half of extreme-value theory beside gpd_tail_fit's
    peaks-over-threshold half; the p99 return level μ + β·q₉₉ answers
    "what weekly peak should capacity planning expect". The three
    irrational constants are Python literals shared verbatim by both
    engines; moments are exact int64 (weekly maxima are counts); the
    fit is one fixed IEEE tree, rounded 6. Fewer than 2 blocks emits
    no row on either side."""
    s = _daily_purchases(spark, sf_dir)
    blk = s.groupBy(F.expr("t div 7").alias("w")).agg(
        F.max("v").cast("long").alias("mx")
    )
    m = blk.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    nb = F.col("n_blocks").cast("double")
    mean = F.col("s1").cast("double") / nb
    beta = (
        F.sqrt(F.col("s2").cast("double") / nb - mean * mean)
        * F.lit(_SQRT6_OVER_PI)
    )
    return m.filter(F.col("n_blocks") >= 2).select(
        "n_blocks",
        "s1",
        "s2",
        F.round(mean - F.lit(_EULER_GAMMA) * beta, 6).alias("mu"),
        F.round(beta, 6).alias("beta"),
        F.round(
            mean - F.lit(_EULER_GAMMA) * beta + beta * F.lit(_GUMBEL_Q99), 6
        ).alias("p99_gumbel"),
    )


# --------------------------------------- negative-binomial moments


@q(
    "negbin_overdispersion_fit",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
       k AS (SELECT u.user_id,
                    CAST(coalesce(p.c, 0) AS BIGINT) AS k
             FROM u LEFT JOIN (
               SELECT user_id, count(*) AS c FROM events
               WHERE event_type = 'purchase' GROUP BY 1) p
             USING (user_id)),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(k) AS BIGINT) AS s1,
                    CAST(sum(k * k) AS BIGINT) AS s2
             FROM k),
       c AS (SELECT n, s1, s2,
                    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var
             FROM m WHERE s1 > 0)
       SELECT n AS n_users, s1, s2,
              round(mean, 6) AS mean,
              round(var, 6) AS variance,
              round(var / mean, 6) AS vmr,
              CAST(CASE WHEN var > mean THEN 1 ELSE 0 END AS BIGINT)
                AS overdispersed,
              round(CASE WHEN var > mean
                    THEN mean * mean / (var - mean) ELSE CAST(0 AS DOUBLE) END,
                    6) AS r_mom,
              round(CASE WHEN var > mean
                    THEN mean / var ELSE CAST(0 AS DOUBLE) END, 6) AS p_mom
       FROM c""",
)
def _negbin_overdispersion_fit(spark, sf_dir):
    """Negative-binomial moment fit of per-user purchase counts
    (r = m²/(σ²−m), p = m/σ²) — the MODEL behind
    event_dispersion_index's VMR flag: when counts are overdispersed,
    the NB(r, p) parameters say HOW clumpy (small r = bursty users).
    Zero-purchase users count (left join from the distinct-user
    relation); moments are exact int64; mean/variance (population) and
    both parameters are one fixed IEEE tree, rounded 6, with the
    var ≤ mean branch pinned to 0 on both engines (no NULL
    divergence)."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    k = u.join(p, "user_id", "left").select(
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("k")
    )
    m = k.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mean * mean
    return m.filter(F.col("s1") > 0).select(
        F.col("n").alias("n_users"),
        "s1",
        "s2",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(var / mean, 6).alias("vmr"),
        (var > mean).cast("long").alias("overdispersed"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)).otherwise(F.lit(0.0)),
            6,
        ).alias("r_mom"),
        F.round(F.when(var > mean, mean / var).otherwise(F.lit(0.0)), 6).alias(
            "p_mom"
        ),
    )


# ------------------------------------------ seasonal Mann-Kendall


@q(
    "seasonal_mann_kendall",
    f"""WITH {_DAILY_SQL},
       sw AS (SELECT t, t % 7 AS w, v FROM s),
       pairs AS (SELECT a.w,
                        CAST(sum(CASE WHEN b.v > a.v THEN 1
                                      WHEN b.v < a.v THEN -1
                                      ELSE 0 END) AS BIGINT) AS s_w
                 FROM sw a JOIN sw b ON b.w = a.w AND b.t > a.t
                 GROUP BY 1),
       nw AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM sw GROUP BY 1),
       tie AS (SELECT w, CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tt
               FROM (SELECT w, v, CAST(count(*) AS BIGINT) AS c
                     FROM sw GROUP BY 1, 2)
               GROUP BY 1),
       per AS (SELECT n.w, coalesce(p.s_w, 0) AS s_w,
                      CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                           - coalesce(t.tt, 0) AS BIGINT) AS var18_w
               FROM nw n LEFT JOIN pairs p ON p.w = n.w
               LEFT JOIN tie t ON t.w = n.w),
       tot AS (SELECT CAST(sum(s_w) AS BIGINT) AS s_total,
                      CAST(sum(var18_w) AS BIGINT) AS var18_total
               FROM per)
       SELECT s_total, var18_total,
              round(CASE WHEN s_total > 0
                    THEN CAST(s_total - 1 AS DOUBLE)
                    WHEN s_total < 0 THEN CAST(s_total + 1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END
                    / sqrt(CAST(var18_total AS DOUBLE) / CAST(18 AS DOUBLE)),
                    6) AS z,
              CAST(CASE WHEN abs(CASE WHEN s_total > 0
                    THEN CAST(s_total - 1 AS DOUBLE)
                    WHEN s_total < 0 THEN CAST(s_total + 1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END
                    / sqrt(CAST(var18_total AS DOUBLE) / CAST(18 AS DOUBLE)))
                    > CAST(1.96 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)
                AS reject_005
       FROM tot""",
)
def _seasonal_mann_kendall(spark, sf_dir):
    """Seasonal Mann-Kendall trend test (Hirsch-Slack 1984) on the
    daily purchase series, stratified by weekday — the
    weekday-structure-robust version of mann_kendall_purchases (a pure
    weekly cycle contributes NO cross-season pairs, so the seasonal S
    is immune to the weekday effect the plain test confounds with
    trend). Per-season pair signs and tie-corrected variances (×18)
    are exact int64 over the day relation (time-bounded pairs:
    (T/7)² per season); z applies the standard continuity correction,
    one fixed IEEE tree."""
    sw = _daily_purchases(spark, sf_dir).select(
        "t", (F.col("t") % 7).alias("w"), "v"
    )
    a = sw.select("w", F.col("t").alias("ta"), F.col("v").alias("va"))
    b = sw.select("w", F.col("t").alias("tb"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("tb") > F.col("ta"))
        .groupBy("w")
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_w")
        )
    )
    nw = sw.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tie = (
        sw.groupBy("w", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("w")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5))
            .cast("long")
            .alias("tt")
        )
    )
    per = (
        nw.join(pairs, "w", "left")
        .join(tie, "w", "left")
        .select(
            F.coalesce(F.col("s_w"), F.lit(0)).cast("long").alias("s_w"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tt"), F.lit(0))
            )
            .cast("long")
            .alias("var18_w"),
        )
    )
    tot = per.agg(
        F.sum("s_w").cast("long").alias("s_total"),
        F.sum("var18_w").cast("long").alias("var18_total"),
    )
    num = (
        F.when(F.col("s_total") > 0, F.col("s_total").cast("double") - 1.0)
        .when(F.col("s_total") < 0, F.col("s_total").cast("double") + 1.0)
        .otherwise(F.lit(0.0))
    )
    z = num / F.sqrt(F.col("var18_total").cast("double") / F.lit(18.0))
    return tot.select(
        "s_total",
        "var18_total",
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(1.96)).cast("long").alias("reject_005"),
    )


# ------------------------------------------- tolerance as-of join


@q(
    "asof_join_tolerance",
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
       clk AS (SELECT event_id, user_id, us,
                      CASE WHEN last_p_us IS NOT NULL
                            AND us - last_p_us <= {_DAY_US}
                           THEN last_p_us END AS m_us
               FROM marked WHERE event_type = 'click'),
       matched AS (SELECT c.event_id, c.us, c.m_us,
                          min(p.event_id) AS matched_purchase_id
                   FROM clk c LEFT JOIN e p
                     ON p.user_id = c.user_id AND p.event_type = 'purchase'
                    AND p.us = c.m_us
                   GROUP BY 1, 2, 3)
       SELECT event_id, matched_purchase_id,
              CAST(us - m_us AS BIGINT) AS gap_us
       FROM matched ORDER BY event_id""",
)
def _asof_join_tolerance(spark, sf_dir):
    """Backward as-of join WITH a staleness tolerance: each click
    matches the latest preceding purchase of the same user only if it
    is at most 24 h old — the "don't join stale state" variant that
    asof_join_orders lacks and every feature-store lookup needs (a
    price quote from last month must NOT silently join today's trade).
    One per-user running max (ordered by (us, event_id) — full
    tie-break) finds the as-of timestamp; the tolerance gates it; an
    equi-join back on (user, timestamp) recovers the purchase id with
    a min-id tie-break. Unmatched clicks keep NULL id and gap on both
    engines. Output is click-proportional; every window is
    user-partitioned, never global."""
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
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).over(wu),
    )
    clk = marked.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "us",
        F.when(
            F.col("last_p_us").isNotNull()
            & (F.col("us") - F.col("last_p_us") <= F.lit(_DAY_US)),
            F.col("last_p_us"),
        ).alias("m_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("us").alias("p_us"),
        F.col("event_id").alias("p_event_id"),
    )
    matched = (
        clk.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_us") == F.col("m_us")),
            "left",
        )
        .groupBy("event_id", "us", "m_us")
        .agg(F.min("p_event_id").alias("matched_purchase_id"))
    )
    return matched.select(
        "event_id",
        "matched_purchase_id",
        (F.col("us") - F.col("m_us")).cast("long").alias("gap_us"),
    ).orderBy("event_id")
