"""Round-6 session-2 batch 7: conversion-latency order statistics,
over-dispersion (Poisson) checks, and a Simpson's-paradox audit —
product/metrics analytics, all exact-integer.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.timeutil import event_us  # noqa: E402

# ------------------------------------------------- time-to-convert


@q(
    "time_to_convert_quantiles",
    """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS first_view
              FROM events WHERE event_type = 'view' GROUP BY 1),
       p AS (SELECT user_id, min(epoch_us(ts)) AS first_purchase
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
       d AS (SELECT v.user_id,
                    CAST(p.first_purchase - v.first_view AS BIGINT) AS lat_us
             FROM v JOIN p USING (user_id)
             WHERE p.first_purchase >= v.first_view),
       rk AS (SELECT lat_us,
                     row_number() OVER (ORDER BY lat_us ASC) AS i,
                     CAST(count(*) OVER () AS BIGINT) AS n
              FROM d)
       SELECT CAST(max(n) AS BIGINT) AS n_converted,
              CAST(min(lat_us) AS BIGINT) AS min_us,
              CAST(max(CASE WHEN (2 * i >= n + 1 AND 2 * (i - 1) < n + 1)
                            OR (i = n AND 2 * n < n + 1) THEN lat_us END) AS BIGINT)
                  AS p50_us,
              CAST(max(CASE WHEN (10 * i >= 9 * (n + 1) AND 10 * (i - 1) < 9 * (n + 1))
                            OR (i = n AND 10 * n < 9 * (n + 1)) THEN lat_us END) AS BIGINT)
                  AS p90_us,
              CAST(max(lat_us) AS BIGINT) AS max_us
       FROM rk""",
)
def _time_to_convert_quantiles(spark, sf_dir):
    """Conversion latency (first view → first purchase per user) as
    EXACT order statistics: p50/p90 are the ceil(q·(n+1))-th smallest
    microsecond values selected with pure integer rank inequalities —
    no interpolation, no float percentile. Two map-combined min
    aggregations over events, then ranks via data/sharding.py
    distributed_rank (range shuffle + per-partition row_number +
    broadcast offset map — bit-identical to the naive global window
    with NO single-reducer sort, so the plan holds at 10^9 converted
    users) and n from a broadcast 1-row count, not a global count
    window. The product-analytics latency report next to
    funnel_conversion."""
    ev = _t(spark, sf_dir, "events")
    us = event_us(ev).alias("us")
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", us)
        .groupBy("user_id")
        .agg(F.min("us").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us)
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase"))
    )
    d = (
        v.join(p, "user_id")
        .filter(F.col("first_purchase") >= F.col("first_view"))
        .select((F.col("first_purchase") - F.col("first_view")).cast("long").alias("lat_us"))
    )
    from redshells_spark.data.sharding import distributed_rank

    nrow = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    rk = (
        distributed_rank(d, [F.col("lat_us").asc()], out_col="__i0")
        .crossJoin(F.broadcast(nrow))
        .select("lat_us", (F.col("__i0") + 1).cast("long").alias("i"), "n")
    )
    # min(n, ceil(num/den·(n+1)))-th order statistic: the clamp keeps
    # small samples (ceil(q(n+1)) > n) on the last value instead of NULL
    pick = lambda num, den: F.max(  # noqa: E731
        F.when(
            (
                (F.lit(den) * F.col("i") >= F.lit(num) * (F.col("n") + 1))
                & (F.lit(den) * (F.col("i") - 1) < F.lit(num) * (F.col("n") + 1))
            )
            | (
                (F.col("i") == F.col("n"))
                & (F.lit(den) * F.col("n") < F.lit(num) * (F.col("n") + 1))
            ),
            F.col("lat_us"),
        )
    ).cast("long")
    return rk.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min("lat_us").cast("long").alias("min_us"),
        pick(1, 2).alias("p50_us"),
        pick(9, 10).alias("p90_us"),
        F.max("lat_us").cast("long").alias("max_us"),
    )


# ---------------------------------------------------- dispersion index


@q(
    "event_dispersion_index",
    """WITH c AS (
         SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       a AS (SELECT event_type,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(x * x) AS BIGINT) AS sxx
             FROM c GROUP BY 1)
       SELECT event_type, n, sx AS total_events,
              CAST((n * sxx - sx * sx) * 10000 // ((n - 1) * sx) AS BIGINT)
                  AS vmr_e4
       FROM a WHERE n > 1 AND sx > 0""",
)
def _event_dispersion_index(spark, sf_dir):
    """Variance-to-mean ratio of per-user event counts per type — the
    Poisson over-dispersion check (VMR = 1 under Poisson arrivals;
    >> 1 = bursty/bot-like, << 1 = quota-like). Exact e4 fixed point:
    VMR = (n·Σx² − (Σx)²) / ((n−1)·Σx) over int64 sums of bounded
    per-user counts — no float moments. Two map-combined aggregations,
    nothing else."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    a = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return a.filter((F.col("n") > 1) & (F.col("sx") > 0)).select(
        "event_type",
        "n",
        F.col("sx").alias("total_events"),
        F.expr(
            "cast((n * sxx - sx * sx) * 10000 div ((n - 1) * sx) as bigint)"
        ).alias("vmr_e4"),
    )


# ------------------------------------------------- Simpson's paradox


@q(
    "simpson_rate_check",
    """WITH b AS (
         SELECT event_type, CAST(user_id % 2 AS BIGINT) AS grp,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
         FROM events WHERE event_type IN ('view', 'purchase', 'click')),
       st AS (
         SELECT grp,
                CASE WHEN event_type = 'click' THEN 'click' ELSE 'view_purchase' END AS stratum,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(hit) AS BIGINT) AS k
         FROM b GROUP BY 1, 2),
       pooled AS (
         SELECT grp, CAST(sum(n) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS k
         FROM st GROUP BY 1),
       pw AS (
         SELECT max(CASE WHEN grp = 0 THEN k END) AS k0,
                max(CASE WHEN grp = 0 THEN n END) AS n0,
                max(CASE WHEN grp = 1 THEN k END) AS k1,
                max(CASE WHEN grp = 1 THEN n END) AS n1
         FROM pooled),
       sw AS (
         SELECT stratum,
                max(CASE WHEN grp = 0 THEN k END) AS k0,
                max(CASE WHEN grp = 0 THEN n END) AS n0,
                max(CASE WHEN grp = 1 THEN k END) AS k1,
                max(CASE WHEN grp = 1 THEN n END) AS n1
         FROM st GROUP BY 1)
       SELECT 'pooled' AS stratum, CAST(k0 AS BIGINT) AS k0, CAST(n0 AS BIGINT) AS n0,
              CAST(k1 AS BIGINT) AS k1, CAST(n1 AS BIGINT) AS n1,
              CAST(CASE WHEN k0 * n1 > k1 * n0 THEN 1
                        WHEN k0 * n1 < k1 * n0 THEN -1 ELSE 0 END AS BIGINT)
                  AS grp0_leads
       FROM pw
       UNION ALL
       SELECT stratum, CAST(k0 AS BIGINT), CAST(n0 AS BIGINT),
              CAST(k1 AS BIGINT), CAST(n1 AS BIGINT),
              CAST(CASE WHEN k0 * n1 > k1 * n0 THEN 1
                        WHEN k0 * n1 < k1 * n0 THEN -1 ELSE 0 END AS BIGINT)
       FROM sw""",
)
def _simpson_rate_check(spark, sf_dir):
    """Simpson's-paradox audit: purchase-rate comparison between two
    user groups, pooled AND within strata, with the lead decided by
    EXACT cross-multiplication (k0·n1 vs k1·n0 — never a float rate).
    A pooled lead that flips sign in every stratum is the aggregation
    artifact every metrics review must rule out. One aggregate over
    (group, stratum) cells; the paradox test itself is integer
    comparisons on a handful of rows."""
    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("view", "purchase", "click")).select(
        (F.col("user_id") % 2).cast("long").alias("grp"),
        F.when(F.col("event_type") == "click", "click")
        .otherwise("view_purchase")
        .alias("stratum"),
        (F.col("event_type") == "purchase").cast("long").alias("hit"),
    )
    st = b.groupBy("grp", "stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("k"),
    )

    def widen(df, label_col):
        return df.groupBy(label_col).agg(
            F.max(F.when(F.col("grp") == 0, F.col("k"))).cast("long").alias("k0"),
            F.max(F.when(F.col("grp") == 0, F.col("n"))).cast("long").alias("n0"),
            F.max(F.when(F.col("grp") == 1, F.col("k"))).cast("long").alias("k1"),
            F.max(F.when(F.col("grp") == 1, F.col("n"))).cast("long").alias("n1"),
        )

    pooled = widen(
        st.groupBy("grp").agg(F.sum("n").alias("n"), F.sum("k").alias("k"))
        .withColumn("stratum", F.lit("pooled")),
        "stratum",
    )
    sw = widen(st, "stratum")
    lead = (
        F.when(F.col("k0") * F.col("n1") > F.col("k1") * F.col("n0"), 1)
        .when(F.col("k0") * F.col("n1") < F.col("k1") * F.col("n0"), -1)
        .otherwise(0)
        .cast("long")
        .alias("grp0_leads")
    )
    return pooled.unionByName(sw).select("stratum", "k0", "n0", "k1", "n1", lead)


# ---------------------------------------------------- Benford audit

import math as _math

_BENFORD_P_E6 = {d: int(round(_math.log10(1 + 1 / d) * 1_000_000)) for d in range(1, 10)}
_BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    p_rows = ", ".join(f"({d}, {_BENFORD_P_E6[d]}, {_BENFORD_P[d]!r})" for d in range(1, 10))
    return f"""WITH u AS (
         SELECT CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
         FROM orders),
       d AS (
         SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
         FROM u WHERE cents > 0),
       obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
       n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs),
       pb(digit, p_e6, p) AS (VALUES {p_rows}),
       terms AS (
         SELECT pb.digit, coalesce(obs.n_obs, 0) AS n_obs,
                CAST(pb.p_e6 AS BIGINT) AS p_benford_e6,
                CAST(floor(
                  (coalesce(obs.n_obs, 0) - n.n_total * CAST(pb.p AS DOUBLE))
                  * (coalesce(obs.n_obs, 0) - n.n_total * CAST(pb.p AS DOUBLE))
                  / (n.n_total * CAST(pb.p AS DOUBLE)) * 1000000 + CAST(0.5 AS DOUBLE))
                  AS BIGINT) AS chi2_term_e6
         FROM pb LEFT JOIN obs USING (digit), n)
       SELECT CAST(digit AS BIGINT) AS digit,
              CAST(n_obs AS BIGINT) AS n_obs, p_benford_e6, chi2_term_e6
       FROM terms
       UNION ALL
       SELECT CAST(0 AS BIGINT), CAST(sum(n_obs) AS BIGINT),
              CAST(1000000 AS BIGINT), CAST(sum(chi2_term_e6) AS BIGINT)
       FROM terms"""


@q("benford_digit_audit", _benford_oracle())
def _benford_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / unit-mixing detector (Benford 1938; Nigrini's
    forensic-accounting standard). First digits come from the STRING
    of the exact cent units (no float log10 on data); expected
    proportions log10(1+1/d) are plan-time literals shared by both
    engines; each chi-square term is one fixed IEEE expression
    truncated to e6 int64 so the digit=0 TOTAL row's chi2 sum is exact
    integer addition. One map-combined count by digit — nothing else
    touches the fact table."""
    o = _t(spark, sf_dir, "orders")
    cents = o.select(money_units(F.col("o_totalprice"), 100).alias("cents")).filter(
        F.col("cents") > 0
    )
    obs = (
        cents.select(
            F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    pb = spark.createDataFrame(
        [(d, _BENFORD_P_E6[d], _BENFORD_P[d]) for d in range(1, 10)],
        "digit long, p_e6 long, p double",
    )
    n = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    # nz, not F.col("n_obs"), in the chi2 term: inside this select the
    # raw column is still the LEFT-join output — NULL for a digit with
    # zero observations — and a NULL there would both blank the term
    # and silently drop that digit's expected-count penalty from the
    # TOTAL row. The oracle coalesces; so must we.
    nz = F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
    terms = (
        pb.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            nz.alias("n_obs"),
            F.col("p_e6").cast("long").alias("p_benford_e6"),
            F.floor(
                (nz * F.lit(1.0) - F.col("n_total") * F.col("p"))
                * (nz * F.lit(1.0) - F.col("n_total") * F.col("p"))
                / (F.col("n_total") * F.col("p"))
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("chi2_term_e6"),
        )
    )
    total = terms.agg(
        F.lit(0).cast("long").alias("digit"),
        F.sum("n_obs").cast("long").alias("n_obs"),
        F.lit(1000000).cast("long").alias("p_benford_e6"),
        F.sum("chi2_term_e6").cast("long").alias("chi2_term_e6"),
    )
    return terms.unionByName(total)


# ---------------------------------------------- rank normalization


@q(
    "rank_normalize_scores",
    """WITH r AS (
         SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars ASC, doc_id ASC) AS rk,
                CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         FROM documents)
       SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
              CAST((rk - 1) * 1000000 // (n - 1) AS BIGINT) AS pr_e6
       FROM r WHERE n > 1""",
)
def _rank_normalize_scores(spark, sf_dir):
    """Rank-based score normalization per source: percent-rank of the
    quality proxy (n_chars) as exact e6 integers — the standard move
    before mixing quality scores ACROSS sources whose raw scales
    differ (a CommonCrawl perplexity is not a Wikipedia perplexity).
    Ties broken on doc_id so both engines rank identically; one window
    per source, zero floats."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    return r.filter(F.col("n") > 1).select(
        "doc_id",
        "source",
        "n_chars",
        # rk is int32 (row_number): widen BEFORE the 1e6 multiply —
        # (rk-1)*1e6 overflows int at >2147 rows/group (f10 catch)
        F.expr("cast(cast(rk - 1 as bigint) * 1000000 div (n - 1) as bigint)").alias("pr_e6"),
    )


# ------------------------------------------------- code-switch flags

_CS_LANGS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "es": ("el", "los", "las", "es", "no", "una", "por", "con", "para", "del"),
    "fr": ("le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que"),
}


def _cs_oracle() -> str:
    def hits(slice_sql: str, lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in _CS_LANGS[lang])
        return f"len(list_filter({slice_sql}, t -> t IN ({lst})))"

    def argmax(prefix: str) -> str:
        g = f"greatest({prefix}_de, {prefix}_en, {prefix}_es, {prefix}_fr)"
        return f"""CASE WHEN {g} = 0 THEN 'und'
                WHEN {prefix}_de = {g} THEN 'de'
                WHEN {prefix}_en = {g} THEN 'en'
                WHEN {prefix}_es = {g} THEN 'es'
                ELSE 'fr' END"""

    h1 = "list_slice(toks, 1, len(toks) // 2)"
    h2 = "list_slice(toks, len(toks) // 2 + 1, len(toks))"
    hit_cols = ", ".join(
        f"{hits(h1, lang)} AS h1_{lang}, {hits(h2, lang)} AS h2_{lang}"
        for lang in sorted(_CS_LANGS)
    )
    return f"""WITH tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         FROM documents),
       h AS (SELECT doc_id, {hit_cols} FROM tok WHERE len(toks) >= 4),
       l AS (SELECT doc_id, {argmax("h1")} AS lang_h1, {argmax("h2")} AS lang_h2
             FROM h)
       SELECT doc_id, lang_h1, lang_h2,
              CAST(CASE WHEN lang_h1 <> lang_h2 AND lang_h1 <> 'und'
                         AND lang_h2 <> 'und' THEN 1 ELSE 0 END AS BIGINT)
                  AS code_switch
       FROM l"""


@q("code_switch_flags", _cs_oracle())
def _code_switch_flags(spark, sf_dir):
    """Within-document code-switch detection: language-ID the first
    and second token halves independently (the same stopword-hit
    argmax detect_language uses, identical tie rules) and flag docs
    whose halves disagree with confident labels — the data-cleaning
    audit that catches concatenation artifacts and mixed-language
    scrapes which a whole-doc language filter waves through. One
    map-only pass: slices, filters, and the argmax are all codegen."""
    toks = _tokens(spark, sf_dir)
    half1 = F.slice(F.col("tokens"), 1, (F.size("tokens") / 2).cast("int"))
    half2 = F.slice(
        F.col("tokens"),
        (F.size("tokens") / 2).cast("int") + 1,
        F.size("tokens"),
    )

    def hits(col, lang):
        kws = _CS_LANGS[lang]
        return F.size(F.filter(col, lambda t: t.isin(*kws)))

    h = toks.filter(F.size("tokens") >= 4).select(
        "doc_id",
        *[hits(half1, lang).alias(f"h1_{lang}") for lang in sorted(_CS_LANGS)],
        *[hits(half2, lang).alias(f"h2_{lang}") for lang in sorted(_CS_LANGS)],
    )

    def argmax(prefix):
        g = F.greatest(*[F.col(f"{prefix}_{la}") for la in sorted(_CS_LANGS)])
        expr = F.when(g == 0, "und")
        for la in sorted(_CS_LANGS):
            expr = expr.when(F.col(f"{prefix}_{la}") == g, la)
        return expr

    l = h.select(
        "doc_id", argmax("h1").alias("lang_h1"), argmax("h2").alias("lang_h2")
    )
    return l.select(
        "doc_id",
        "lang_h1",
        "lang_h2",
        (
            (F.col("lang_h1") != F.col("lang_h2"))
            & (F.col("lang_h1") != "und")
            & (F.col("lang_h2") != "und")
        )
        .cast("long")
        .alias("code_switch"),
    )
