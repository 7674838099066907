"""Stats tests, data quality, incremental maintenance / diff / retrieval shapes.

Split from the former single-file queries.py (round 4); registration
order within and across tier modules is preserved by the package
__init__ import order and pinned by tests/test_ann_recall.py.
"""

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.text import _duck_h60  # noqa: F401,E402

# ------------------------------------------ stats tests / data quality


@q(
    "ab_test_welch",
    """WITH e AS (SELECT user_id % 2 AS grp,
                         CAST(round(value * 100) AS BIGINT) AS vc
                  FROM events WHERE event_type = 'purchase'),
       st AS (SELECT grp, count(*) AS n,
                     sum(CAST(vc AS DOUBLE)) AS s,
                     sum(CAST(vc AS DOUBLE) * CAST(vc AS DOUBLE)) AS ss
              FROM e GROUP BY grp),
       w AS (SELECT a.n AS n1, b.n AS n2,
                    a.s / a.n AS m1, b.s / b.n AS m2,
                    (a.ss - a.s * a.s / a.n) / (a.n - 1) AS v1,
                    (b.ss - b.s * b.s / b.n) / (b.n - 1) AS v2
             FROM st a, st b WHERE a.grp = 0 AND b.grp = 1)
       SELECT n1, n2, round(m1 / 100.0, 4) AS mean1, round(m2 / 100.0, 4) AS mean2,
              round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
              round(pow(v1 / n1 + v2 / n2, 2) /
                    (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 4)
                AS welch_df
       FROM w""",
)
def _ab_test_welch(spark, sf_dir):
    """Welch's unequal-variance t-test between two experiment arms
    (portable assignment: user_id parity) on purchase values — the A/B
    analysis primitive. Group moments come from integer-cent sums
    folded as doubles (exact for these magnitudes, so fold order is
    irrelevant); the t statistic and Welch–Satterthwaite df are then
    one fixed IEEE expression, identical on both engines."""
    ev = _t(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    st = e.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vc").cast("double")).alias("s"),
        F.sum(F.col("vc").cast("double") * F.col("vc").cast("double")).alias("ss"),
    )
    a = st.filter(F.col("grp") == 0).alias("a")
    b = st.filter(F.col("grp") == 1).alias("b")
    j = a.crossJoin(b)
    m1, m2 = F.col("a.s") / F.col("a.n"), F.col("b.s") / F.col("b.n")
    v1 = (F.col("a.ss") - F.col("a.s") * F.col("a.s") / F.col("a.n")) / (F.col("a.n") - 1)
    v2 = (F.col("b.ss") - F.col("b.s") * F.col("b.s") / F.col("b.n")) / (F.col("b.n") - 1)
    se2 = v1 / F.col("a.n") + v2 / F.col("b.n")
    return j.select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n2"),
        _r4(m1 / 100.0, "mean1"),
        _r4(m2 / 100.0, "mean2"),
        _r4((m1 - m2) / F.sqrt(se2), "t_stat"),
        _r4(
            F.pow(se2, 2)
            / (
                F.pow(v1 / F.col("a.n"), 2) / (F.col("a.n") - 1)
                + F.pow(v2 / F.col("b.n"), 2) / (F.col("b.n") - 1)
            ),
            "welch_df",
        ),
    )


@q(
    "chi_square_independence",
    """WITH o AS (SELECT lang, source, count(*) AS obs
                  FROM documents GROUP BY lang, source),
       r AS (SELECT lang, sum(obs) AS rt FROM o GROUP BY lang),
       c AS (SELECT source, sum(obs) AS ct FROM o GROUP BY source),
       n AS (SELECT sum(obs) AS tot FROM o),
       cells AS (SELECT o.lang, o.source,
                        CAST(round(1000000.0 *
                          CAST((tot * obs - rt * ct) AS DOUBLE) * (tot * obs - rt * ct)
                          / (CAST(tot AS DOUBLE) * rt * ct)) AS BIGINT) AS term_u
                 FROM o JOIN r ON o.lang = r.lang
                        JOIN c ON o.source = c.source, n)
       SELECT CAST(sum(term_u) AS BIGINT) AS chi2_micro,
              round(CAST(sum(term_u) AS DOUBLE) / 1000000.0, 4) AS chi2,
              count(*) AS n_cells
       FROM cells""",
)
def _chi_square_independence(spark, sf_dir):
    """Chi-square independence test on the lang × source contingency
    table. Per-cell terms use the all-integer form
    (N·o − r·c)²/(N·r·c) — exact int64 numerators — and are *rounded
    to integer micro-units before summing*, so the final reduction is
    order-free integer addition (a plain double sum of 20 cells folds
    in engine-dependent order). The statistic is exact to 1e-6, which
    is far inside any significance-test tolerance."""
    d = _t(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("lang").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("tot"))
    num = F.col("tot") * F.col("obs") - F.col("rt") * F.col("ct")
    term = (
        F.lit(1000000.0)
        * num.cast("double")
        * num
        / (F.col("tot").cast("double") * F.col("rt") * F.col("ct"))
    )
    cells = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(F.round(term, 0).cast("long").alias("term_u"))
    )
    return cells.agg(
        F.sum("term_u").cast("long").alias("chi2_micro"),
        _r4(F.sum("term_u").cast("double") / 1000000.0, "chi2"),
        F.count(F.lit(1)).alias("n_cells"),
    )


@q(
    "dq_checks",
    """SELECT 'orphan_orders' AS check_name,
              (SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS violations
       UNION ALL
       SELECT 'orphan_lineitems',
              (SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
       UNION ALL
       SELECT 'dup_orderkeys',
              (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                     GROUP BY o_orderkey HAVING count(*) > 1))
       UNION ALL
       SELECT 'null_totalprice',
              (SELECT count(*) FROM orders WHERE o_totalprice IS NULL)
       UNION ALL
       SELECT 'nonpositive_price',
              (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
       UNION ALL
       SELECT 'bad_discount',
              (SELECT count(*) FROM lineitem
               WHERE l_discount < 0 OR l_discount > 1)
       UNION ALL
       SELECT 'negative_quantity',
              (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)""",
)
def _dq_checks(spark, sf_dir):
    """Data-quality audit suite: referential orphans (anti joins),
    key-uniqueness violations, null/range checks — one long-format
    (check_name, violations) frame. Each check is a single scan or
    anti-join; at 100 TB the range/null checks fuse into one pass per
    table and the orphan checks broadcast the dimension keys."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")

    def one(name: str, cnt_df) -> DataFrame:
        return cnt_df.select(
            F.lit(name).alias("check_name"), F.col("v").cast("long").alias("violations")
        )

    # fuse the per-table checks (the docstring's 100 TB contract, now
    # actually in the plan): dup/null/nonpositive ride ONE keyed orders
    # pass (the null/range sums are free map-side partials on the
    # groupBy dup detection needs anyway); both lineitem range checks
    # ride one scan. The 1-row fused stats are pinned — each feeds
    # several long-format rows.
    o_stats = (
        o.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
                "nl"
            ),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("np"),
        )
        .agg(
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("dup"),
            F.sum("nl").alias("nulls"),
            F.sum("np").alias("nonpos"),
        )
        .localCheckpoint(eager=True)
    )
    li_stats = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("bad_disc"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("neg_qty"),
    ).localCheckpoint(eager=True)
    checks = [
        one("orphan_orders",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(F.count(F.lit(1)).alias("v"))),
        one("orphan_lineitems",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(F.count(F.lit(1)).alias("v"))),
        one("dup_orderkeys", o_stats.select(F.col("dup").alias("v"))),
        one("null_totalprice", o_stats.select(F.col("nulls").alias("v"))),
        one("nonpositive_price", o_stats.select(F.col("nonpos").alias("v"))),
        one("bad_discount", li_stats.select(F.col("bad_disc").alias("v"))),
        one("negative_quantity", li_stats.select(F.col("neg_qty").alias("v"))),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@q(
    "price_quantile_sketch",
    """WITH b AS (SELECT o_orderpriority,
                         length(format('{:b}', CAST(round(o_totalprice * 100) AS BIGINT))) AS bin
                  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
       c AS (SELECT o_orderpriority, bin, count(*) AS c FROM b GROUP BY 1, 2),
       cum AS (SELECT o_orderpriority, bin,
                      sum(c) OVER (PARTITION BY o_orderpriority ORDER BY bin ASC) AS cum,
                      sum(c) OVER (PARTITION BY o_orderpriority) AS n
               FROM c),
       x AS (SELECT cum.*, q FROM cum,
             (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q)),
       hit AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority, q
                                            ORDER BY bin ASC) AS rn
               FROM x WHERE cum >= ceil(q * n))
       SELECT o_orderpriority, q, CAST(n AS BIGINT) AS n,
              (1::BIGINT << (bin - 1)) AS est_lower_bound
       FROM hit WHERE rn = 1""",
)
def _price_quantile_sketch(spark, sf_dir):
    """Mergeable log₂-histogram quantile sketch
    (operators/sketches.py:log_histogram_quantiles): grouped p50/p90/p99
    from a ~64-counter power-of-two synopsis — the scale path where an
    exact global sort is off the table. Binning via binary-string
    length (exact where floor(ln/ln2) misrounds at powers of two);
    answers are integer bin lower bounds — bit-reproducible, so this
    approximate aggregate gets an exact oracle MATCH (pairs with the
    exact `value_percentiles`)."""
    from redshells_spark.operators.sketches import log_histogram_quantiles

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("vc")
    )
    return log_histogram_quantiles(o, ["o_orderpriority"], "vc", [0.5, 0.9, 0.99])


@q(
    "rolling_distinct_users",
    f"""WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS bk,
                          {_duck_h60("user_id")} AS h
                   FROM events),
       kept AS (SELECT bk, h FROM (
                  SELECT bk, h, row_number() OVER (PARTITION BY bk ORDER BY h ASC) AS rn
                  FROM e) WHERE rn <= 64),
       f AS (SELECT bk + off AS target, h
             FROM kept, (SELECT unnest(generate_series(0, 6)) AS off)),
       p AS (SELECT DISTINCT bk AS target FROM kept),
       m AS (SELECT DISTINCT target, h FROM f JOIN p USING (target)),
       top AS (SELECT target, h FROM (
                 SELECT target, h, row_number() OVER (PARTITION BY target ORDER BY h ASC) AS rn
                 FROM m) WHERE rn <= 64),
       a AS (SELECT target, count(*) AS n_kept, max(h) AS hk FROM top GROUP BY 1)
       SELECT target AS bucket, n_kept::BIGINT AS n_kept,
              round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                    ELSE 63.0 * 1152921504606846976.0 / hk::DOUBLE END, 4)
                AS rolling_distinct_est
       FROM a""",
)
def _rolling_distinct_users(spark, sf_dir):
    """7-day rolling distinct users via KMV sketch merging
    (operators/sketches.py:kmv_rolling_distinct): per-day k-minimum
    hash sets built once, fanned to the ≤7 windows they serve (an
    explode, not a range join), deduped, re-ranked, estimated.
    Raw rows are scanned once; cross-window shuffles carry 8-byte
    hashes only. A COUNT(DISTINCT) OVER a sliding window has no
    native relational form — the mergeable sketch IS the standard
    scale answer, and the portable hashing makes it oracle-exact."""
    from redshells_spark.operators.sketches import kmv_rolling_distinct

    ev = _t(spark, sf_dir, "events")
    e = ev.select(event_us(ev, "ts").alias("__us"), "user_id").select(
        F.expr("`__us` div 86400000000").alias("bk"), "user_id"
    )
    return kmv_rolling_distinct(e, "bk", "user_id", window_buckets=7, k=64)


# --------------------------- incremental maintenance / diff / retrieval

_INCR_CUTOFF_DAY = 20  # day index within the 30-day event window


@q(
    "incremental_agg_update",
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000
                           - (SELECT min(epoch_us(ts) // 86400000000) FROM events) AS day,
                         CAST(round(value * 100) AS BIGINT) AS vc
                  FROM events)
       SELECT user_id, count(*) AS n_events,
              CAST(sum(vc) AS BIGINT) AS total_c
       FROM e GROUP BY user_id""",
)
def _incremental_agg_update(spark, sf_dir):
    """Incremental aggregate maintenance: the base aggregate (days
    < 20) is updated with a delta partial-aggregate (days ≥ 20) via a
    keyed merge — base rows untouched by the delta pass through
    unchanged; the oracle is the FULL recompute, so the hash MATCH is
    a proof that incremental == from-scratch. This is the maintenance
    loop every continuously-ingested 100 TB aggregate runs: only the
    delta is scanned and shuffled at update time, and sum/count
    merge associatively (avg/std derive from them downstream)."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        event_us(ev, "ts").alias("__us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    ).withColumn("day", F.expr("`__us` div 86400000000"))
    # scalar anchor stays lazy: broadcast the 1-row min instead of an
    # eager collect — the plan carries it as a BroadcastExchange
    day0 = e.agg(F.min("day").alias("__day0"))
    e = e.crossJoin(F.broadcast(day0)).withColumn(
        "day", F.col("day") - F.col("__day0")
    )

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("vc").alias("total_c")
        )

    base = agg(e.filter(F.col("day") < _INCR_CUTOFF_DAY))
    delta = agg(e.filter(F.col("day") >= _INCR_CUTOFF_DAY))
    merged = (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("n_events").cast("long").alias("n_events"), F.sum("total_c").alias("total_c"))
    )
    return merged


@q(
    "snapshot_diff",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                         epoch_us(ts) // 86400000000
                           - (SELECT min(epoch_us(ts) // 86400000000) FROM events) AS day
                  FROM events),
       v1 AS (SELECT user_id, event_type AS state FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY us DESC, event_id DESC) AS rn
                FROM e WHERE day < 20) WHERE rn = 1),
       v2 AS (SELECT user_id, event_type AS state FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY us DESC, event_id DESC) AS rn
                FROM e) WHERE rn = 1)
       SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
              v1.state AS old_state, v2.state AS new_state,
              CASE WHEN v1.user_id IS NULL THEN 'added'
                   WHEN v2.user_id IS NULL THEN 'removed'
                   WHEN v1.state <> v2.state THEN 'changed'
                   ELSE 'unchanged' END AS diff
       FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id""",
)
def _snapshot_diff(spark, sf_dir):
    """Snapshot diff: latest-state-per-key at two versions (CDC
    compaction twice — cf. `latest_by_key`), full-outer-joined and
    classified added/removed/changed/unchanged. The audit primitive
    for validating incremental pipelines against rebuilds. One
    shuffle per snapshot + one keyed join; no row-level history
    replay."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", event_us(ev, "ts").alias("us"), "event_id"
    ).withColumn("day", F.expr("us div 86400000000"))
    day0 = e.agg(F.min("day").alias("__day0"))
    e = e.crossJoin(F.broadcast(day0)).withColumn("day", F.col("day") - F.col("__day0"))

    def latest(df):
        w = Window.partitionBy("user_id").orderBy(F.col("us").desc(), F.col("event_id").desc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )

    v1 = latest(e.filter(F.col("day") < _INCR_CUTOFF_DAY)).alias("v1")
    v2 = latest(e).alias("v2")
    j = v1.join(v2, F.col("v1.user_id") == F.col("v2.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("v1.user_id"), F.col("v2.user_id")).alias("user_id"),
        F.col("v1.state").alias("old_state"),
        F.col("v2.state").alias("new_state"),
        F.when(F.col("v1.user_id").isNull(), "added")
        .when(F.col("v2.user_id").isNull(), "removed")
        .when(F.col("v1.state") != F.col("v2.state"), "changed")
        .otherwise("unchanged")
        .alias("diff"),
    )


_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle_sql() -> str:
    terms = []
    for kw in KEYWORDS:
        terms.append(
            f"""coalesce((SELECT ln((nd.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (t.tf * {_BM25_K1 + 1.0}) /
                   (t.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / ad.avgdl))
               FROM tf t JOIN df ON df.token = t.token, nd, ad
               WHERE t.doc_id = d.doc_id AND t.token = '{kw}'), 0.0)"""
        )
    score = "\n             + ".join(terms)
    return f"""WITH {_TOK_SQL},
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       nd AS (SELECT count(*) AS n FROM dl),
       ad AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok
              WHERE token IN {KEYWORDS!r} GROUP BY doc_id, token),
       df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
       SELECT d.doc_id, dl.dl AS doc_len,
              round({score}, 4) AS bm25
       FROM documents d JOIN dl ON dl.doc_id = d.doc_id
       WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tf)"""


@q("bm25_keyword_search", _bm25_oracle_sql())
def _bm25_keyword_search(spark, sf_dir):
    """BM25 relevance scoring (Robertson–Spärck Jones) for a fixed
    keyword query over the corpus — the classic retrieval scorer the
    tfidf tier stops short of. Fully relational: tf/df/dl/avgdl from
    two aggregations; per-keyword score terms pivot into fixed columns
    so the final score is a FIXED-ORDER sum (a bare sum() over terms
    would fold doubles in engine-dependent order). Only docs matching
    ≥1 keyword are scored — the semi-join keeps the scan sparse."""
    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("tokens").alias("token"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    nd_avg = dl.agg(
        F.count(F.lit(1)).alias("n"), (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    tf = (
        toks.filter(F.col("token").isin(*KEYWORDS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # pivot tf and df into per-keyword columns (explicit value list)
    tfp = tf.groupBy("doc_id").pivot("token", list(KEYWORDS)).agg(F.first("tf"))
    scored = (
        tfp.join(dl, "doc_id")
        .crossJoin(F.broadcast(nd_avg))
        .crossJoin(
            F.broadcast(
                df_.groupBy().pivot("token", list(KEYWORDS)).agg(F.first("df"))
            ).select(*[F.col(kw).alias(f"df_{kw}") for kw in KEYWORDS])
        )
    )
    norm = F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    score = None
    for kw in KEYWORDS:
        idf = F.log(
            (F.col("n") - F.col(f"df_{kw}") + 0.5) / (F.col(f"df_{kw}") + 0.5) + 1.0
        )
        term = idf * (F.col(kw) * F.lit(_BM25_K1 + 1.0)) / (
            F.col(kw) + F.lit(_BM25_K1) * norm
        )
        term = F.coalesce(term, F.lit(0.0))
        score = term if score is None else score + term
    return scored.select("doc_id", F.col("dl").alias("doc_len"), _r4(score, "bm25"))


