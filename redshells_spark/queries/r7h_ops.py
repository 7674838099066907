"""Round-7 batch 8: forecasting, layout, and eval-completion tier —
Holt's linear-trend forecast (the double-exponential-smoothing
recurrence, evaluated identically in both engines), a zone-map pruning
effectiveness report (the lakehouse data-layout readout), a pairwise
source EMD matrix over document lengths, tokenizer OOV rates per
language, Cohen's-d/Hedges-g effect sizes per market segment, and an
MCC threshold scan completing the classifier-eval family.

House determinism rules: counts and cumulative sums exact int64;
the Holt recurrence is rounded half-up to 10 decimals per step on
BOTH engines (the markov_attribution idiom — Python Decimal half-up
matches DuckDB round()); other statistics are one fixed IEEE tree over
exact integers; windows only over score/day/bucket level tables.
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


# -------------------------------------------- Holt linear forecast


@q(
    "holt_linear_forecast",
    f"""WITH RECURSIVE {_DAILY_SQL},
       idx AS (SELECT t, v,
                      CAST(row_number() OVER (ORDER BY t ASC) AS BIGINT) AS i
               FROM s),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
       it(i, l, b) AS (
         SELECT CAST(1 AS BIGINT),
                CAST(x1.v AS DOUBLE),
                CAST(x2.v - x1.v AS DOUBLE)
         FROM idx x1, idx x2 WHERE x1.i = 1 AND x2.i = 2
         UNION ALL
         SELECT it.i + 1,
                round(CAST(0.3 AS DOUBLE) * CAST(x.v AS DOUBLE)
                      + CAST(0.7 AS DOUBLE) * (it.l + it.b), 10),
                round(CAST(0.1 AS DOUBLE)
                      * (round(CAST(0.3 AS DOUBLE) * CAST(x.v AS DOUBLE)
                               + CAST(0.7 AS DOUBLE) * (it.l + it.b), 10)
                         - it.l)
                      + CAST(0.9 AS DOUBLE) * it.b, 10)
         FROM it JOIN idx x ON x.i = it.i + 1
         CROSS JOIN nn WHERE it.i + 1 <= nn.n)
       SELECT idx.t, idx.v, it.l AS level, it.b AS trend,
              round(it.l + it.b, 10) AS fcst_next
       FROM it JOIN idx ON idx.i = it.i
       ORDER BY idx.t""",
)
def _holt_linear_forecast(spark, sf_dir):
    """Holt's linear-trend (double exponential smoothing, Holt 1957)
    over the dense daily purchase series, alpha=0.3 / beta=0.1:
    l_t = a*x_t + (1-a)(l+b), b_t = B*(l_t - l) + (1-B)*b, each step
    rounded HALF-UP to 10 decimals on both engines so the recurrence
    is engine-exact (the markov_attribution bounded-iteration idiom:
    the day relation is time-bounded — ~a month here, <=a few thousand
    rows at any corpus scale — so the sequential solve runs on the
    collected level table while the fact-scale work stays in the one
    map-combined daily groupBy; the DuckDB oracle is the identical
    recursion as a recursive CTE). fcst_next = l+b is the one-step-
    ahead forecast the seasonal-naive MASE gate benchmarks against."""
    from redshells_spark.operators.markov import _round_half_up as rhu

    s = _daily_purchases(spark, sf_dir).orderBy("t").collect()
    schema_cols = [
        T.StructField("t", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("fcst_next", T.DoubleType()),
    ]
    if len(s) < 2:
        # degenerate corpus (<2 days): the recursive-CTE oracle's
        # anchor needs i=1 AND i=2, so it returns no rows — mirror
        # that instead of raising IndexError on s[1]
        return spark.createDataFrame([], T.StructType(schema_cols))
    l = float(s[0]["v"])
    b = float(s[1]["v"] - s[0]["v"])
    rows = [Row(t=int(s[0]["t"]), v=int(s[0]["v"]), level=l, trend=b,
                fcst_next=rhu(l + b, 10))]
    for r in s[1:]:
        l_new = rhu(0.3 * float(r["v"]) + 0.7 * (l + b), 10)
        b = rhu(0.1 * (l_new - l) + 0.9 * b, 10)
        l = l_new
        rows.append(
            Row(t=int(r["t"]), v=int(r["v"]), level=l, trend=b,
                fcst_next=rhu(l + b, 10))
        )
    schema = T.StructType(
        [
            T.StructField("t", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("fcst_next", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("t")


# ---------------------------------------------- zone-map pruning


@q(
    "zonemap_prune_report",
    """WITH o AS (SELECT o_orderkey AS k,
                CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
         FROM orders),
       bb AS (SELECT CAST(min(k) AS BIGINT) AS mnk, CAST(max(k) AS BIGINT) AS mxk,
                     CAST(min(day) AS BIGINT) AS mnd,
                     CAST(max(day) AS BIGINT) AS mxd
              FROM o),
       pt AS (SELECT 'key_clustered' AS layout,
                     CAST((o.k - bb.mnk) * 64 // (bb.mxk - bb.mnk + 1)
                          AS BIGINT) AS chunk, o.day
              FROM o CROSS JOIN bb
              UNION ALL
              SELECT 'date_clustered',
                     CAST((o.day - bb.mnd) * 64 // (bb.mxd - bb.mnd + 1)
                          AS BIGINT), o.day
              FROM o CROSS JOIN bb),
       ch AS (SELECT layout, chunk, CAST(min(day) AS BIGINT) AS mn_d,
                     CAST(max(day) AS BIGINT) AS mx_d
              FROM pt GROUP BY 1, 2),
       preds AS (SELECT r.m,
                        CAST(bb.mnd + (bb.mxd - bb.mnd + 1) * r.m // 12
                             AS BIGINT) AS lo,
                        CAST(bb.mnd + (bb.mxd - bb.mnd + 1) * (r.m + 1) // 12
                             - 1 AS BIGINT) AS hi
                 FROM range(0, 12) r(m) CROSS JOIN bb),
       scan AS (SELECT ch.layout, preds.m,
                       CAST(sum(CASE WHEN ch.mx_d < preds.lo
                                       OR ch.mn_d > preds.hi
                                     THEN 0 ELSE 1 END) AS BIGINT) AS scanned
                FROM ch CROSS JOIN preds GROUP BY 1, 2),
       nc AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_chunks
              FROM ch GROUP BY 1)
       SELECT nc.layout, nc.n_chunks,
              CAST(sum(scan.scanned) AS BIGINT) AS chunks_scanned_12preds,
              CAST(sum(scan.scanned) * 1000000 // (12 * nc.n_chunks)
                   AS BIGINT) AS avg_scan_fraction_e6
       FROM scan JOIN nc USING (layout)
       GROUP BY 1, 2 ORDER BY nc.layout""",
)
def _zonemap_prune_report(spark, sf_dir):
    """Zone-map (min/max data-skipping) effectiveness report — the
    data-layout decision every lakehouse makes: split orders into 64
    fixed chunks under two layouts (key-clustered vs date-clustered),
    record each chunk's orderdate min/max zone map, and measure what
    fraction of chunks 12 equal-width date-range predicates must scan.
    Date-clustered layouts prune to ~1/12; key-clustered zone maps
    span everything and prune nothing — the quantitative argument for
    sort/z-order before write (compaction_plan / zorder_events'
    companion readout). All chunk ids, zone bounds, and fractions are
    exact integer arithmetic; relations are 64 chunks x 12 predicates."""
    o0 = _t(spark, sf_dir, "orders")
    o = o0.select(
        F.col("o_orderkey").alias("k"),
        event_us(o0, "o_orderdate").alias("us"),
    ).select("k", F.expr(f"cast(us div {_DAY_US} as long)").alias("day"))
    bb = o.agg(
        F.min("k").cast("long").alias("mnk"),
        F.max("k").cast("long").alias("mxk"),
        F.min("day").cast("long").alias("mnd"),
        F.max("day").cast("long").alias("mxd"),
    ).localCheckpoint(eager=True)  # 1 row; three consumers (both
    # layout projections + the predicate grid) re-ran the orders scan
    ob = o.crossJoin(F.broadcast(bb))
    # both layouts in ONE orders pass: each row emits its two
    # (layout, chunk) assignments via explode instead of a union of
    # two scans (values identical to the unionAll form)
    pt = ob.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("key_clustered").alias("layout"),
                    F.expr(
                        "cast((k - mnk) * 64 div (mxk - mnk + 1) as long)"
                    ).alias("chunk"),
                ),
                F.struct(
                    F.lit("date_clustered").alias("layout"),
                    F.expr(
                        "cast((day - mnd) * 64 div (mxd - mnd + 1) as long)"
                    ).alias("chunk"),
                ),
            )
        ).alias("s"),
        "day",
    ).select(F.col("s.layout").alias("layout"), F.col("s.chunk").alias("chunk"), "day")
    ch = (
        pt.groupBy("layout", "chunk")
        .agg(
            F.min("day").cast("long").alias("mn_d"),
            F.max("day").cast("long").alias("mx_d"),
        )
        # 2 x 64 zone-map rows; the predicate scan and the chunk count
        # both consume it
        .localCheckpoint(eager=True)
    )
    preds = (
        spark.range(12)
        .select(F.col("id").cast("long").alias("m"))
        .crossJoin(F.broadcast(bb))
        .select(
            "m",
            F.expr("cast(mnd + (mxd - mnd + 1) * m div 12 as long)").alias("lo"),
            F.expr(
                "cast(mnd + (mxd - mnd + 1) * (m + 1) div 12 - 1 as long)"
            ).alias("hi"),
        )
    )
    scan = (
        ch.crossJoin(F.broadcast(preds))
        .groupBy("layout", "m")
        .agg(
            F.sum(
                F.when(
                    (F.col("mx_d") < F.col("lo")) | (F.col("mn_d") > F.col("hi")),
                    F.lit(0),
                ).otherwise(F.lit(1))
            )
            .cast("long")
            .alias("scanned")
        )
    )
    nc = ch.groupBy("layout").agg(F.count(F.lit(1)).cast("long").alias("n_chunks"))
    return (
        scan.join(nc, "layout")
        .groupBy("layout", "n_chunks")
        .agg(F.sum("scanned").cast("long").alias("chunks_scanned_12preds"))
        .select(
            "layout",
            "n_chunks",
            "chunks_scanned_12preds",
            F.expr(
                "cast(chunks_scanned_12preds * 1000000 div (12 * n_chunks)"
                " as long)"
            ).alias("avg_scan_fraction_e6"),
        )
        .orderBy("layout")
    )


# ------------------------------------------ source-pair EMD matrix


@q(
    "doc_length_emd_by_source",
    """WITH b AS (SELECT source, CAST(n_chars AS BIGINT) AS nc FROM documents),
       mm AS (SELECT CAST(min(nc) AS BIGINT) AS mn,
                     CAST(max(nc) AS BIGINT) AS mx FROM b),
       pt AS (SELECT source,
                     CAST((b.nc - mm.mn) * 10 // (mm.mx - mm.mn + 1) AS BIGINT)
                       AS bucket
              FROM b CROSS JOIN mm),
       g AS (SELECT DISTINCT bucket FROM pt),
       ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM pt GROUP BY 1),
       cb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
              FROM pt GROUP BY 1, 2),
       grid AS (SELECT ns.source, ns.n, g.bucket,
                       CAST(coalesce(cb.c, 0) AS BIGINT) AS c
                FROM ns CROSS JOIN g
                LEFT JOIN cb ON cb.source = ns.source AND cb.bucket = g.bucket),
       cum AS (SELECT source, n, bucket,
                      CAST(sum(c) OVER (PARTITION BY source ORDER BY bucket ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM grid),
       pr AS (SELECT a.source AS source_a, b2.source AS source_b,
                     a.n AS na, b2.n AS nb,
                     CAST(sum(abs(a.cum * b2.n - b2.cum * a.n)) AS BIGINT)
                       AS num
              FROM cum a JOIN cum b2
                ON a.bucket = b2.bucket AND a.source < b2.source
              GROUP BY 1, 2, 3, 4)
       SELECT source_a, source_b, na, nb,
              CAST(num * 1000000 // (na * nb * 9) AS BIGINT) AS emd_e6
       FROM pr ORDER BY source_a, source_b""",
)
def _doc_length_emd_by_source(spark, sf_dir):
    """Pairwise 1-D earth-mover distance between every source pair's
    document-length distributions over 10 global equal-width buckets —
    the corpus-mix drift matrix a training-data pipeline checks when a
    new crawl snapshot lands (which sources stopped looking alike?).
    Per-source decile cumsums are partitioned windows over a complete
    source x 10-bucket grid; each pair's EMD numerator is an exact
    int64 fold and the normalized distance an exact e6 integer
    division. Sources are domain-bounded (20 -> 190 pairs); fact-scale
    work is one map-combined groupBy of the documents scan."""
    d = _t(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("nc")
    )
    mm = d.agg(
        F.min("nc").cast("long").alias("mn"), F.max("nc").cast("long").alias("mx")
    )
    pt = d.crossJoin(F.broadcast(mm)).select(
        "source",
        F.expr("cast((nc - mn) * 10 div (mx - mn + 1) as long)").alias("bucket"),
    )
    # ONE fact aggregation: the (source, bucket) contingency is
    # domain-bounded (sources x 10) and both the bucket domain and the
    # per-source totals derive from it — unpinned, g/ns/cb each re-ran
    # the documents scan + min-max probe (12 scans at the r8 audit)
    cb = (
        pt.groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    g = cb.select("bucket").distinct()
    ns = cb.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    grid = (
        ns.crossJoin(F.broadcast(g))
        .join(cb, ["source", "bucket"], "left")
        .select(
            "source",
            "n",
            "bucket",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    wc = Window.partitionBy("source").orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "source", "n", "bucket", F.sum("c").over(wc).cast("long").alias("cum")
    )
    a = cum.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("na"),
        "bucket",
        F.col("cum").alias("cuma"),
    )
    b2 = cum.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("nb"),
        "bucket",
        F.col("cum").alias("cumb"),
    )
    pr = (
        a.join(b2, "bucket")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "na", "nb")
        .agg(
            F.sum(F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")))
            .cast("long")
            .alias("num")
        )
    )
    return pr.select(
        "source_a",
        "source_b",
        "na",
        "nb",
        F.expr("cast(num * 1000000 div (na * nb * 9) as long)").alias("emd_e6"),
    ).orderBy("source_a", "source_b")


# ------------------------------------------------ tokenizer OOV rate


@q(
    "vocab_oov_rate",
    f"""WITH {_VOCAB_SQL},
       tok AS (SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
                                               t -> t <> '')) AS token
               FROM documents),
       j AS (SELECT tok.lang, tok.token,
                    CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END AS oov
             FROM tok LEFT JOIN vocab ON vocab.token = tok.token)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(oov) AS BIGINT) AS oov_tokens,
              CAST(sum(oov) * 1000000 // count(*) AS BIGINT) AS oov_rate_e6,
              CAST(count(DISTINCT CASE WHEN oov = 1 THEN token END) AS BIGINT)
                AS oov_types
       FROM j GROUP BY 1 ORDER BY lang""",
)
def _vocab_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per language against the trained
    dictionary (the same 100-token vocab the tfidf family ships) —
    the tokenizer-coverage readout that decides whether a vocab needs
    retraining when corpus mix shifts. The vocab is a <=100-row
    broadcast; the per-language token/OOV counts are one map-combined
    groupBy plus one exact distinct count of OOV types. Rates are
    exact e6 integer divisions."""
    toks = _tokens(spark, sf_dir)
    tok = toks.select("lang", F.explode("tokens").alias("token"))
    v = _vocab(spark, sf_dir).select("token", F.lit(1).alias("in_v"))
    j = tok.join(F.broadcast(v), "token", "left").select(
        "lang",
        "token",
        F.when(F.col("in_v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("oov").cast("long").alias("oov_tokens"),
            F.expr("cast(sum(oov) * 1000000 div count(1) as long)").alias(
                "oov_rate_e6"
            ),
            F.countDistinct(F.when(F.col("oov") == 1, F.col("token")))
            .cast("long")
            .alias("oov_types"),
        )
        .orderBy("lang")
    )


# --------------------------------------------- effect sizes by segment


@q(
    "effect_size_by_segment",
    """WITH j AS (
         SELECT c.c_mktsegment AS segment,
                CAST(floor(o.o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) // 100 AS v
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       per AS (SELECT segment, CAST(count(*) AS BIGINT) AS n1,
                      CAST(sum(v) AS BIGINT) AS s1,
                      CAST(sum(v * v) AS BIGINT) AS ss1
               FROM j GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS s,
                      CAST(sum(v * v) AS BIGINT) AS ss
               FROM j)
       SELECT per.segment, per.n1,
              round(CAST(per.s1 AS DOUBLE) / CAST(per.n1 AS DOUBLE), 4)
                AS mean_dollars,
              round((CAST(per.s1 AS DOUBLE) / CAST(per.n1 AS DOUBLE)
                     - CAST(tot.s - per.s1 AS DOUBLE)
                       / CAST(tot.n - per.n1 AS DOUBLE))
                    / sqrt((CAST(per.ss1 AS DOUBLE)
                            - CAST(per.s1 AS DOUBLE) * CAST(per.s1 AS DOUBLE)
                              / CAST(per.n1 AS DOUBLE)
                            + CAST(tot.ss - per.ss1 AS DOUBLE)
                            - CAST(tot.s - per.s1 AS DOUBLE)
                              * CAST(tot.s - per.s1 AS DOUBLE)
                              / CAST(tot.n - per.n1 AS DOUBLE))
                           / CAST(tot.n - 2 AS DOUBLE)), 6) AS cohen_d,
              round(((CAST(per.s1 AS DOUBLE) / CAST(per.n1 AS DOUBLE)
                      - CAST(tot.s - per.s1 AS DOUBLE)
                        / CAST(tot.n - per.n1 AS DOUBLE))
                     / sqrt((CAST(per.ss1 AS DOUBLE)
                             - CAST(per.s1 AS DOUBLE) * CAST(per.s1 AS DOUBLE)
                               / CAST(per.n1 AS DOUBLE)
                             + CAST(tot.ss - per.ss1 AS DOUBLE)
                             - CAST(tot.s - per.s1 AS DOUBLE)
                               * CAST(tot.s - per.s1 AS DOUBLE)
                               / CAST(tot.n - per.n1 AS DOUBLE))
                            / CAST(tot.n - 2 AS DOUBLE)))
                    * (CAST(1 AS DOUBLE)
                       - CAST(3 AS DOUBLE)
                         / (CAST(4 AS DOUBLE) * CAST(tot.n AS DOUBLE)
                            - CAST(9 AS DOUBLE))), 6) AS hedges_g
       FROM per CROSS JOIN tot ORDER BY per.segment""",
)
def _effect_size_by_segment(spark, sf_dir):
    """Cohen's d and Hedges' g standardized effect sizes of each
    market segment's order totals against all other segments — the
    practical-significance companion to the BH-screened z-tests
    (a segment can be statistically significant and practically
    trivial; d says which). Rest-group moments come from exact
    whole-corpus minus segment int64 sums (dollar units keep sum(v^2)
    inside int64 through factor 10); pooled-sd, d, and the small-
    sample J correction are one fixed IEEE tree per segment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as long) div 100").alias("v"),
    )
    per = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss1"),
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    x = per.crossJoin(F.broadcast(tot))
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    s2 = (F.col("s") - F.col("s1")).cast("double")
    n2 = (F.col("n") - F.col("n1")).cast("double")
    m2 = s2 / n2
    pooled = F.sqrt(
        (
            F.col("ss1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
            / F.col("n1").cast("double")
            + (F.col("ss") - F.col("ss1")).cast("double")
            - s2 * s2 / n2
        )
        / (F.col("n") - 2).cast("double")
    )
    d = (m1 - m2) / pooled
    jcorr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * F.col("n").cast("double") - F.lit(9.0)
    )
    return x.select(
        "segment",
        "n1",
        F.round(m1, 4).alias("mean_dollars"),
        F.round(d, 6).alias("cohen_d"),
        F.round(d * jcorr, 6).alias("hedges_g"),
    ).orderBy("segment")


# ------------------------------------------------ MCC threshold scan


@q(
    "mcc_threshold_scan",
    """WITH lv AS (SELECT CAST(l_quantity AS BIGINT) AS s,
                  count(*)::BIGINT AS n,
                  sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
                    AS pos
           FROM lineitem GROUP BY 1),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
                      CAST(sum(pos) AS BIGINT) AS p_tot FROM lv),
       c AS (SELECT s,
                    CAST(sum(n) OVER (ORDER BY s DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                    CAST(sum(pos) OVER (ORDER BY s DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
             FROM lv),
       m AS (SELECT c.s AS threshold,
                    c.cum_pos AS tp,
                    CAST(c.cum_n - c.cum_pos AS BIGINT) AS fp,
                    CAST(tot.p_tot - c.cum_pos AS BIGINT) AS fn,
                    CAST(tot.n_tot - tot.p_tot - (c.cum_n - c.cum_pos)
                         AS BIGINT) AS tn
             FROM c CROSS JOIN tot),
       k AS (SELECT *,
                    CAST(floor(
                      (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                       - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                      / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                             * CAST(tn + fp AS DOUBLE)
                             * CAST(tn + fn AS DOUBLE))
                      * CAST(1000000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mcc_e9
             FROM m WHERE (tp + fp) > 0 AND (tp + fn) > 0
                      AND (tn + fp) > 0 AND (tn + fn) > 0)
       SELECT threshold, tp, fp, fn, tn,
              round(CAST(mcc_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)
                AS mcc,
              CAST(CASE WHEN row_number() OVER (
                     ORDER BY mcc_e9 DESC, threshold ASC) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS is_best
       FROM k ORDER BY threshold""",
)
def _mcc_threshold_scan(spark, sf_dir):
    """Matthews-correlation scan over every score threshold of the
    quantity->returnflag scorer the pr_curve/best_f1 family grades —
    MCC is the confusion-matrix correlation that stays honest under
    class imbalance where F1 does not. Confusion cells come from the
    same descending cumulative level-table window as pr_curve (exact
    int64); MCC is e9-quantized per threshold so the argmax flag is an
    exact-integer comparison with a full tie-break. Degenerate
    thresholds (empty margin) are excluded exactly on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    lv = li.groupBy(F.col("l_quantity").cast("long").alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long"))
        .cast("long")
        .alias("pos"),
    )
    tot = lv.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("pos").cast("long").alias("p_tot"),
    )
    wd = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = lv.select(
        "s",
        F.sum("n").over(wd).cast("long").alias("cum_n"),
        F.sum("pos").over(wd).cast("long").alias("cum_pos"),
    )
    m = c.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("threshold"),
        F.col("cum_pos").alias("tp"),
        (F.col("cum_n") - F.col("cum_pos")).cast("long").alias("fp"),
        (F.col("p_tot") - F.col("cum_pos")).cast("long").alias("fn"),
        (F.col("n_tot") - F.col("p_tot") - (F.col("cum_n") - F.col("cum_pos")))
        .cast("long")
        .alias("tn"),
    )
    k = m.filter(
        ((F.col("tp") + F.col("fp")) > 0)
        & ((F.col("tp") + F.col("fn")) > 0)
        & ((F.col("tn") + F.col("fp")) > 0)
        & ((F.col("tn") + F.col("fn")) > 0)
    ).withColumn(
        "mcc_e9",
        F.floor(
            (
                F.col("tp").cast("double") * F.col("tn").cast("double")
                - F.col("fp").cast("double") * F.col("fn").cast("double")
            )
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn")).cast("double")
                * (F.col("tn") + F.col("fp")).cast("double")
                * (F.col("tn") + F.col("fn")).cast("double")
            )
            * F.lit(1000000000.0)
            + F.lit(0.5)
        ).cast("long"),
    )
    wb = Window.orderBy(F.col("mcc_e9").desc(), F.col("threshold").asc())
    return k.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("mcc_e9").cast("double") / F.lit(1000000000.0), 6).alias(
            "mcc"
        ),
        (F.row_number().over(wb) == 1).cast("long").alias("is_best"),
    ).orderBy("threshold")
