"""Round-7 batch 6: distributional-distance and robust-statistics
tier — 1-D Wasserstein (EMD) drift between price distributions,
t-closeness privacy audit, linear-kernel MMD between embedding label
groups, a Cramér's-V association matrix, Kendall's tau-b, a
peaks-over-threshold GPD tail fit, Chao1 vocabulary richness,
the Friedman test across event types, Benjamini-Hochberg FDR over
per-nation return-rate tests, and a 2-D orthogonal Procrustes
alignment readout between embedding sub-spaces.

House determinism rules throughout: counts/cumulative sums exact
int64 over level tables; every transcendental or ratio term is a
single fixed IEEE tree over exact integer operands, e6/e9-quantized
BEFORE any further summation; final statistics rounded in-query on
both engines. Windows run over value-domain level tables (price
cents/dollars, 10 deciles, 1000 histogram buckets, 25 nations) or are
partitioned by a grouping key — never an unpartitioned sort of a
fact-scale relation.

Reference parity: these extend the drift/eval family the reference
exercises through its data checks (redshells/data/*, SURVEY.md §2 F/H
tiers) to the distributional audits a 100 TB training-data pipeline
runs between corpus snapshots.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403


# --------------------------------------------------- 1-D EMD (Wasserstein)


@q(
    "emd_price_histogram",
    """WITH b AS (
         SELECT CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) AS cents,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is1
         FROM lineitem WHERE l_returnflag IN ('R', 'N')),
       mm AS (SELECT CAST(min(cents) AS BIGINT) AS mn,
                     CAST(max(cents) AS BIGINT) AS mx FROM b),
       pv AS (SELECT CAST((b.cents - mm.mn) * 1000 // (mm.mx - mm.mn + 1)
                          AS BIGINT) AS bucket,
                     CAST(sum(b.is1) AS BIGINT) AS c1,
                     CAST(sum(1 - b.is1) AS BIGINT) AS c2
              FROM b CROSS JOIN mm GROUP BY 1),
       n AS (SELECT CAST(sum(is1) AS BIGINT) AS n1,
                    CAST(sum(1 - is1) AS BIGINT) AS n2 FROM b),
       cum AS (SELECT bucket,
                      CAST(sum(c1) OVER (ORDER BY bucket ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
                      CAST(sum(c2) OVER (ORDER BY bucket ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
                      CAST(coalesce(lead(bucket) OVER (ORDER BY bucket ASC)
                                    - bucket, 0) AS BIGINT) AS gap
               FROM pv),
       s AS (SELECT CAST(sum(abs(cum1 * n.n2 - cum2 * n.n1) * gap) AS BIGINT)
                      AS emd_num
             FROM cum CROSS JOIN n)
       SELECT n.n1, n.n2, s.emd_num,
              round(CAST(s.emd_num AS DOUBLE)
                    / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)), 6)
                AS emd_buckets,
              round(CAST(s.emd_num AS DOUBLE)
                    * (CAST(mm.mx - mm.mn + 1 AS DOUBLE)
                       / CAST(1000 AS DOUBLE))
                    / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
                    / CAST(100 AS DOUBLE), 4) AS emd_dollars
       FROM s CROSS JOIN n CROSS JOIN mm""",
)
def _emd_price_histogram(spark, sf_dir):
    """Exact 1-D Wasserstein-1 (earth-mover) distance between the
    returned ('R') and delivered ('N') extended-price distributions
    over a fixed 1000-bucket equal-width histogram — the
    distribution-shift magnitude check that complements ks_two_sample
    (KS reports the sup gap; EMD reports how much mass moved how
    far). W1 = sum_i |CDF1-CDF2| folds to an exact int64:
    sum(|cum1*n2 - cum2*n1| * bucket_gap) over the <=1000-row bucket
    level table (gaps cover absent buckets, where CDFs are constant);
    the only window runs over those bounded buckets. At 10^9 lines the
    fact-scale work is one map-combined groupBy(bucket); term bound
    n1*n2*1000 stays under int64 through factor 10."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    b = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (F.col("l_returnflag") == "R").cast("long").alias("is1"),
    )
    mm = b.agg(
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
    )
    pv = (
        b.crossJoin(F.broadcast(mm))
        .select(
            F.expr("cast((cents - mn) * 1000 div (mx - mn + 1) as long)").alias(
                "bucket"
            ),
            "is1",
        )
        .groupBy("bucket")
        .agg(
            F.sum("is1").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("is1")).cast("long").alias("c2"),
        )
        # <=1000 bucket rows; the totals, the CDF window and the final
        # readout all derive from it (int64 sums are associative, so
        # n1/n2 folded from buckets equal the direct aggregation)
        .localCheckpoint(eager=True)
    )
    n = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    w = Window.orderBy(F.col("bucket").asc())
    cum = pv.select(
        "bucket",
        F.sum("c1").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum1"),
        F.sum("c2").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum2"),
        F.coalesce(F.lead("bucket").over(w) - F.col("bucket"), F.lit(0))
        .cast("long")
        .alias("gap"),
    )
    s = cum.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            * F.col("gap")
        )
        .cast("long")
        .alias("emd_num")
    )
    out = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(mm))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    return out.select(
        "n1",
        "n2",
        "emd_num",
        F.round(F.col("emd_num").cast("double") / (n1d * n2d), 6).alias(
            "emd_buckets"
        ),
        F.round(
            F.col("emd_num").cast("double")
            * ((F.col("mx") - F.col("mn") + F.lit(1)).cast("double") / F.lit(1000.0))
            / (n1d * n2d)
            / F.lit(100.0),
            4,
        ).alias("emd_dollars"),
    )


# --------------------------------------------------------- t-closeness


@q(
    "t_closeness_audit",
    """WITH b AS (
         SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS cents
         FROM customer),
       mm AS (SELECT CAST(min(cents) AS BIGINT) AS mn,
                     CAST(max(cents) AS BIGINT) AS mx FROM b),
       pt AS (SELECT c_nationkey, c_mktsegment,
                     CAST((b.cents - mm.mn) * 10 // (mm.mx - mm.mn + 1)
                          AS BIGINT) AS bucket
              FROM b CROSS JOIN mm),
       g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cg
             FROM pt GROUP BY 1),
       gc AS (SELECT bucket,
                     CAST(sum(cg) OVER (ORDER BY bucket ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumg
              FROM g),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pt),
       cls AS (SELECT c_nationkey, c_mktsegment,
                      CAST(count(*) AS BIGINT) AS nc
               FROM pt GROUP BY 1, 2),
       cb AS (SELECT c_nationkey, c_mktsegment, bucket,
                     CAST(count(*) AS BIGINT) AS cc
              FROM pt GROUP BY 1, 2, 3),
       grid AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.nc,
                       g.bucket, CAST(coalesce(cb.cc, 0) AS BIGINT) AS cc
                FROM cls CROSS JOIN g
                LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
                            AND cb.c_mktsegment = cls.c_mktsegment
                            AND cb.bucket = g.bucket),
       cum AS (SELECT c_nationkey, c_mktsegment, nc, bucket,
                      CAST(sum(cc) OVER (
                        PARTITION BY c_nationkey, c_mktsegment
                        ORDER BY bucket ASC ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cumc
               FROM grid),
       dm AS (SELECT c.c_nationkey, c.c_mktsegment, c.nc,
                     CAST(sum(abs(c.cumc * n.n - gc.cumg * c.nc)) AS BIGINT)
                       AS num
              FROM cum c JOIN gc USING (bucket) CROSS JOIN n
              GROUP BY 1, 2, 3)
       SELECT CAST(dm.c_nationkey AS BIGINT) AS nationkey,
              dm.c_mktsegment AS segment, dm.nc,
              CAST(dm.num * 1000000 // (dm.nc * n.n * 9) AS BIGINT) AS t_e6,
              CAST(CASE WHEN dm.num * 1000000 // (dm.nc * n.n * 9) > 200000
                        THEN 1 ELSE 0 END AS BIGINT) AS breach_02
       FROM dm CROSS JOIN n""",
)
def _t_closeness_audit(spark, sf_dir):
    """t-closeness privacy audit (Li et al. 2007) completing the
    k-anonymity / l-diversity release-gate family on the same
    quasi-identifier classes (nation x market segment): per class, the
    ordered earth-mover distance between the class's account-balance
    decile distribution and the global one, normalized by B-1=9. The
    EMD numerator sum|cumc*n - cumg*nc| is exact int64 over a complete
    class x 10-decile grid (class cumsums partitioned by class; the
    global decile cumsum is a 10-row level table); t is an exact e6
    integer division. Classes are domain-bounded (<=125), so the
    output and every window stay fixed-size at any corpus scale."""
    cust = _t(spark, sf_dir, "customer")
    b = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    mm = b.agg(
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
    )
    pt = b.crossJoin(F.broadcast(mm)).select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("cast((cents - mn) * 10 div (mx - mn + 1) as long)").alias("bucket"),
    )
    # ONE fact aggregation: the class x bucket contingency is
    # domain-bounded (<=125 classes x 10 deciles) and the global decile
    # counts, the total, and the class sizes all derive from it —
    # unpinned, g/n/cls/cb each re-ran the customer scan + min-max
    # probe (12 scans at the r8 audit)
    cb = (
        pt.groupBy("c_nationkey", "c_mktsegment", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cc"))
        .localCheckpoint(eager=True)
    )
    g = cb.groupBy("bucket").agg(F.sum("cc").cast("long").alias("cg"))
    wg = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    gc = g.select(
        "bucket", F.sum("cg").over(wg).cast("long").alias("cumg")
    )
    n = cb.agg(F.sum("cc").cast("long").alias("n"))
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cc").cast("long").alias("nc")
    )
    grid = (
        cls.crossJoin(F.broadcast(g.select("bucket")))
        .join(cb, ["c_nationkey", "c_mktsegment", "bucket"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "nc",
            "bucket",
            F.coalesce(F.col("cc"), F.lit(0)).cast("long").alias("cc"),
        )
    )
    wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        F.col("bucket").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "nc",
        "bucket",
        F.sum("cc").over(wc).cast("long").alias("cumc"),
    )
    dm = (
        cum.join(F.broadcast(gc), "bucket")
        .crossJoin(F.broadcast(n))
        .groupBy("c_nationkey", "c_mktsegment", "nc")
        .agg(
            F.sum(
                F.abs(F.col("cumc") * F.col("n") - F.col("cumg") * F.col("nc"))
            )
            .cast("long")
            .alias("num")
        )
    )
    t_e6 = F.expr("cast(num * 1000000 div (nc * n * 9) as long)")
    return dm.crossJoin(F.broadcast(n)).select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        "nc",
        t_e6.alias("t_e6"),
        (t_e6 > F.lit(200000)).cast("long").alias("breach_02"),
    )


# --------------------------------------------- linear-kernel MMD drift


@q(
    "mmd_label_shift",
    """WITH e2 AS (
         SELECT CAST(label AS BIGINT) AS label, embedding
         FROM embeddings WHERE label IN (0, 1)),
       x AS (SELECT label,
                    generate_subscripts(embedding, 1) AS dim,
                    CAST(floor(unnest(embedding)::DOUBLE
                               * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                      AS qe6
             FROM e2),
       n AS (SELECT CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n0,
                    CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n1
             FROM e2),
       d AS (SELECT dim,
                    CAST(sum(CASE WHEN label = 0 THEN qe6 ELSE 0 END)
                         AS BIGINT) AS s0,
                    CAST(sum(CASE WHEN label = 1 THEN qe6 ELSE 0 END)
                         AS BIGINT) AS s1
             FROM x GROUP BY 1),
       t AS (SELECT CAST(floor(
                      (CAST(d.s0 * n.n1 - d.s1 * n.n0 AS DOUBLE)
                       / (CAST(n.n0 AS DOUBLE) * CAST(n.n1 AS DOUBLE))
                       / CAST(1000000 AS DOUBLE))
                      * (CAST(d.s0 * n.n1 - d.s1 * n.n0 AS DOUBLE)
                         / (CAST(n.n0 AS DOUBLE) * CAST(n.n1 AS DOUBLE))
                         / CAST(1000000 AS DOUBLE))
                      * CAST(1000000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS term_e9
             FROM d CROSS JOIN n)
       SELECT n.n0, n.n1,
              CAST(s.mmd2_e9 AS BIGINT) AS mmd2_e9,
              round(CAST(s.mmd2_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)
                AS mmd2
       FROM (SELECT sum(term_e9) AS mmd2_e9 FROM t) s CROSS JOIN n""",
)
def _mmd_label_shift(spark, sf_dir):
    """Linear-kernel maximum-mean-discrepancy (Gretton et al. 2012)
    between the label-0 and label-1 embedding populations:
    MMD^2 = ||mean_0 - mean_1||^2 — THE two-sample drift test for
    embedding spaces (model-version shift, corpus-slice shift).
    Per-dimension element sums are exact int64 over e6-quantized
    elements (posexplode + one map-combined groupBy(dim) — scales as
    64x rows, all combinable); each dimension's squared mean-gap is
    one fixed IEEE tree over those ints, e9-quantized before the final
    64-term sum. No window, no collect; the level table is 64 rows."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label").isin(0, 1))
    e2 = emb.select(F.col("label").cast("long").alias("label"), "embedding")
    x = e2.select(
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "label",
        (F.col("pos") + F.lit(1)).cast("long").alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("qe6"),
    )
    n = e2.agg(
        F.sum((F.col("label") == 0).cast("long")).cast("long").alias("n0"),
        F.sum((F.col("label") == 1).cast("long")).cast("long").alias("n1"),
    )
    d = x.groupBy("dim").agg(
        F.sum(F.when(F.col("label") == 0, F.col("qe6")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("label") == 1, F.col("qe6")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s1"),
    )
    md = (
        (F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0")).cast("double")
        / (F.col("n0").cast("double") * F.col("n1").cast("double"))
        / F.lit(1000000.0)
    )
    t = d.crossJoin(F.broadcast(n)).select(
        F.floor(md * md * F.lit(1000000000.0) + F.lit(0.5))
        .cast("long")
        .alias("term_e9")
    )
    s = t.agg(F.sum("term_e9").cast("long").alias("mmd2_e9"))
    return s.crossJoin(F.broadcast(n)).select(
        "n0",
        "n1",
        "mmd2_e9",
        F.round(F.col("mmd2_e9").cast("double") / F.lit(1000000000.0), 6).alias(
            "mmd2"
        ),
    )


# ------------------------------------------------ Cramér's V matrix


@q(
    "cramers_v_matrix",
    """WITH src AS (
         SELECT 'orders_status_priority' AS pair, o_orderstatus AS a,
                o_orderpriority AS b
         FROM orders
         UNION ALL
         SELECT 'lineitem_flag_status', l_returnflag, l_linestatus
         FROM lineitem
         UNION ALL
         SELECT 'cust_segment_priority', c.c_mktsegment, o.o_orderpriority
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       ct AS (SELECT pair, a, b, CAST(count(*) AS BIGINT) AS nij
              FROM src GROUP BY 1, 2, 3),
       ra AS (SELECT pair, a, CAST(sum(nij) AS BIGINT) AS ri
              FROM ct GROUP BY 1, 2),
       cb AS (SELECT pair, b, CAST(sum(nij) AS BIGINT) AS cj
              FROM ct GROUP BY 1, 2),
       nn AS (SELECT pair, CAST(sum(nij) AS BIGINT) AS n,
                     CAST(count(DISTINCT a) AS BIGINT) AS r,
                     CAST(count(DISTINCT b) AS BIGINT) AS c
              FROM ct GROUP BY 1),
       grid AS (SELECT ra.pair, ra.a, cb.b, ra.ri, cb.cj,
                       CAST(coalesce(ct.nij, 0) AS BIGINT) AS nij
                FROM ra JOIN cb ON cb.pair = ra.pair
                LEFT JOIN ct ON ct.pair = ra.pair AND ct.a = ra.a
                            AND ct.b = cb.b),
       tm AS (SELECT g.pair,
                     CAST(floor(
                       CAST(g.nij * nn.n - g.ri * g.cj AS DOUBLE)
                       * CAST(g.nij * nn.n - g.ri * g.cj AS DOUBLE)
                       / (CAST(nn.n AS DOUBLE) * CAST(g.ri AS DOUBLE)
                          * CAST(g.cj AS DOUBLE))
                       * CAST(1000000 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT) AS term_e6
              FROM grid g
              JOIN nn ON nn.pair = g.pair),
       chi AS (SELECT pair, CAST(sum(term_e6) AS BIGINT) AS chi2_e6
               FROM tm GROUP BY 1)
       SELECT nn.pair, nn.n, nn.r, nn.c,
              round(CAST(chi.chi2_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE), 4)
                AS chi2,
              round(sqrt(CAST(chi.chi2_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                         / (CAST(nn.n AS DOUBLE)
                            * CAST(CASE WHEN nn.r < nn.c THEN nn.r - 1
                                        ELSE nn.c - 1 END AS DOUBLE))), 6)
                AS cramers_v
       FROM nn JOIN chi USING (pair)""",
)
def _cramers_v_matrix(spark, sf_dir):
    """Cramér's-V association matrix across three categorical column
    pairs (order status x priority, line returnflag x linestatus,
    customer segment x order priority via the fact-dim join) — the
    dataset-profiling step that ranks which categorical relationships
    carry signal. Extends chi_square_independence from one pair to a
    profiled matrix with the V = sqrt(chi2/(n*min(r-1,c-1)))
    normalization. Contingency cells, margins, and n are exact int64;
    chi2 sums over the COMPLETE a x b margin grid (ra x cb with
    observed cells left-joined, absent cells at nij=0 contributing
    their full expected-count term ri*cj/n — the friedman/cochran
    complete-grid convention), each term (nij*n - ri*cj)^2/(n*ri*cj)
    one fixed IEEE tree over exact ints, e6-quantized before the
    per-pair sum (cells are domain-bounded: <=25 per pair).
    Fact-scale work is one groupBy per source plus one broadcastable
    dim join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    src = (
        o.select(
            F.lit("orders_status_priority").alias("pair"),
            F.col("o_orderstatus").alias("a"),
            F.col("o_orderpriority").alias("b"),
        )
        .unionAll(
            li.select(
                F.lit("lineitem_flag_status").alias("pair"),
                F.col("l_returnflag").alias("a"),
                F.col("l_linestatus").alias("b"),
            )
        )
        .unionAll(
            o.join(c, o["o_custkey"] == c["c_custkey"]).select(
                F.lit("cust_segment_priority").alias("pair"),
                F.col("c_mktsegment").alias("a"),
                F.col("o_orderpriority").alias("b"),
            )
        )
    )
    # domain-bounded (<=25 cells/pair) and consumed by FOUR branches
    # (ra, cb, nn, grid) — pin or each re-runs the 3-source union scan
    # (20 fact scans at the round-8 plan audit; theils_u precedent)
    ct = (
        src.groupBy("pair", "a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
        .localCheckpoint(eager=True)
    )
    ra = ct.groupBy("pair", "a").agg(F.sum("nij").cast("long").alias("ri"))
    cb = ct.groupBy("pair", "b").agg(F.sum("nij").cast("long").alias("cj"))
    nn = ct.groupBy("pair").agg(
        F.sum("nij").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
    )
    d = (F.col("nij") * F.col("n") - F.col("ri") * F.col("cj")).cast("double")
    # complete margin grid: absent cells enter at nij=0 so their
    # expected-count term ri*cj/n is counted (both margin relations
    # are domain-bounded level tables — the cross join is <=25 rows
    # per pair)
    grid = (
        ra.join(cb, "pair")
        .join(ct, ["pair", "a", "b"], "left")
        .withColumn("nij", F.coalesce(F.col("nij"), F.lit(0)).cast("long"))
    )
    tm = (
        grid.join(F.broadcast(nn.select("pair", "n")), "pair")
        .select(
            "pair",
            F.floor(
                d
                * d
                / (
                    F.col("n").cast("double")
                    * F.col("ri").cast("double")
                    * F.col("cj").cast("double")
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_e6"),
        )
    )
    chi = tm.groupBy("pair").agg(F.sum("term_e6").cast("long").alias("chi2_e6"))
    out = nn.join(chi, "pair")
    chi2d = F.col("chi2_e6").cast("double") / F.lit(1000000.0)
    mindim = F.when(F.col("r") < F.col("c"), F.col("r") - 1).otherwise(
        F.col("c") - 1
    )
    return out.select(
        "pair",
        "n",
        "r",
        "c",
        F.round(chi2d, 4).alias("chi2"),
        F.round(
            F.sqrt(chi2d / (F.col("n").cast("double") * mindim.cast("double"))), 6
        ).alias("cramers_v"),
    )


# ------------------------------------------------- Kendall's tau-b


@q(
    "kendall_tau_by_flag",
    """WITH b AS (
         SELECT l_returnflag AS flag,
                CAST(l_quantity AS BIGINT) AS x,
                CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS y
         FROM lineitem),
       cells AS (SELECT flag, x, y, CAST(count(*) AS BIGINT) AS cnt
                 FROM b GROUP BY 1, 2, 3),
       cd AS (SELECT c1.flag,
                     CAST(sum(CASE WHEN c2.y > c1.y THEN c1.cnt * c2.cnt
                                   ELSE 0 END) AS BIGINT) AS conc,
                     CAST(sum(CASE WHEN c2.y < c1.y THEN c1.cnt * c2.cnt
                                   ELSE 0 END) AS BIGINT) AS disc
              FROM cells c1 JOIN cells c2
                ON c1.flag = c2.flag AND c1.x < c2.x
              GROUP BY 1),
       mx AS (SELECT flag, CAST(sum(tx * (tx - 1) // 2) AS BIGINT) AS tiex
              FROM (SELECT flag, x, CAST(sum(cnt) AS BIGINT) AS tx
                    FROM cells GROUP BY 1, 2) GROUP BY 1),
       my AS (SELECT flag, CAST(sum(ty * (ty - 1) // 2) AS BIGINT) AS tiey
              FROM (SELECT flag, y, CAST(sum(cnt) AS BIGINT) AS ty
                    FROM cells GROUP BY 1, 2) GROUP BY 1),
       nn AS (SELECT flag, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1)
       SELECT nn.flag, nn.n, cd.conc, cd.disc,
              round(CAST(cd.conc - cd.disc AS DOUBLE)
                    / sqrt(CAST(nn.n * (nn.n - 1) // 2 - mx.tiex AS DOUBLE)
                           * CAST(nn.n * (nn.n - 1) // 2 - my.tiey AS DOUBLE)),
                    6) AS tau_b
       FROM nn
       JOIN cd ON cd.flag = nn.flag
       JOIN mx ON mx.flag = nn.flag
       JOIN my ON my.flag = nn.flag
       ORDER BY nn.flag""",
)
def _kendall_tau_by_flag(spark, sf_dir):
    """Kendall's tau-b rank correlation between quantity and discount
    per returnflag — the tie-robust monotone-association companion to
    spearman_by_group. Computed entirely on the JOINT VALUE LEVEL
    TABLE (<=50 quantities x 11 discounts per flag): concordant /
    discordant pair counts are sums of cnt1*cnt2 over the <=550^2
    bounded cell self-join, tie corrections come from the margins, and
    every count is exact int64 (an O(n^2) pair scan is never
    materialized — the classic count-algebra trick that makes Kendall
    feasible at 10^9 rows when the value domain is bounded). tau_b's
    denominator product is taken in double (it exceeds int64 at 10x)."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    # value-level bounded (<=550 cells/flag) and consumed FIVE times
    # (both pair sides, both tie margins, the totals)
    cells = (
        b.groupBy("flag", "x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    c1 = cells.select(
        F.col("flag"), F.col("x").alias("x1"), F.col("y").alias("y1"),
        F.col("cnt").alias("cnt1"),
    )
    c2 = cells.select(
        F.col("flag"), F.col("x").alias("x2"), F.col("y").alias("y2"),
        F.col("cnt").alias("cnt2"),
    )
    cd = (
        c1.join(c2, "flag")
        .filter(F.col("x1") < F.col("x2"))
        .groupBy("flag")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y1"), F.col("cnt1") * F.col("cnt2"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("conc"),
            F.sum(
                F.when(F.col("y2") < F.col("y1"), F.col("cnt1") * F.col("cnt2"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("disc"),
        )
    )
    mx = (
        cells.groupBy("flag", "x")
        .agg(F.sum("cnt").cast("long").alias("tx"))
        .groupBy("flag")
        .agg(F.sum(F.expr("tx * (tx - 1) div 2")).cast("long").alias("tiex"))
    )
    my = (
        cells.groupBy("flag", "y")
        .agg(F.sum("cnt").cast("long").alias("ty"))
        .groupBy("flag")
        .agg(F.sum(F.expr("ty * (ty - 1) div 2")).cast("long").alias("tiey"))
    )
    nn = cells.groupBy("flag").agg(F.sum("cnt").cast("long").alias("n"))
    n0 = F.expr("n * (n - 1) div 2")
    out = nn.join(cd, "flag").join(mx, "flag").join(my, "flag")
    return out.select(
        "flag",
        "n",
        "conc",
        "disc",
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(
                (n0 - F.col("tiex")).cast("double")
                * (n0 - F.col("tiey")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    ).orderBy("flag")


# ---------------------------------------------- GPD tail fit (POT)


@q(
    "gpd_tail_fit",
    """WITH b AS (
         SELECT CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                     AS BIGINT) // 100 AS v
         FROM orders),
       lvl AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
       n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM lvl),
       cw AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM lvl),
       u AS (SELECT CAST(min(v) AS BIGINT) AS u
             FROM cw CROSS JOIN n WHERE cw.cum * 20 >= n.n * 19),
       exc AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_e,
                      CAST(sum(cnt * (lvl.v - u.u)) AS BIGINT) AS s1,
                      CAST(sum(cnt * (lvl.v - u.u) * (lvl.v - u.u)) AS BIGINT)
                        AS s2
               FROM lvl CROSS JOIN u WHERE lvl.v > u.u)
       SELECT u.u, exc.n_e,
              round(CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE), 4)
                AS mean_excess,
              round(CAST(0.5 AS DOUBLE)
                    * (CAST(1 AS DOUBLE)
                       - (CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE))
                         * (CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE))
                         / ((CAST(exc.s2 AS DOUBLE)
                             - CAST(exc.s1 AS DOUBLE) * CAST(exc.s1 AS DOUBLE)
                               / CAST(exc.n_e AS DOUBLE))
                            / CAST(exc.n_e - 1 AS DOUBLE))), 6) AS xi,
              round(CAST(0.5 AS DOUBLE)
                    * (CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE))
                    * ((CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE))
                       * (CAST(exc.s1 AS DOUBLE) / CAST(exc.n_e AS DOUBLE))
                       / ((CAST(exc.s2 AS DOUBLE)
                           - CAST(exc.s1 AS DOUBLE) * CAST(exc.s1 AS DOUBLE)
                             / CAST(exc.n_e AS DOUBLE))
                          / CAST(exc.n_e - 1 AS DOUBLE))
                       + CAST(1 AS DOUBLE)), 4) AS beta
       FROM u CROSS JOIN exc""",
)
def _gpd_tail_fit(spark, sf_dir):
    """Peaks-over-threshold generalized-Pareto tail fit on order
    totals (Pickands 1975; the standard heavy-tail model for spend /
    latency extremes): threshold u = exact p95 selected on the
    distinct-DOLLAR level table by cumulative weight (the
    weighted_median pattern — no fact-scale sort), then
    method-of-moments xi and beta from three exact int64 excess
    moments (n_e, sum y, sum y^2 in dollars so y^2 sums stay inside
    int64 through factor 100). The shape/scale formulas are one fixed
    IEEE tree over those ints on both engines. At 10^9 orders the
    only work is two map-combined aggregations over the level table."""
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        F.expr(
            "cast(floor(o_totalprice * 100 + 0.5d) as long) div 100"
        ).alias("v")
    )
    # dollar-level bounded; the total, the threshold window and the
    # excess moments all consume it
    lvl = (
        b.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n = lvl.agg(F.sum("cnt").cast("long").alias("n"))
    wv = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cw = lvl.select("v", F.sum("cnt").over(wv).cast("long").alias("cum"))
    u = (
        cw.crossJoin(F.broadcast(n))
        .filter(F.col("cum") * 20 >= F.col("n") * 19)
        .agg(F.min("v").cast("long").alias("u"))
    )
    exc = (
        lvl.crossJoin(F.broadcast(u))
        .filter(F.col("v") > F.col("u"))
        .agg(
            F.sum("cnt").cast("long").alias("n_e"),
            F.sum(F.col("cnt") * (F.col("v") - F.col("u")))
            .cast("long")
            .alias("s1"),
            F.sum(
                F.col("cnt") * (F.col("v") - F.col("u")) * (F.col("v") - F.col("u"))
            )
            .cast("long")
            .alias("s2"),
        )
    )
    out = u.crossJoin(F.broadcast(exc))
    m = F.col("s1").cast("double") / F.col("n_e").cast("double")
    s2v = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
        / F.col("n_e").cast("double")
    ) / (F.col("n_e") - F.lit(1)).cast("double")
    return out.select(
        "u",
        "n_e",
        F.round(m, 4).alias("mean_excess"),
        F.round(F.lit(0.5) * (F.lit(1.0) - m * m / s2v), 6).alias("xi"),
        F.round(F.lit(0.5) * m * (m * m / s2v + F.lit(1.0)), 4).alias("beta"),
    )


# ------------------------------------------- Chao1 vocabulary richness


@q(
    "chao1_vocab_richness",
    """WITH tok AS (
         SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
                                         t -> t <> '')) AS token
         FROM documents),
       tf AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2),
       fof AS (SELECT lang, c, CAST(count(*) AS BIGINT) AS f
               FROM tf GROUP BY 1, 2),
       s AS (SELECT lang,
                    CAST(sum(f) AS BIGINT) AS s_obs,
                    CAST(sum(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT)
                      AS f1,
                    CAST(sum(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT)
                      AS f2,
                    CAST(sum(c * f) AS BIGINT) AS n_tokens
             FROM fof GROUP BY 1)
       SELECT lang, s_obs, f1, f2, n_tokens,
              round(CAST(s_obs AS DOUBLE)
                    + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
                      / (CAST(2 AS DOUBLE) * CAST(f2 + 1 AS DOUBLE)), 4)
                AS chao1,
              round(CAST(1 AS DOUBLE)
                    - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                AS coverage
       FROM s ORDER BY lang""",
)
def _chao1_vocab_richness(spark, sf_dir):
    """Chao1 species-richness estimate of the unseen vocabulary per
    language (Chao 1984, bias-corrected form) plus the Good-Turing
    coverage estimate 1 - F1/N — the corpus-growth planning readout
    ("how much vocabulary is this corpus still missing?") that
    complements heaps_law_fit and good_turing_bigrams. Everything
    folds through two map-combined groupBys (term frequencies, then
    frequency-of-frequencies); counts are exact int64 and the Chao1 /
    coverage formulas are one final fixed IEEE tree per language."""
    toks = _tokens(spark, sf_dir)
    tok = toks.select("lang", F.explode("tokens").alias("token"))
    tf = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    fof = tf.groupBy("lang", "c").agg(F.count(F.lit(1)).cast("long").alias("f"))
    s = fof.groupBy("lang").agg(
        F.sum("f").cast("long").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f2"),
        F.sum(F.col("c") * F.col("f")).cast("long").alias("n_tokens"),
    )
    return s.select(
        "lang",
        "s_obs",
        "f1",
        "f2",
        "n_tokens",
        F.round(
            F.col("s_obs").cast("double")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1).cast("double")
            / (F.lit(2.0) * (F.col("f2") + 1).cast("double")),
            4,
        ).alias("chao1"),
        F.round(
            F.lit(1.0) - F.col("f1").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("coverage"),
    ).orderBy("lang")


# ----------------------------------------------- Friedman test


@q(
    "friedman_event_types",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
       ty AS (SELECT DISTINCT event_type FROM events),
       cnts AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
       grid AS (SELECT u.user_id, ty.event_type,
                       CAST(coalesce(cnts.c, 0) AS BIGINT) AS c
                FROM u CROSS JOIN ty
                LEFT JOIN cnts ON cnts.user_id = u.user_id
                              AND cnts.event_type = ty.event_type),
       lvl AS (SELECT user_id, c, CAST(count(*) AS BIGINT) AS tied
               FROM grid GROUP BY 1, 2),
       rk AS (SELECT user_id, c,
                     CAST(2 * (sum(tied) OVER (PARTITION BY user_id
                            ORDER BY c ASC ROWS UNBOUNDED PRECEDING) - tied)
                          + tied + 1 AS BIGINT) AS r2
              FROM lvl),
       g2 AS (SELECT grid.user_id, grid.event_type, rk.r2
              FROM grid JOIN rk ON rk.user_id = grid.user_id
                                AND rk.c = grid.c),
       dims AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n,
                       CAST(count(DISTINCT event_type) AS BIGINT) AS k
                FROM grid),
       rj AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS rank_sum_x2
              FROM g2 GROUP BY 1),
       den AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS ss2 FROM g2),
       num AS (SELECT CAST(sum((rj.rank_sum_x2 - dims.n * (dims.k + 1))
                               * (rj.rank_sum_x2 - dims.n * (dims.k + 1)))
                           AS BIGINT) AS num
               FROM rj CROSS JOIN dims)
       SELECT rj.event_type, rj.rank_sum_x2, dims.n AS n_users, dims.k,
              CAST(dims.k - 1 AS BIGINT) AS df,
              round(CAST(dims.k - 1 AS DOUBLE) * CAST(num.num AS DOUBLE)
                    / CAST(den.ss2 - dims.n * dims.k * (dims.k + 1)
                                     * (dims.k + 1) AS DOUBLE), 6)
                AS chi2_friedman
       FROM rj CROSS JOIN dims CROSS JOIN den CROSS JOIN num
       ORDER BY rj.event_type""",
)
def _friedman_event_types(spark, sf_dir):
    """Friedman rank test (Friedman 1937, tie-corrected midrank form)
    for whether event-type activity levels differ systematically
    within users: blocks = users, treatments = event types, values =
    per-(user,type) counts on the COMPLETE user x type grid (absent
    combinations are genuine zeros). Midranks are kept as exact
    doubled integers r2 = 2*rank (one window per user over <=k level
    rows — fully partitioned, never global), so rank sums, the
    squared deviations, and the tie-corrected denominator
    sum(r^2) - nk(k+1)^2/4 are all exact int64 algebra; chi2_F is the
    single final double. Per-type rank sums ship alongside the
    statistic so the readout shows WHICH types drive the rejection.

    Plan shape (round-8): the complete user x type grid is never
    materialized as rows — per-user counts fold to a <=k-element
    struct array (two-level aggregate), absent types zero-fill
    in-row against the broadcast type list, and the tie-corrected
    midranks are computed per user with array HOFs (k^2 work on a
    handful of types), so the whole test is 2 events scans + 3
    combinable shuffles. The old grid/window/join form re-expanded
    the grid subtree once per consumer — 22 events scans at the
    round-8 plan audit."""
    ev = _t(spark, sf_dir, "events")
    ty_arr = (
        ev.select("event_type")
        .distinct()
        .agg(F.array_sort(F.collect_list("event_type")).alias("__tys"))
    )
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_u = cnts.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type", "c")).alias("tc")
    )
    zero = F.lit(0).cast("long")
    filled = per_u.crossJoin(F.broadcast(ty_arr)).select(
        "user_id",
        F.concat(
            F.col("tc"),
            F.transform(
                F.array_except(
                    F.col("__tys"),
                    F.transform(F.col("tc"), lambda s: s["event_type"]),
                ),
                lambda t: F.struct(
                    t.alias("event_type"), zero.alias("c")
                ),
            ),
        ).alias("tc"),
    )
    # midrank (doubled): r2 = 2*#{c' < c} + #{c' == c} + 1 — the same
    # exact int64 the window-over-levels form produced
    cs = F.transform(F.col("tc"), lambda s: s["c"])
    g2rows = F.transform(
        F.col("tc"),
        lambda s: F.struct(
            s["event_type"].alias("event_type"),
            (
                F.lit(2)
                * F.size(F.filter(cs, lambda x: x < s["c"]))
                + F.size(F.filter(cs, lambda x: x == s["c"]))
                + F.lit(1)
            )
            .cast("long")
            .alias("r2"),
        ),
    )
    ex = filled.select(F.explode(g2rows).alias("g")).select(
        F.col("g.event_type").alias("event_type"),
        F.col("g.r2").alias("r2"),
    )
    rjd = (
        ex.groupBy("event_type")
        .agg(
            F.sum("r2").cast("long").alias("rank_sum_x2"),
            F.count(F.lit(1)).cast("long").alias("__n_t"),
            F.sum(F.col("r2") * F.col("r2")).cast("long").alias("__ss2_t"),
        )
        # k rows (one per event type) feeding three consumers — pin or
        # each re-runs the whole fact aggregation
        .localCheckpoint(eager=True)
    )
    # the grid is complete, so every type sees each user exactly once:
    # n = per-type row count, k = number of type rows, ss2 = Σ ss2_t
    dims = rjd.agg(
        F.max("__n_t").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__ss2_t").cast("long").alias("ss2"),
    )
    num = (
        rjd.crossJoin(F.broadcast(dims))
        .agg(
            F.sum(
                (F.col("rank_sum_x2") - F.col("n") * (F.col("k") + 1))
                * (F.col("rank_sum_x2") - F.col("n") * (F.col("k") + 1))
            )
            .cast("long")
            .alias("num")
        )
    )
    out = (
        rjd.select("event_type", "rank_sum_x2")
        .crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(num))
    )
    return out.select(
        "event_type",
        "rank_sum_x2",
        F.col("n").alias("n_users"),
        "k",
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(
            (F.col("k") - 1).cast("double")
            * F.col("num").cast("double")
            / (
                F.col("ss2")
                - F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
            ).cast("double"),
            6,
        ).alias("chi2_friedman"),
    ).orderBy("event_type")


# ---------------------------------- Benjamini-Hochberg FDR screening


@q(
    "bh_fdr_return_rates",
    """WITH j AS (
         SELECT c.c_nationkey AS nationkey,
                CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey),
       per AS (SELECT nationkey, CAST(count(*) AS BIGINT) AS n_i,
                      CAST(sum(is_r) AS BIGINT) AS r_i
               FROM j GROUP BY 1),
       tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                      CAST(sum(r_i) AS BIGINT) AS r,
                      CAST(count(*) AS BIGINT) AS m
               FROM per),
       z AS (SELECT per.nationkey, per.n_i, per.r_i,
                    abs((CAST(per.r_i AS DOUBLE) / CAST(per.n_i AS DOUBLE)
                         - CAST(tot.r AS DOUBLE) / CAST(tot.n AS DOUBLE))
                        / sqrt((CAST(tot.r AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * (CAST(1 AS DOUBLE)
                                  - CAST(tot.r AS DOUBLE)
                                    / CAST(tot.n AS DOUBLE))
                               * (CAST(1 AS DOUBLE) / CAST(per.n_i AS DOUBLE)
                                  + CAST(1 AS DOUBLE)
                                    / CAST(tot.n AS DOUBLE)))) AS az,
                    tot.m
              FROM per CROSS JOIN tot),
       tx AS (SELECT nationkey, n_i, r_i, m, az,
                     az / sqrt(CAST(2 AS DOUBLE)) AS x,
                     CAST(1 AS DOUBLE)
                       / (CAST(1 AS DOUBLE)
                          + CAST(0.3275911 AS DOUBLE)
                            * (az / sqrt(CAST(2 AS DOUBLE)))) AS tt
              FROM z),
       p AS (SELECT nationkey, n_i, r_i, m,
                    round(az, 6) AS z_abs,
                    CAST(floor(
                      (((((CAST(1.061405429 AS DOUBLE) * tt
                           - CAST(1.453152027 AS DOUBLE)) * tt
                          + CAST(1.421413741 AS DOUBLE)) * tt
                         - CAST(0.284496736 AS DOUBLE)) * tt
                        + CAST(0.254829592 AS DOUBLE)) * tt
                       * exp(-x * x))
                      * CAST(1000000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS p_e9
              FROM tx),
       rk AS (SELECT *, CAST(row_number() OVER (
                ORDER BY p_e9 ASC, nationkey ASC) AS BIGINT) AS i
              FROM p),
       km AS (SELECT *, CAST(i * 50000000 // m AS BIGINT) AS thr_e9,
                     max(CASE WHEN p_e9 <= i * 50000000 // m THEN i
                              ELSE NULL END) OVER () AS kmax
              FROM rk)
       SELECT CAST(nationkey AS BIGINT) AS nationkey, n_i, r_i, z_abs,
              p_e9, thr_e9,
              CAST(CASE WHEN i <= coalesce(kmax, 0) THEN 1 ELSE 0 END
                   AS BIGINT) AS significant
       FROM km ORDER BY nationkey""",
)
def _bh_fdr_return_rates(spark, sf_dir):
    """Benjamini-Hochberg FDR screening (BH 1995) across the 25
    per-nation return-rate z-tests against the pooled rate — the
    multiple-testing correction any per-segment metric dashboard needs
    before flagging segments. Two-sided p-values come from the
    Abramowitz-Stegun 7.1.26 erf polynomial (the identical closed
    expression evaluated in both engines), e9-quantized BEFORE the
    rank step so ordering and the step-up comparison run on exact
    integers; the BH threshold i*alpha/m is exact integer division,
    and the step-up cutoff is one max window over the 25-row nation
    level table. Fact-scale work is one map-combined groupBy behind
    two broadcastable dim joins."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nationkey"),
            (F.col("l_returnflag") == "R").cast("long").alias("is_r"),
        )
    )
    per = (
        j.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum("is_r").cast("long").alias("r_i"),
        )
        # 25 nation rows; the pooled totals and the z/p projection both
        # consume it — unpinned, the 3-table join ran per consumer
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    zrel = per.crossJoin(F.broadcast(tot))
    pr = F.col("r").cast("double") / F.col("n").cast("double")
    az = F.abs(
        (F.col("r_i").cast("double") / F.col("n_i").cast("double") - pr)
        / F.sqrt(
            pr
            * (F.lit(1.0) - pr)
            * (
                F.lit(1.0) / F.col("n_i").cast("double")
                + F.lit(1.0) / F.col("n").cast("double")
            )
        )
    )
    x = az / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    # A&S 7.1.26: 1 - erf(x) IS the polynomial tail — computing it
    # directly (instead of 1-(1-tail)) keeps one IEEE tree on both
    # engines with no catastrophic 1-1+y cancellation at the e9 edge
    p_two = (
        (
            (
                (
                    (F.lit(1.061405429) * t - F.lit(1.453152027)) * t
                    + F.lit(1.421413741)
                )
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
        * F.exp(-x * x)
    )
    p = zrel.select(
        "nationkey",
        "n_i",
        "r_i",
        "m",
        F.round(az, 6).alias("z_abs"),
        F.floor(p_two * F.lit(1000000000.0) + F.lit(0.5))
        .cast("long")
        .alias("p_e9"),
    )
    wr = Window.orderBy(F.col("p_e9").asc(), F.col("nationkey").asc())
    rk = p.withColumn("i", F.row_number().over(wr).cast("long"))
    thr = F.expr("cast(i * 50000000 div m as long)")
    km = rk.withColumn("thr_e9", thr).withColumn(
        "kmax",
        F.max(F.when(F.col("p_e9") <= F.col("thr_e9"), F.col("i"))).over(
            Window.partitionBy()
        ),
    )
    return km.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        "n_i",
        "r_i",
        "z_abs",
        "p_e9",
        "thr_e9",
        (F.col("i") <= F.coalesce(F.col("kmax"), F.lit(0)))
        .cast("long")
        .alias("significant"),
    ).orderBy("nationkey")


# ----------------------------------- 2-D orthogonal Procrustes readout


@q(
    "procrustes_embedding_align",
    """WITH x AS (
         SELECT CAST(floor(embedding[1]::DOUBLE * 1000000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS a1,
                CAST(floor(embedding[2]::DOUBLE * 1000000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS a2,
                CAST(floor(embedding[3]::DOUBLE * 1000000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS b1,
                CAST(floor(embedding[4]::DOUBLE * 1000000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS b2
         FROM embeddings),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(a1 * b1) AS BIGINT) AS mxx,
                    CAST(sum(a1 * b2) AS BIGINT) AS mxy,
                    CAST(sum(a2 * b1) AS BIGINT) AS myx,
                    CAST(sum(a2 * b2) AS BIGINT) AS myy,
                    CAST(sum(a1 * a1 + a2 * a2) AS BIGINT) AS sa,
                    CAST(sum(b1 * b1 + b2 * b2) AS BIGINT) AS sb
             FROM x)
       SELECT n,
              round(atan2(CAST(mxy - myx AS DOUBLE),
                          CAST(mxx + myy AS DOUBLE)), 6) AS theta,
              round(sqrt(CAST(mxx + myy AS DOUBLE)
                         * CAST(mxx + myy AS DOUBLE)
                         + CAST(mxy - myx AS DOUBLE)
                           * CAST(mxy - myx AS DOUBLE))
                    / sqrt(CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)), 6)
                AS congruence,
              round((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)
                     - CAST(2 AS DOUBLE)
                       * sqrt(CAST(mxx + myy AS DOUBLE)
                              * CAST(mxx + myy AS DOUBLE)
                              + CAST(mxy - myx AS DOUBLE)
                                * CAST(mxy - myx AS DOUBLE)))
                    / CAST(1000000000000 AS DOUBLE), 4) AS residual
       FROM s""",
)
def _procrustes_embedding_align(spark, sf_dir):
    """2-D orthogonal Procrustes alignment (Schönemann 1966) between
    two embedding sub-spaces (dims 1-2 as space A, dims 3-4 as space
    B) — the closed-form core of aligning embedding spaces across
    model versions (the full-rank case solves per 2-D plane exactly;
    higher-d uses SVD, same cross-covariance sufficient statistics).
    The optimal rotation angle is atan2(Mxy-Myx, Mxx+Myy) over four
    exact int64 cross-covariance sums of e6-quantized coordinates; the
    congruence (trace norm / geometric mean of energies) and the
    residual ||AR-B||^2 = sa+sb-2*tracenorm are single fixed IEEE
    trees over the same six integers. One map-combined aggregate —
    nothing else — so the plan is a pure scan+combine at any scale."""
    emb = _t(spark, sf_dir, "embeddings")

    def _q6(i):
        return (
            F.floor(
                F.element_at("embedding", i).cast("double") * 1000000 + F.lit(0.5)
            )
            .cast("long")
        )

    x = emb.select(
        _q6(1).alias("a1"), _q6(2).alias("a2"), _q6(3).alias("b1"), _q6(4).alias("b2")
    )
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a1") * F.col("b1")).cast("long").alias("mxx"),
        F.sum(F.col("a1") * F.col("b2")).cast("long").alias("mxy"),
        F.sum(F.col("a2") * F.col("b1")).cast("long").alias("myx"),
        F.sum(F.col("a2") * F.col("b2")).cast("long").alias("myy"),
        F.sum(F.col("a1") * F.col("a1") + F.col("a2") * F.col("a2"))
        .cast("long")
        .alias("sa"),
        F.sum(F.col("b1") * F.col("b1") + F.col("b2") * F.col("b2"))
        .cast("long")
        .alias("sb"),
    )
    tr = F.sqrt(
        (F.col("mxx") + F.col("myy")).cast("double")
        * (F.col("mxx") + F.col("myy")).cast("double")
        + (F.col("mxy") - F.col("myx")).cast("double")
        * (F.col("mxy") - F.col("myx")).cast("double")
    )
    return s.select(
        "n",
        F.round(
            F.atan2(
                (F.col("mxy") - F.col("myx")).cast("double"),
                (F.col("mxx") + F.col("myy")).cast("double"),
            ),
            6,
        ).alias("theta"),
        F.round(
            tr / F.sqrt(F.col("sa").cast("double") * F.col("sb").cast("double")), 6
        ).alias("congruence"),
        F.round(
            (F.col("sa").cast("double") + F.col("sb").cast("double") - F.lit(2.0) * tr)
            / F.lit(1.0e12),
            4,
        ).alias("residual"),
    )
