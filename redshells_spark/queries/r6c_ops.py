"""Round-6 session-2 batch 2: KNN-Shapley training-data valuation,
the Mann-Whitney rank-sum drift test, and Johnson-Lindenstrauss
random-projection recall — each with an exact DuckDB oracle.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403

E12 = 1_000_000_000_000

_COS_AB = (
    "(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(greatest(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])), 1e-12) * "
    "greatest(sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 1e-12)))"
)

# ------------------------------------------------------------ KNN-Shapley


@q(
    "knn_shapley_values",
    f"""WITH tr AS (SELECT vec_id AS tid, label AS ty, embedding
                FROM embeddings WHERE vec_id % 25 <> 0),
       va AS (SELECT vec_id AS vid, label AS vy, embedding
              FROM embeddings WHERE vec_id % 25 = 0),
       pr AS (
         SELECT a.tid, a.ty, b.vid, {_COS_AB} AS score,
                CASE WHEN a.ty = b.vy THEN 1 ELSE 0 END AS ind
         FROM tr a CROSS JOIN va b),
       rk AS (
         SELECT tid, ty, vid, ind,
                row_number() OVER (PARTITION BY vid
                                   ORDER BY score DESC, tid ASC) AS i,
                lead(ind) OVER (PARTITION BY vid
                                ORDER BY score DESC, tid ASC) AS ind_next,
                count(*) OVER (PARTITION BY vid) AS n
         FROM pr),
       tm AS (
         SELECT tid, ty, vid, i,
                CASE WHEN ind_next IS NULL
                     THEN CAST(ind * {E12} AS BIGINT) // CAST(n AS BIGINT)
                     ELSE (ind - ind_next)
                          * (CAST(least(5, i) * {E12} AS BIGINT)
                             // CAST(5 * i AS BIGINT)) END AS term
         FROM rk),
       sf AS (
         SELECT tid, ty,
                CAST(sum(term) OVER (PARTITION BY vid ORDER BY i ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS s
         FROM tm)
       SELECT tid AS vec_id, CAST(ty AS BIGINT) AS label,
              CAST(sum(s) AS BIGINT) AS shapley_e12_sum,
              CAST(count(*) AS BIGINT) AS n_val
       FROM sf GROUP BY tid, ty""",
)
def _knn_shapley_values(spark, sf_dir):
    """Exact KNN-Shapley data valuation (Jia et al. VLDB 2019;
    ml/valuation.py): the Shapley value of every training embedding
    for a K-NN surrogate has a closed form — one ranking window per
    validation point plus a suffix sum — so 'which training points
    help/hurt' costs O(|val|·N), not retraining. Negative values flag
    mislabeled/near-dup candidates: THE curation signal. Terms are e12
    fixed-point int64 (sign multiplied AFTER the non-negative integer
    division, since Spark div truncates while DuckDB // floors), so
    every suffix sum and the final aggregate are exact integers."""
    from redshells_spark.ml.valuation import knn_shapley

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 25 != 0)
    val = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("val_id"), "label", "embedding"
    )
    out = knn_shapley(train, val, k=5)
    return out.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "shapley_e12_sum",
        "n_val",
    )


# ----------------------------------------------------------- Mann-Whitney


@q(
    "mann_whitney_shift",
    """WITH b AS (
         SELECT CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
         FROM events WHERE event_type IN ('click', 'purchase')),
       pv AS (SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
                     CAST(sum(1 - is1) AS BIGINT) AS c2
              FROM b GROUP BY 1),
       r AS (SELECT c1, (c1 + c2) AS t,
                    CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cb
             FROM pv),
       a AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                    CAST(sum(t - c1) AS BIGINT) AS n2,
                    CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1_x2,
                    CAST(sum(t * t * t - t) AS BIGINT) AS tie_t
             FROM r)
       SELECT n1, n2,
              CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2, tie_t,
              round(CAST((r1_x2 - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE)
                    / (CAST(2.0 AS DOUBLE)
                       * sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(12.0 AS DOUBLE)
                              * (CAST(n1 + n2 + 1 AS DOUBLE)
                                 - CAST(tie_t AS DOUBLE)
                                   / (CAST(n1 + n2 AS DOUBLE)
                                      * CAST(n1 + n2 - 1 AS DOUBLE))))), 6) AS z,
              CAST(CASE WHEN abs(round(CAST((r1_x2 - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE)
                    / (CAST(2.0 AS DOUBLE)
                       * sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(12.0 AS DOUBLE)
                              * (CAST(n1 + n2 + 1 AS DOUBLE)
                                 - CAST(tie_t AS DOUBLE)
                                   / (CAST(n1 + n2 AS DOUBLE)
                                      * CAST(n1 + n2 - 1 AS DOUBLE))))), 6))
                    > CAST(1.96 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM a""",
)
def _mann_whitney_shift(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the click and
    purchase value distributions (operators/drift.py
    mann_whitney_u) — the nonparametric location-shift test completing
    the drift triad (KS = CDF supremum, PSI = binned KL, U = rank
    shift). Midrank ties make doubled rank sums exact int64
    (2·midrank = 2·count_below + count + 1); the tie-corrected normal
    z is one fixed IEEE expression over those integers, rounded after.
    The per-value count relation is the same mergeable state as
    ks_value_counts — streamable for free."""
    from redshells_spark.operators.drift import mann_whitney_u

    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "value", (F.col("event_type") == "click").cast("long").alias("is1")
    )
    return mann_whitney_u(b, "value", "is1", scale=100)


# ----------------------------------------------- JL random projection


def _proj_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}.proj, {b}.proj) / "
        f"(greatest(sqrt(list_dot_product({a}.proj, {a}.proj)), 1e-12) * "
        f"greatest(sqrt(list_dot_product({b}.proj, {b}.proj)), 1e-12)))"
    )


def _rp_oracle() -> str:
    from redshells_spark.similarity.rp import jl_signs_sql

    proj = jl_signs_sql(16, 64, "embedding", seed=31)
    return f"""WITH pe AS (SELECT vec_id, embedding, {proj} AS proj FROM embeddings),
       qs AS (SELECT vec_id AS qid, embedding, proj FROM pe WHERE vec_id % 25 = 0),
       ex AS (
         SELECT b.qid, a.vec_id,
                row_number() OVER (PARTITION BY b.qid
                                   ORDER BY {_COS_AB} DESC, a.vec_id ASC) AS rn
         FROM pe a CROSS JOIN qs b WHERE a.vec_id <> b.qid),
       et AS (SELECT qid, vec_id FROM ex WHERE rn <= 10),
       px AS (
         SELECT b.qid, a.vec_id,
                row_number() OVER (PARTITION BY b.qid
                                   ORDER BY {_proj_cos("a", "b")} DESC, a.vec_id ASC) AS rn
         FROM pe a CROSS JOIN qs b WHERE a.vec_id <> b.qid),
       pt AS (SELECT qid, vec_id FROM px WHERE rn <= 10),
       ov AS (SELECT e.qid, count(*) AS cnt
              FROM et e JOIN pt p ON p.qid = e.qid AND p.vec_id = e.vec_id
              GROUP BY e.qid)
       SELECT q.qid AS query_id,
              CAST(coalesce(ov.cnt, 0) AS BIGINT) AS n_overlap,
              CAST(coalesce(ov.cnt, 0) * 1000 AS BIGINT) AS recall_e4
       FROM (SELECT DISTINCT qid FROM qs) q
       LEFT JOIN ov ON ov.qid = q.qid"""


@q("random_projection_recall", _rp_oracle())
def _random_projection_recall(spark, sf_dir):
    """Johnson-Lindenstrauss ANN prefilter audit (Achlioptas 2003 ±1
    projections; similarity/rp.py): project 64-d embeddings to 16-d
    with an md5-derived sign matrix (a plan-time constant, NOT
    data-grown codegen), run exact cosine top-10 in BOTH spaces, and
    report per-query overlap — the recall a 4×-cheaper projected
    first pass would keep before exact re-rank (the coarse→fine
    pattern of the binary/PQ stages, on a projection instead of a
    quantizer). Projection is one map-side pass; the audit's
    all-pairs scoring is eval-only, query-set bounded."""
    from redshells_spark.operators.topk import per_group_topk
    from redshells_spark.similarity.rp import project_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    pe = project_embeddings(emb, 16, 64, out_column="proj", seed=31)
    qs = pe.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qe"),
        F.col("proj").alias("__qp"),
    )

    def topk(score_cols: tuple[str, str]) -> DataFrame:
        a, b = score_cols
        scored = (
            pe.crossJoin(F.broadcast(qs))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid", "vec_id", cosine_similarity(a, b).alias("score")
            )
        )
        return per_group_topk(
            scored, "qid", "score", 10, tie_break=["vec_id"]
        ).select("qid", "vec_id")

    et = topk(("embedding", "__qe"))
    pt = topk(("proj", "__qp"))
    ov = et.join(pt, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        qs.select("qid")
        .distinct()
        .join(ov, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("cnt"), F.lit(0)) * 1000)
            .cast("long")
            .alias("recall_e4"),
        )
    )
