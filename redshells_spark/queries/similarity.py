"""Embedding similarity / ANN: brute force, LSH, IVF, PQ, embedding near-dup.

Split from the former single-file queries.py (round 4); registration
order within and across tier modules is preserved by the package
__init__ import order and pinned by tests/test_ann_recall.py.
"""

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.text import _duck_h60  # noqa: F401,E402

# ------------------------------------------------- embeddings / similarity

_COS_SQL = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(greatest(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])), 1e-12) * "
    "greatest(sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 1e-12))"
)


@q(
    "dot_product_pairs",
    f"""SELECT a.vec_id AS vec_id_0, b.vec_id AS vec_id_1,
          round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS dot,
          round({_COS_SQL}, 4) AS cosine
       FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""",
)
def _dot_product_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_id_0"), F.col("embedding").alias("__e0"))
    b = emb.select(F.col("vec_id").alias("vec_id_1"), F.col("embedding").alias("__e1"))
    joined = a.join(b, on=F.col("vec_id_1") == F.col("vec_id_0") + 1)
    return joined.select(
        "vec_id_0",
        "vec_id_1",
        _r4(dot_product("__e0", "__e1"), "dot"),
        _r4(cosine_similarity("__e0", "__e1"), "cosine"),
    )


@q(
    "brute_force_topk",
    f"""SELECT query_id, vec_id, round(score, 4) AS score, CAST(rn AS BIGINT) AS rank FROM (
         SELECT a.vec_id AS query_id, b.vec_id AS vec_id, {_COS_SQL} AS score,
                row_number() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id ASC) AS rn
         FROM (SELECT * FROM embeddings WHERE vec_id < 200) a CROSS JOIN embeddings b)
       WHERE rn <= 10""",
)
def _brute_force_topk(spark, sf_dir):
    # exact top-k via the BLAS matmul path (mapInPandas batch matmul +
    # partial top-k) — identical results to the Catalyst
    # brute_force_topk (pinned in tests/test_ann_recall.py) but ~10×
    # faster: the higher-order-function cosine interprets ~dim·3 lambda
    # steps per pair. Verified exact against the DuckDB oracle here.
    from redshells_spark.similarity.allpairs import matmul_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = matmul_topk(queries, emb, k=10)
    return out.select(
        "query_id", "vec_id", _r4(F.col("score"), "score"), F.col("rank").cast("long").alias("rank")
    )


def _planes_sql(num_planes: int = 16, dim: int = 64, seed: int = 42) -> str:
    """The exact hyperplane matrix the Spark LSH tier uses, rendered as
    a DuckDB VALUES literal — pure-numpy derivation (ann.py
    ``hyperplane_matrix``), so the oracle recomputes bit-identical
    signatures with no engine hash involved."""
    from redshells_spark.similarity.ann import hyperplane_matrix

    mat = hyperplane_matrix(num_planes, dim, seed)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(float(v)) for v in mat[p]))
        for p in range(num_planes)
    )
    return f"planes(p, v) AS (VALUES {rows})"


# shared signature CTE: sign-bit pack against the literal planes
_LSH_SIG_SQL = """
       sig AS (SELECT e.vec_id,
                      sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.v) > 0
                               THEN (1::BIGINT << pl.p) ELSE 0::BIGINT END)::BIGINT AS sig
               FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id),
       blk AS (SELECT unnest(range(4)) AS block_idx)
"""


@q(
    "lsh_topk",
    f"""WITH {_planes_sql()},{_LSH_SIG_SQL},
       qsig AS (SELECT vec_id AS query_id, sig FROM sig WHERE vec_id < 200),
       qb AS (SELECT query_id, block_idx, (sig >> (block_idx * 4)) & 15 AS block_val
              FROM qsig, blk
              UNION
              SELECT query_id, block_idx,
                     xor((sig >> (block_idx * 4)) & 15, 1::BIGINT << f.b)
              FROM qsig, blk, (SELECT unnest(range(4)) AS b) f),
       cb AS (SELECT vec_id, block_idx, (sig >> (block_idx * 4)) & 15 AS block_val
              FROM sig, blk),
       cand AS (SELECT DISTINCT qb.query_id, cb.vec_id
                FROM qb JOIN cb USING (block_idx, block_val)),
       scored AS (SELECT c.query_id, c.vec_id, {_COS_SQL} AS score
                  FROM cand c
                  JOIN embeddings a ON a.vec_id = c.query_id
                  JOIN embeddings b ON b.vec_id = c.vec_id)
       SELECT query_id, vec_id, round(score, 4) AS score, CAST(rn AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC) AS rn
             FROM scored)
       WHERE rn <= 10""",
)
def _lsh_topk(spark, sf_dir):
    """LSH top-k with a FULL SQL oracle: the hyperplanes are exported
    as literals (pure-numpy derivation), so DuckDB rebuilds the same
    signatures, the same banded+multiprobe candidate set, and the same
    cosine rerank — two engines, one result."""
    emb = _t(spark, sf_dir, "embeddings")
    # same workload as brute_force_topk so bench compares the two
    # fairly: 200 queries, k=10, full corpus
    queries = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim passed explicitly: skips the driver first() probe job;
    # multiprobe=1 probes Hamming-1 neighbor buckets (near-exact recall
    # at ~2× candidate volume)
    out = lsh_topk(
        queries, emb, k=10, num_planes=16, num_blocks=4, dim=64, multiprobe=1
    )
    return out.select(
        "query_id", "vec_id", _r4(F.col("score"), "score"),
        F.col("rank").cast("long").alias("rank"),
    )


@q(
    "embedding_near_dup_scalable",
    f"""WITH {_planes_sql()},{_LSH_SIG_SQL},
       bb AS (SELECT vec_id, block_idx, (sig >> (block_idx * 4)) & 15 AS block_val
              FROM sig, blk),
       cand AS (SELECT DISTINCT l.vec_id AS id0, r.vec_id AS id1
                FROM bb l JOIN bb r
                  ON l.block_idx = r.block_idx AND l.block_val = r.block_val
                 AND l.vec_id < r.vec_id)
       SELECT c.id0, c.id1, round({_COS_SQL}, 4) AS similarity
       FROM cand c
       JOIN embeddings a ON a.vec_id = c.id0
       JOIN embeddings b ON b.vec_id = c.id1
       WHERE {_COS_SQL} >= 0.3""",
)
def _embedding_near_dup_scalable(spark, sf_dir):
    """Sub-quadratic embedding near-dup (LSH-banded candidates + exact
    verify) — the 100 TB path where the exact all-pairs tier would
    need an unbounded broadcast. Precision exact by construction;
    recall is probe-bound and the candidate set is oracle-pinned (the
    SQL mirrors the banding exactly over literal planes)."""
    from redshells_spark.dedup.embedding import embedding_near_dup_pairs_scalable

    emb = _t(spark, sf_dir, "embeddings")
    out = embedding_near_dup_pairs_scalable(emb, threshold=0.3, dim=64)
    return out.select("id0", "id1", _r4(F.col("similarity"), "similarity"))


@q(
    "ivf_topk_fixed_centroids",
    f"""WITH cent AS (
         SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                embedding
         FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 800),
       d2 AS (
         SELECT e.vec_id AS eid, c.cid AS cid,
                list_reduce(list_transform(range(1, 65),
                    i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                       * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)),
                    (acc, x) -> acc + x) AS d2
         FROM embeddings e CROSS JOIN cent c),
       assign AS (
         SELECT eid AS vec_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn
           FROM d2)
         WHERE rn = 1),
       qprobe AS (
         SELECT eid AS query_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn
           FROM d2 WHERE eid < 50)
         WHERE rn <= 4),
       cand AS (SELECT q.query_id, s.vec_id
                FROM qprobe q JOIN assign s ON s.cid = q.cid),
       scored AS (SELECT c.query_id, c.vec_id, {_COS_SQL} AS score
                  FROM cand c
                  JOIN embeddings a ON a.vec_id = c.query_id
                  JOIN embeddings b ON b.vec_id = c.vec_id)
       SELECT query_id, vec_id, round(score, 4) AS score, CAST(rn AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC) AS rn
             FROM scored)
       WHERE rn <= 10""",
)
def _ivf_topk_fixed_centroids(spark, sf_dir):
    """IVF with DETERMINISTIC centroids (strided corpus vectors) so the
    whole pipeline — assignment argmin, nprobe probing, cosine rerank —
    is oracle-checkable: Spark's left-fold zip_with/aggregate squared-L2
    and DuckDB's list_reduce evaluate float64 additions in the same
    index order, so assignments agree bit-for-bit. The KMeans variant
    (``ivf_topk``) keeps quantizer quality; this one pins the engine
    mechanics cross-engine."""
    from redshells_spark.similarity.ann import assign_to_centroids, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 800))
        .orderBy("vec_id")
        .select("embedding")
        .collect()  # 16 rows — bounded driver probe, mirrors index build
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    assigned = assign_to_centroids(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(queries, assigned, centroids, k=10, nprobe=4)
    return out.select(
        "query_id", "vec_id", _r4(F.col("score"), "score"),
        F.col("rank").cast("long").alias("rank"),
    )


@q(
    "ivf_topk",
    f"""WITH cent AS (
         SELECT CAST(row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS BIGINT)
                    AS cid,
                embedding
         FROM (SELECT vec_id, embedding, {_duck_h60("vec_id")} AS h FROM embeddings
               ORDER BY h ASC, vec_id ASC LIMIT 16)),
       d2 AS (
         SELECT e.vec_id AS eid, c.cid AS cid,
                list_reduce(list_transform(range(1, 65),
                    i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                       * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)),
                    (acc, x) -> acc + x) AS d2
         FROM embeddings e CROSS JOIN cent c),
       assign AS (
         SELECT eid AS vec_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn
           FROM d2)
         WHERE rn = 1),
       qprobe AS (
         SELECT eid AS query_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn
           FROM d2 WHERE eid < 50)
         WHERE rn <= 4),
       cand AS (SELECT q.query_id, s.vec_id
                FROM qprobe q JOIN assign s ON s.cid = q.cid),
       scored AS (SELECT c.query_id, c.vec_id, {_COS_SQL} AS score
                  FROM cand c
                  JOIN embeddings a ON a.vec_id = c.query_id
                  JOIN embeddings b ON b.vec_id = c.vec_id)
       SELECT query_id, vec_id, round(score, 4) AS score, CAST(rn AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id ASC) AS rn
             FROM scored)
       WHERE rn <= 10""",
)
def _ivf_topk(spark, sf_dir):
    """IVF approximate top-k — deterministic-quantizer default: seed
    centroids are an md5-rank uniform sample of the corpus
    (ivf_seed_centroids), so the whole pipeline — seeding, assignment
    argmin, nprobe probing, cosine rerank — is reproducible in any
    engine and hash-MATCHes the DuckDB replay. The MLlib KMeans
    quantizer (``ivf_build_index``) stays the opt-in when fit quality
    matters more than cross-engine reproducibility (its fit RNG is
    engine-private → was this query's old rows-only path)."""
    from redshells_spark.similarity.ann import (
        assign_to_centroids,
        ivf_seed_centroids,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = ivf_seed_centroids(emb, num_centroids=16)
    assigned = assign_to_centroids(emb, centroids)
    out = ivf_topk(queries, assigned, centroids, k=10, nprobe=4)
    return out.select(
        "query_id", "vec_id", _r4(F.col("score"), "score"),
        F.col("rank").cast("long").alias("rank"),
    )


@q(
    "semantic_dedup",
    f"""WITH cent AS (
         SELECT CAST(row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS BIGINT)
                    AS cid,
                embedding
         FROM (SELECT vec_id, embedding, {_duck_h60("vec_id")} AS h FROM embeddings
               ORDER BY h ASC, vec_id ASC LIMIT 16)),
       d2 AS (
         SELECT e.vec_id AS eid, c.cid AS cid,
                list_reduce(list_transform(range(1, 65),
                    i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                       * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)),
                    (acc, x) -> acc + x) AS d2
         FROM embeddings e CROSS JOIN cent c),
       assign AS (
         SELECT eid AS vec_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn
           FROM d2)
         WHERE rn = 1),
       pairs AS (
         SELECT s1.vec_id AS id1
         FROM assign s0
         JOIN assign s1 ON s0.cid = s1.cid AND s0.vec_id < s1.vec_id
         JOIN embeddings a ON a.vec_id = s0.vec_id
         JOIN embeddings b ON b.vec_id = s1.vec_id
         WHERE {_COS_SQL} >= 0.25),
       dropped AS (SELECT DISTINCT id1 AS vec_id FROM pairs)
       SELECT s.vec_id, s.cid
       FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
       WHERE d.vec_id IS NULL""",
)
def _semantic_dedup(spark, sf_dir):
    """SemDeDup (dedup/semantic.py, Abbas et al. 2023): embedding-space
    near-duplicate removal — cluster with the md5-seeded deterministic
    quantizer, pairwise cosine ONLY within clusters (the quadratic term
    is bounded by the largest cluster, the paper's scalability
    argument), drop every vector with a lower-id near-dup neighbor.
    The synthetic embeddings carry no true semantic duplicates (max
    within-cluster cosine ≈ 0.49), so this registry instance runs a
    demonstrative 0.25 threshold to exercise the drop path end-to-end;
    the operator default stays at the paper's 0.95."""
    from redshells_spark.dedup.semantic import semantic_dedup
    from redshells_spark.similarity.ann import ivf_seed_centroids

    emb = _t(spark, sf_dir, "embeddings")
    centroids = ivf_seed_centroids(emb, num_centroids=16)
    kept = semantic_dedup(emb, centroids, threshold=0.25)
    return kept.select("vec_id", F.col("cid").cast("long").alias("cid"))


@q(
    "sum_embeddings_by_key",
    """SELECT label, CAST(dim - 1 AS BIGINT) AS dim, round(s, 4) AS s FROM (
         SELECT label, dim, sum(x) AS s FROM (
           SELECT label, unnest(embedding::DOUBLE[]) AS x,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings)
         GROUP BY label, dim)""",
)
def _sum_embeddings_by_key(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum(F.col("x").cast("double")).alias("s"))
        .select("label", F.col("dim").cast("long").alias("dim"), _r4(F.col("s"), "s"))
    )


@q(
    "embedding_near_dup",
    f"""SELECT a.vec_id AS id0, b.vec_id AS id1, round({_COS_SQL}, 4) AS similarity
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE {_COS_SQL} >= 0.3""",
)
def _embedding_near_dup(spark, sf_dir):
    # BLAS-vectorized path: one matmul per Arrow batch vs n²·d Catalyst
    # lambda steps (~30× at sf0.1); the pure-Catalyst variant stays in
    # dedup.embedding for bounded inputs
    from redshells_spark.similarity.allpairs import all_pairs_above_threshold

    out = all_pairs_above_threshold(_t(spark, sf_dir, "embeddings"), threshold=0.3)
    return out.select("id0", "id1", _r4(F.col("similarity"), "similarity"))




@q(
    "int8_quantize_embeddings",
    """WITH x AS (
         SELECT vec_id,
                generate_subscripts(embedding, 1) - 1 AS dim,
                unnest(embedding::DOUBLE[]) AS x
         FROM embeddings),
       am AS (SELECT dim, max(abs(x)) AS absmax FROM x GROUP BY dim),
       c AS (
         SELECT x.vec_id, x.x, am.absmax,
                CASE WHEN am.absmax > 0
                     THEN CAST(greatest(least(
                              floor(x.x * 127 / am.absmax + CAST(0.5 AS DOUBLE)),
                              127), -127) AS BIGINT)
                     ELSE 0 END AS code
         FROM x JOIN am ON x.dim = am.dim),
       e AS (
         SELECT vec_id, code,
                x - (CASE WHEN absmax > 0
                          THEN (code * absmax) / 127 ELSE CAST(0 AS DOUBLE) END) AS d
         FROM c)
       SELECT vec_id,
              CAST(sum(code) AS BIGINT) AS code_sum,
              CAST(sum(abs(code)) AS BIGINT) AS code_l1,
              CAST(sum(CAST(floor(d * d * CAST(100000000 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT))
                   AS BIGINT) AS err_e8
       FROM e GROUP BY vec_id""",
)
def _int8_quantize_embeddings(spark, sf_dir):
    """Symmetric per-dimension int8 quantization of the embedding
    corpus (similarity/quantize.py): the dim-row absmax table is one
    tiny aggregate broadcast back, codes are
    floor(x*127/absmax + 0.5) in pure codegen, and the report exports
    exact integer code checksums (pinning every code bit-for-bit)
    plus the reconstruction error in 1e-8 fixed point. The 4×-smaller
    int8 corpus is what ships to an ANN index or serving fleet."""
    from redshells_spark.similarity.quantize import int8_reconstruction_report

    return int8_reconstruction_report(_t(spark, sf_dir, "embeddings"))


@q(
    "hard_negative_mining",
    f"""WITH p AS (
         SELECT a.vec_id AS id, b.vec_id AS neg_id,
                a.label AS label, b.label AS neg_label,
                round({_COS_SQL}, 4) AS similarity
         FROM embeddings a JOIN embeddings b ON a.label <> b.label)
       SELECT id, neg_id, label, neg_label, similarity
       FROM p
       QUALIFY row_number() OVER (PARTITION BY id
                                  ORDER BY similarity DESC, neg_id ASC) <= 2""",
)
def _hard_negative_mining(spark, sf_dir):
    """Contrastive-training hard negatives (similarity/negatives.py):
    top-2 most-similar different-label vectors per anchor. The exact
    all-pairs path here is row-cap guarded (refuses >100k rows); at
    corpus scale candidates come from the bucketed LSH path
    (hard_negatives_ann) instead. Rank on the ROUNDED cosine with a
    neg_id tie-break keeps the selection engine-independent."""
    from redshells_spark.similarity.negatives import hard_negatives_exact

    emb = _t(spark, sf_dir, "embeddings")
    out = hard_negatives_exact(emb, k=2)
    return out.select("id", "neg_id", "label", "neg_label", "similarity")


@q(
    "ann_recall_report",
    f"""WITH {_planes_sql()},{_LSH_SIG_SQL},
       qsig AS (SELECT vec_id AS query_id, sig FROM sig WHERE vec_id < 200),
       qb AS (SELECT query_id, block_idx, (sig >> (block_idx * 4)) & 15 AS block_val
              FROM qsig, blk
              UNION
              SELECT query_id, block_idx,
                     xor((sig >> (block_idx * 4)) & 15, 1::BIGINT << f.b)
              FROM qsig, blk, (SELECT unnest(range(4)) AS b) f),
       cb AS (SELECT vec_id, block_idx, (sig >> (block_idx * 4)) & 15 AS block_val
              FROM sig, blk),
       cand AS (SELECT DISTINCT qb.query_id, cb.vec_id
                FROM qb JOIN cb USING (block_idx, block_val)),
       scored AS (SELECT c.query_id, c.vec_id, {_COS_SQL} AS score
                  FROM cand c
                  JOIN embeddings a ON a.vec_id = c.query_id
                  JOIN embeddings b ON b.vec_id = c.vec_id),
       lsh AS (SELECT query_id, vec_id
               FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                                  ORDER BY score DESC, vec_id ASC) AS rn
                     FROM scored)
               WHERE rn <= 10),
       bf AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id
              FROM (SELECT * FROM embeddings WHERE vec_id < 200) a
              CROSS JOIN embeddings b
              QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                         ORDER BY {_COS_SQL} DESC, b.vec_id ASC) <= 10)
       SELECT b.query_id, CAST(count(l.vec_id) AS BIGINT) AS n_hits,
              round(count(l.vec_id) / 10.0, 4) AS recall_at_10
       FROM bf b LEFT JOIN lsh l
         ON l.query_id = b.query_id AND l.vec_id = b.vec_id
       GROUP BY b.query_id""",
)
def _ann_recall_report(spark, sf_dir):
    """Offline ANN quality audit: per-query recall@10 of the
    multiprobe-LSH stage against the exact top-10 (the number a serving
    team monitors before trading recall for latency). Composes the two
    already-oracled retrieval paths — the exact side on the BLAS matmul
    route, the LSH side on the literal-hyperplane route — and counts
    the overlap; the DuckDB oracle rebuilds both rankings in SQL."""
    from redshells_spark.similarity.allpairs import matmul_topk
    from redshells_spark.similarity.ann import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = lsh_topk(
        queries, emb, k=10, num_planes=16, num_blocks=4, dim=64, multiprobe=1
    ).select("query_id", "vec_id", F.lit(1).alias("__hit"))
    exact = matmul_topk(queries, emb, k=10).select("query_id", "vec_id")
    return (
        exact.join(lsh, on=["query_id", "vec_id"], how="left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_10"),
        )
    )
