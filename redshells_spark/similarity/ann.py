"""Similarity search over an embedding column (array<float>).

Three tiers, trading recall for cost:

- :func:`brute_force_topk` — exact top-k cosine per query; broadcast
  the (small) query side, per-partition partial top-k via window.
  The baseline and the verifier for the approximate tiers.
- :func:`lsh_topk` — random-hyperplane LSH: only candidates sharing a
  signature block are scored. Sub-linear candidate sets at 100 TB.
- :func:`ivf_topk` — IVF: k-means coarse quantizer (MLlib KMeans);
  queries probe ``nprobe`` nearest centroids, scoring only those
  inverted lists. The scale path when embeddings are re-used across
  many query batches.

Generalizes the reference's two-stage retrieval
(``calculate_word_item_similarity.py:42-58``: cheap dot-product
prequery → expensive rerank): stage 1 here is the ANN candidate
generation, stage 2 the exact cosine rerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import cosine_similarity, dot_product
from redshells_spark.operators.topk import per_group_topk


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    embedding_column: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbours per query → (query_id, vec_id, score, rank).

    Broadcast-crossJoin (queries are the small side by construction) →
    codegen cosine → per-query window top-k. No shuffle of the corpus;
    the only exchange is the final window on query_id, whose input is
    already pruned to per-partition top-k by WindowGroupLimit."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(embedding_column).alias("__qe")
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(embedding_column).alias("__ce")
    )
    score = (
        cosine_similarity("__qe", "__ce") if metric == "cosine" else dot_product("__qe", "__ce")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", score.alias("score")
    )
    return per_group_topk(
        scored, "query_id", "score", k, tie_break=["vec_id"], rank_column="rank"
    )


def lsh_hyperplane_signatures(
    embeddings: DataFrame,
    num_planes: int = 16,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """→ (id, sig:long): sign-bit signature against ``num_planes``
    deterministic pseudo-random hyperplanes.

    Plane p's component d = centered hash(p, d, seed) — generated as an
    array expression, never materialized as a table; the signature is
    one codegen expression per row."""
    if dim is None:
        dim = len(
            embeddings.select(embedding_column).filter(F.col(embedding_column).isNotNull()).first()[0]
        )
    e = F.col(embedding_column)
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        comp = F.aggregate(
            F.zip_with(
                F.transform(e, lambda x: x.cast("double")),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x
                * ((F.xxhash64(F.lit(p * 1000003 + seed), d) % 1000).cast("double") / 500.0 - 1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(comp > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return embeddings.select(F.col(id_column).alias("vec_id"), sig.alias("sig"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int = 16,
    num_blocks: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 of ``num_blocks``
    signature blocks (multi-probe banding), then exact cosine rerank.
    Recall rises with num_blocks (more probes) and falls with
    num_planes (finer buckets)."""
    dim = len(queries.select(embedding_column).first()[0])
    qsig = lsh_hyperplane_signatures(
        queries.withColumnRenamed(query_id, "vec_id"), num_planes, "vec_id",
        embedding_column, dim=dim, seed=seed,
    ).withColumnRenamed("vec_id", "query_id")
    csig = lsh_hyperplane_signatures(
        corpus, num_planes, corpus_id, embedding_column, dim=dim, seed=seed
    )
    width = num_planes // num_blocks

    def blocks(sig_df: DataFrame, idcol: str) -> DataFrame:
        blk = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("sig"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for i in range(num_blocks)
                ]
            )
        ).alias("blk")
        return sig_df.select(idcol, blk).select(idcol, "blk.block_idx", "blk.block_val")

    cand = (
        blocks(qsig, "query_id")
        .join(blocks(csig, "vec_id"), on=["block_idx", "block_val"])
        .select("query_id", "vec_id")
        .dropDuplicates()
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(embedding_column).alias("__qe"))
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(embedding_column).alias("__ce"))
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="vec_id")
        .select("query_id", "vec_id", cosine_similarity("__qe", "__ce").alias("score"))
    )
    return per_group_topk(scored, "query_id", "score", k, tie_break=["vec_id"], rank_column="rank")


def ivf_build_index(
    corpus: DataFrame,
    num_centroids: int = 64,
    corpus_id: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """K-means coarse quantizer → (corpus with ``centroid`` assignment,
    centroid list). MLlib KMeans fits on a sample; assignment is a
    transform (no iteration over the full corpus beyond fit)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.withColumn("__v", array_to_vector(F.col(embedding_column).cast("array<double>")))
    km = KMeans(k=num_centroids, seed=seed, featuresCol="__v", predictionCol="centroid")
    model = km.fit(vecs)
    assigned = model.transform(vecs).drop("__v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    queries: DataFrame,
    indexed_corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest centroids per query; exact cosine
    over those inverted lists only. The centroid table is a literal
    array expression (num_centroids ≤ a few thousand)."""
    cent = F.array(
        *[F.array(*[F.lit(x) for x in c]).cast("array<double>") for c in centroids]
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(embedding_column).alias("__qe"))
    qprobe = (
        q.withColumn(
            "__dists",
            F.transform(
                cent,
                lambda c, i: F.struct(
                    F.aggregate(
                        F.zip_with(F.transform(F.col("__qe"), lambda x: x.cast("double")), c,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    i.alias("centroid"),
                ),
            ),
        )
        .withColumn("__probe", F.slice(F.array_sort("__dists"), 1, nprobe))
        .select("query_id", "__qe", F.explode("__probe.centroid").alias("centroid"))
    )
    c = indexed_corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(embedding_column).alias("__ce"), "centroid"
    )
    scored = qprobe.join(c, on="centroid").select(
        "query_id", "vec_id", cosine_similarity("__qe", "__ce").alias("score")
    )
    return per_group_topk(scored, "query_id", "score", k, tie_break=["vec_id"], rank_column="rank")
