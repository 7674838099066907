"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): drop documents whose EMBEDDINGS are near-identical,
catching paraphrases and boilerplate that token-level MinHash misses.

Beyond-reference LLM-pipeline operator. The algorithm is exactly the
paper's shape re-expressed relationally:

1. cluster the embedding space (the paper uses k-means; here any
   centroid list works — :func:`redshells_spark.similarity.ann.
   ivf_seed_centroids` for the deterministic/oracle-checkable path,
   MLlib KMeans via ``ivf_build_index`` when quantizer quality
   matters);
2. compute pairwise cosine ONLY within each cluster — the quadratic
   term is bounded by the largest cluster, never the corpus (that is
   the paper's entire scalability argument: k ≈ √N clusters make the
   expected per-cluster work N/k ≈ √N);
3. drop every vector that has ANY kept (lower-id) near-duplicate
   neighbor at ``threshold`` cosine — the paper keeps one exemplar
   per duplicate group; lowest-id-wins is the deterministic,
   relational form of that choice (no iterative connected components:
   a chain a<b<c with cos(a,b), cos(b,c) ≥ t but cos(a,c) < t drops b
   AND c, which matches the paper's "remove all but one point within
   ε" per-pair semantics, not transitive-closure clustering).

Scale design: one centroid-assignment projection over the corpus
(whole-stage codegen, no shuffle beyond the cluster equi-join), one
equi-join on cluster id with the ``id0 < id1`` triangle filter, one
distinct + anti-join. The ``max_cluster_size`` guard refuses
degenerate quantizers loudly instead of detonating a quadratic join —
re-cluster with more centroids rather than raising it. When the
caller passes no centroids, the count is derived as max(16, ⌈√N⌉)
(similarity.ann.sqrt_num_centroids) so the per-cluster population —
and with it the quadratic within-cluster term — keeps the paper's √N
contract automatically as the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import dot_product, l2_norm
from redshells_spark.schema import require_columns
from redshells_spark.similarity.ann import assign_to_centroids


def _assigned_checkpoint(
    df: DataFrame,
    centroids: list[list[float]],
    embedding_col: str,
) -> DataFrame:
    """df + ``cid``, checkpointed: the assignment feeds the size
    guard, both pair-join sides, AND the final anti-join — without the
    checkpoint the argmin-over-centroids projection re-runs per
    consumer (bench cold run: 36s — the multi-consumer pattern from
    NOTES.md).

    Partitioning (both ends scale-adaptive, no local constants): the
    input is spread to the session core count BEFORE the O(k·d)
    argmin projection (a small corpus arrives as one scan split and
    would otherwise run the whole assignment on one core), and the
    result is hash-partitioned by ``cid`` before the checkpoint so the
    within-cluster pair self-join consumes the SAME partitioning on
    both sides — zero join exchanges, and the quadratic pair compute
    runs at full width instead of whatever AQE's byte estimate of the
    tiny assignment relation would leave."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    id_col = df.columns[0]
    return (
        assign_to_centroids(
            df.repartition(n_part, id_col), centroids, embedding_col
        )
        .withColumnRenamed("centroid", "cid")
        .repartition(n_part, "cid")
        .localCheckpoint(eager=True)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """→ (cid, id0, id1, cos): within-cluster pairs with cosine ≥
    ``threshold`` and ``id0 < id1`` — the semantic near-duplicate
    edge list. ``centroids=None`` seeds k = max(16, ⌈√N⌉) centroids
    from the corpus itself (ivf_seed_centroids) — the paper's √N
    scaling rule, so per-cluster pair work grows ~√N per vector as
    the corpus grows instead of detonating the quadratic term."""
    require_columns(df, [id_col, embedding_col])
    if centroids is None:
        from redshells_spark.similarity.ann import ivf_seed_centroids

        centroids = ivf_seed_centroids(
            df, None, corpus_id=id_col, embedding_column=embedding_col
        )
    assigned = _assigned_checkpoint(
        df.select(id_col, embedding_col), centroids, embedding_col
    )
    return _pairs_from_assigned(
        assigned, threshold, id_col, embedding_col, max_cluster_size
    )


def _pairs_from_assigned(
    assigned: DataFrame,
    threshold: float,
    id_col: str,
    embedding_col: str,
    max_cluster_size: int,
) -> DataFrame:
    big = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_cluster_size)
        .limit(1)
        .count()
    )
    if big:
        raise ValueError(
            f"semantic_dedup: a cluster exceeds max_cluster_size="
            f"{max_cluster_size}; re-cluster with more centroids instead of "
            "raising the cap (the within-cluster join is quadratic)"
        )
    # Precompute each vector's norm ONCE before the pair join: the
    # cosine then costs one dot product per pair instead of three
    # folds (dot + two norms) — bitwise-identical to
    # cosine_similarity's dot/(greatest(||a||,eps)·greatest(||b||,eps)),
    # just with the norm subexpressions hoisted out of the join.
    withn = assigned.withColumn(
        "__n", F.greatest(l2_norm(embedding_col), F.lit(1e-12))
    )
    a = withn.select(
        "cid",
        F.col(id_col).alias("id0"),
        F.col(embedding_col).alias("__e0"),
        F.col("__n").alias("__n0"),
    )
    b = withn.select(
        "cid",
        F.col(id_col).alias("id1"),
        F.col(embedding_col).alias("__e1"),
        F.col("__n").alias("__n1"),
    )
    return (
        a.join(b, "cid")
        .filter(F.col("id0") < F.col("id1"))
        .withColumn(
            "cos",
            dot_product("__e0", "__e1") / (F.col("__n0") * F.col("__n1")),
        )
        .filter(F.col("cos") >= threshold)
        .select("cid", "id0", "id1", "cos")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """→ the deduplicated corpus: input rows minus every vector with a
    lower-id near-duplicate neighbor in its cluster, plus the ``cid``
    assignment column. Lowest id per duplicate pair survives.
    ``centroids=None`` derives the √N centroid count from the corpus
    (see :func:`semantic_dedup_pairs`)."""
    require_columns(df, [id_col, embedding_col])
    if centroids is None:
        from redshells_spark.similarity.ann import ivf_seed_centroids

        centroids = ivf_seed_centroids(
            df, None, corpus_id=id_col, embedding_column=embedding_col
        )
    # ONE assignment pass serves the pair join and the anti-join (the
    # old form recomputed the argmin projection for the anti-join side
    # — the bench's 2.5s final_antijoin stage at sf0.1)
    assigned = _assigned_checkpoint(df, centroids, embedding_col)
    pairs = _pairs_from_assigned(
        assigned.select(id_col, embedding_col, "cid"),
        threshold, id_col, embedding_col, max_cluster_size,
    )
    dropped = pairs.select(F.col("id1").alias(id_col)).distinct()
    return assigned.join(dropped, id_col, "left_anti")
