"""Embedding-cosine near-duplicate pairs.

Semantic near-dup detection over an ``array<float>`` embedding column.
Exact variant: blocked all-pairs cosine ≥ threshold (O(n²) — bounded
inputs or post-LSH candidates). Scale variant: bucket by LSH random
hyperplanes first (see :mod:`redshells_spark.similarity.ann`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import cosine_similarity
from redshells_spark.operators.joins import blocked_pairwise_similarity


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """→ (id0, id1, cosine ≥ threshold), id0 < id1."""
    return blocked_pairwise_similarity(
        embeddings,
        id_column=id_column,
        embedding_column=embedding_column,
        metric="cosine",
        upper_triangular=True,
    ).filter(F.col("similarity") >= threshold)


def embedding_near_dup_pairs_scalable(
    embeddings: DataFrame,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    num_blocks: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Scale variant: LSH-banded candidate buckets + exact cosine
    verification (:func:`redshells_spark.similarity.ann.
    lsh_pairs_above_threshold`) — sub-quadratic, precision exact,
    recall probe-bound. Use when the corpus exceeds what the exact
    blocked path may accept (1M rows)."""
    from redshells_spark.similarity.ann import lsh_pairs_above_threshold

    return lsh_pairs_above_threshold(
        embeddings,
        threshold=threshold,
        num_planes=num_planes,
        num_blocks=num_blocks,
        id_column=id_column,
        embedding_column=embedding_column,
        metric="cosine",
        dim=dim,
        seed=seed,
    )
