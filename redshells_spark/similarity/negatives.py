"""Hard-negative mining for embedding/contrastive training data.

For every anchor vector, find the most-similar vectors with a
DIFFERENT label — the "hard negatives" that make contrastive and
metric-learning batches informative (the in-batch-negatives
alternative wastes most pairs on easy negatives).

Scale design: the exact path is an all-pairs label-mismatch join and
is guarded by a row-cap probe (`limit(cap+1).count()`, the same
refuse-don't-OOM contract as operators/joins.py
blocked_pairwise_similarity) — use it per label-block or per
retrieval shard. The scale path reuses the ANN tier: over-fetch
top-(k·oversample) neighbors from similarity/ann.py (LSH/IVF) and
keep the first k with a different label, so candidate generation is
bucketed, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.vector import cosine_similarity
from redshells_spark.schema import require_columns


def hard_negatives_exact(
    emb: DataFrame,
    k: int = 1,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    label_column: str = "label",
    max_rows: int = 100_000,
    score_decimals: int = 4,
) -> DataFrame:
    """→ (id, neg_id, similarity, label, neg_label): the k most-similar
    different-label vectors per anchor. Exact all-pairs — refuses
    inputs over ``max_rows`` (cap probe, no silent OOM); rank runs on
    the ROUNDED cosine with a neg_id tie-break so results are
    engine-independent."""
    require_columns(emb, [id_column, vector_column, label_column])
    n = emb.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"hard_negatives_exact: input exceeds max_rows={max_rows}; "
            "shard by label block or use hard_negatives_ann"
        )
    a = emb.select(
        F.col(id_column).alias("id"),
        F.col(vector_column).alias("va"),
        F.col(label_column).alias("label"),
    )
    b = emb.select(
        F.col(id_column).alias("neg_id"),
        F.col(vector_column).alias("vb"),
        F.col(label_column).alias("neg_label"),
    )
    pairs = a.join(b, F.col("label") != F.col("neg_label")).select(
        "id",
        "neg_id",
        "label",
        "neg_label",
        F.round(
            cosine_similarity(
                F.col("va").cast("array<double>"),
                F.col("vb").cast("array<double>"),
            ),
            score_decimals,
        ).alias("similarity"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("similarity").desc(), F.col("neg_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hard_negatives_ann(
    emb: DataFrame,
    k: int = 1,
    oversample: int = 4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    label_column: str = "label",
    **lsh_kwargs,
) -> DataFrame:
    """→ same shape via the LSH ANN path: over-fetch k·oversample
    nearest neighbors per anchor (bucketed, never all-pairs), drop
    same-label hits, keep the top k. Recall depends on the oversample
    factor — hard negatives missed when more than (oversample-1)·k of
    the fetched neighbors share the anchor's label."""
    from redshells_spark.similarity.ann import lsh_topk

    queries = emb.select(
        F.col(id_column).alias("query_id"), F.col(vector_column).alias("embedding")
    )
    neighbors = lsh_topk(queries, emb, k=k * oversample + 1, **lsh_kwargs)
    labels = emb.select(
        F.col(id_column).alias("query_id"), F.col(label_column).alias("label")
    )
    neg_labels = emb.select(
        F.col(id_column).alias("vec_id"), F.col(label_column).alias("neg_label")
    )
    cand = (
        neighbors.join(labels, "query_id")
        .join(neg_labels, "vec_id")
        .filter(F.col("label") != F.col("neg_label"))
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("query_id").alias("id"),
            F.col("vec_id").alias("neg_id"),
            "label",
            "neg_label",
            F.col("score").alias("similarity"),
        )
    )
