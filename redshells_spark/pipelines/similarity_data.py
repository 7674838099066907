"""Similarity training pairs — §2.I ``make_similarity_data``.

Reference ``app/word_item_similarity/make_similarity_data.py:14-82``:
- word-based positives: for each word's item list, pair items with a
  permutation of the same list (``:51-55``);
- word-based negatives: pair group items with random items outside the
  group (``:57-66``);
- MF-threshold positives/negatives: similarity > / < rate thresholds,
  sorted, capped (``:68-82``);
- dedup on the pair, concat.

Determinism: the reference permutes with unseeded RNG; here the
"random" pairing uses a seeded portable hash ordering so pairs are
reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.operators.setops import union_concat
from redshells_spark.operators.topk import topk_threshold_similarity
from redshells_spark.schema import portable_hash_str


def random_pair_within_group(
    word2items: DataFrame,
    word_column: str = "word",
    item_column: str = "item_id",
    seed: int = 42,
) -> DataFrame:
    """Positive pairs: each group's items zipped against a seeded
    permutation of the same items (reference ``:51-55``). Window
    row-number against hash-ordered row-number — no collect_list
    explosion for big groups."""
    w_orig = Window.partitionBy(word_column).orderBy(F.col(item_column))
    w_perm = Window.partitionBy(word_column).orderBy(portable_hash_str(item_column, seed))
    a = word2items.select(
        word_column, F.col(item_column).alias("item_id_0"),
        F.row_number().over(w_orig).alias("__r"),
    )
    b = word2items.select(
        word_column, F.col(item_column).alias("item_id_1"),
        F.row_number().over(w_perm).alias("__r"),
    )
    return (
        a.join(b, on=[word_column, "__r"])
        .filter(F.col("item_id_0") != F.col("item_id_1"))
        .select(word_column, "item_id_0", "item_id_1")
    )


def cross_group_negative_pairs(
    word2items: DataFrame,
    word_column: str = "word",
    item_column: str = "item_id",
    seed: int = 42,
) -> DataFrame:
    """Negatives: group items paired with hash-sampled items from
    all_items − group (reference ``:57-66``). Candidate = global
    hash-ordered item list; anti-join removes same-group collisions."""
    items = word2items.select(item_column).distinct()
    w_global = Window.orderBy(portable_hash_str(item_column, seed))
    ranked_items = items.select(
        F.col(item_column).alias("item_id_1"),
        (F.row_number().over(w_global) - 1).alias("__gr"),
    )
    n_items = items.count()
    w_grp = Window.partitionBy(word_column).orderBy(F.col(item_column))
    grp = word2items.select(
        word_column,
        F.col(item_column).alias("item_id_0"),
        ((F.row_number().over(w_grp) * 2654435761 + seed) % n_items).alias("__gr"),
    )
    paired = grp.join(F.broadcast(ranked_items), on="__gr").select(
        word_column, "item_id_0", "item_id_1"
    )
    same_group = word2items.select(
        word_column, F.col(item_column).alias("item_id_1")
    )
    return paired.join(same_group, on=[word_column, "item_id_1"], how="left_anti")


def make_similarity_data(
    word2items: DataFrame,
    mf_similarity: DataFrame | None = None,
    word_column: str = "word",
    item_column: str = "item_id",
    positive_rate: float = 0.7,
    negative_rate: float = 0.3,
    max_pairs: int = 500000,
    seed: int = 42,
) -> DataFrame:
    """→ (item_id_0, item_id_1, similarity ∈ {0,1}), deduped on the
    pair. ``mf_similarity`` = (id0, id1, similarity score) from
    :func:`redshells_spark.ml.matrix_factorization.mf_item_similarity`.
    Caps mirror ``build_word_item_similarity.py:75-80``."""
    # the (word, item) relation feeds FIVE consumers across the
    # positive/negative branches (both permutation sides, the distinct
    # item list, the group ranks, the same-group anti join) — pin it or
    # the caller's upstream plan re-runs per consumer; same for the
    # pair-bounded MF score relation (top-k cut + hard-negative cut)
    word2items = word2items.localCheckpoint(eager=True)
    if mf_similarity is not None:
        mf_similarity = mf_similarity.localCheckpoint(eager=True)
    pos = random_pair_within_group(word2items, word_column, item_column, seed).select(
        "item_id_0", "item_id_1", F.lit(1).alias("similarity")
    )
    neg = cross_group_negative_pairs(word2items, word_column, item_column, seed).select(
        "item_id_0", "item_id_1", F.lit(0).alias("similarity")
    )
    parts = [pos, neg]
    if mf_similarity is not None:
        mf_pos = topk_threshold_similarity(
            mf_similarity, "similarity", positive_rate, max_pairs, tie_break=["id0", "id1"]
        ).select(
            F.col("id0").alias("item_id_0"), F.col("id1").alias("item_id_1"),
            F.lit(1).alias("similarity"),
        )
        # reference _negative_similarity sorts similarity DESC and takes
        # head(size): keeps the hardest negatives just below the
        # threshold, mirroring the positive side's top-k shape.
        mf_neg = (
            mf_similarity.filter(F.col("similarity") < negative_rate)
            .orderBy(F.col("similarity").desc(), F.col("id0").asc(), F.col("id1").asc())
            .limit(max_pairs)
            .select(
                F.col("id0").alias("item_id_0"), F.col("id1").alias("item_id_1"),
                F.lit(0).alias("similarity"),
            )
        )
        parts += [mf_pos, mf_neg]
    # pair dedup: the reference concats positives first then
    # drop_duplicates keep-first → positives win on conflict. The
    # deterministic distributed equivalent is max(similarity) per pair
    # (1 > 0), which is also partition-order-independent.
    return (
        union_concat(*parts)
        .groupBy("item_id_0", "item_id_1")
        .agg(F.max("similarity").alias("similarity"))
    )
