"""Join-family operators — §2.D of SURVEY.md.

The reference's dict lookups / ``isin`` filters / set subtractions are
all relational joins here, so Catalyst picks broadcast vs sort-merge
and AQE fixes skew at runtime. Small sides (embedding maps, keyword
lists, vocabularies) are explicitly broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.vector import dot_product
from redshells_spark.schema import KNUTH, portable_hash_str, require_columns


def semi_join_isin(
    df: DataFrame, valid: DataFrame, on: str, valid_key: str | None = None,
    broadcast_valid: bool = True,
) -> DataFrame:
    """Keep rows whose key exists in ``valid`` (reference isin filters,
    ``train/train_pairwise_similarity_model.py:49-50``). left_semi
    never duplicates rows and prunes ``valid``'s payload columns."""
    vk = valid_key or on
    v = valid.select(F.col(vk).alias(on)).dropDuplicates()
    if broadcast_valid:
        v = F.broadcast(v)
    return df.join(v, on=on, how="left_semi")


def lookup_join_embedding(
    df: DataFrame,
    embeddings: DataFrame,
    key_column: str,
    embedding_key: str = "vec_id",
    embedding_column: str = "embedding",
    output_column: str | None = None,
    broadcast_embeddings: bool = False,
) -> DataFrame:
    """Map ids → embedding vectors, inner-join semantics (drop misses)
    (reference ``train/train_pairwise_similarity_model.py:51-54``).

    Broadcast when the embedding table fits in executor memory
    (word vocabularies); shuffle-join for 100 TB item tables."""
    out_col = output_column or f"{key_column}_embedding"
    emb = embeddings.select(
        F.col(embedding_key).alias(key_column), F.col(embedding_column).alias(out_col)
    )
    if broadcast_embeddings:
        emb = F.broadcast(emb)
    return df.join(emb, on=key_column, how="inner")


def anti_join_negative_sampling(
    positives: DataFrame,
    user_column: str,
    item_column: str,
    seed: int = 42,
    candidate_factor: int = 3,
) -> DataFrame:
    """Random (user, item) pairs that are NOT observed positives,
    capped at the positive count (reference
    ``app/word_item_similarity/make_click_train_data.py:49-74``).

    Distributed reformulation of the reference's driver-side
    ``np.random.randint`` + set-subtraction:

    1. index users and items densely (exact distinct + row_number —
       both sides are vocabularies, small relative to events),
    2. generate ``candidate_factor ×`` as many candidate pairs as
       positives via per-row deterministic hashes of a ``sequence``
       explode (no driver loop, no RNG-order dependence),
    3. ``left_anti`` join against positives, dedup, cap at n_pos.
    """
    pos = positives.select(user_column, item_column).dropDuplicates()
    n_pos = pos.count()
    users = pos.select(user_column).distinct()
    items = pos.select(item_column).distinct()
    n_users = users.count()
    n_items = items.count()

    users_idx = users.withColumn(
        "__uidx", F.row_number().over(Window.orderBy(user_column)) - 1
    )
    items_idx = items.withColumn(
        "__iidx", F.row_number().over(Window.orderBy(item_column)) - 1
    )

    n_cand = n_pos * candidate_factor
    # candidate k → (hash-derived user index, item index) via two
    # decorrelated multiplicative hashes — pure int64 arithmetic, so
    # the sampling is reproducible in ANY engine (oracle-checkable),
    # unlike engine RNG. Encoded-pair trick from the reference
    # (u + i·n_users) is implicit in independent per-k hashes.
    K2 = 2246822519  # second odd multiplier (xxhash prime), decorrelates axes
    cand = (
        positives.sparkSession.range(n_cand)
        .withColumn(
            "__uidx", ((F.col("id") * KNUTH + seed) % (2**32)) % n_users
        )
        .withColumn(
            "__iidx", ((F.col("id") * K2 + seed) % (2**32)) % n_items
        )
        .drop("id")
        .dropDuplicates(["__uidx", "__iidx"])
    )
    cand = (
        cand.join(F.broadcast(users_idx), on="__uidx")
        .join(F.broadcast(items_idx), on="__iidx")
        .select(user_column, item_column)
    )
    negatives = cand.join(pos, on=[user_column, item_column], how="left_anti")
    return negatives.orderBy(
        portable_hash_str(F.concat_ws("|", user_column, item_column), seed)
    ).limit(n_pos)


def keyword_match_join(
    tokens_df: DataFrame,
    keywords: DataFrame,
    id_column: str,
    token_column: str,
    keyword_column: str = "keyword",
) -> DataFrame:
    """Per-item token set ∩ keyword set → (item_id, keyword) pairs
    (reference ``find_item_keyword_by_matching.py:30-42``). Explode +
    broadcast inner join — the keyword list is always small."""
    require_columns(tokens_df, [id_column, token_column])
    exploded = tokens_df.select(
        id_column, F.explode(token_column).alias(keyword_column)
    ).dropDuplicates([id_column, keyword_column])
    return exploded.join(
        F.broadcast(keywords.select(keyword_column).dropDuplicates()),
        on=keyword_column,
        how="inner",
    ).select(id_column, keyword_column)


def blocked_pairwise_similarity(
    embeddings: DataFrame,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    block_size: int = 1000,
    upper_triangular: bool = True,
    metric: str = "dot",
) -> DataFrame:
    """All-pairs similarity of item vectors, computed block-wise
    (reference ``calculate_similarity_with_matrix_factorization.py:39-66``,
    block size 1000 at ``:28,47-50``).

    Instead of the reference's driver loop over row blocks: assign each
    id a block via ``pmod(xxhash64(id), B)`` where B = ceil(n /
    block_size); replicate each row to its block-pair keys (row in
    block i joins pairs (min(i,j), max(i,j)) for all j); shuffle
    equi-join on the (lo, hi) pair key. Every task is bounded at
    ~block_size² pairs — no BroadcastNestedLoopJoin, no unbounded
    task. For i≠j pairs the output is emitted as (least, greatest),
    which is exact because both metrics are symmetric.

    Still O(n²) total work by nature (as is the reference) — the
    equi-join makes each unit bounded, not the total. Above
    ``max_rows`` this refuses and points at the sub-quadratic LSH path
    (:func:`redshells_spark.similarity.ann.lsh_pairs_above_threshold`).
    """
    max_rows = 1_000_000
    n = embeddings.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"blocked_pairwise_similarity: n > {max_rows} rows means >"
            f" {max_rows}²/2 output pairs; use similarity.ann."
            "lsh_pairs_above_threshold (bucketed, sub-quadratic) instead"
        )
    num_blocks = max(1, -(-n // max(block_size, 1)))
    if metric == "dot":
        sim = dot_product("__e0", "__e1")
    elif metric == "cosine":
        from redshells_spark.functions.vector import cosine_similarity

        sim = cosine_similarity("__e0", "__e1")
    else:
        raise ValueError(f"unknown metric {metric!r}")

    base = embeddings.select(
        F.col(id_column).alias("__id"),
        F.col(embedding_column).alias("__e"),
        F.pmod(F.xxhash64(F.col(id_column)), F.lit(num_blocks)).alias("__blk"),
    )
    other = F.explode(F.sequence(F.lit(0), F.lit(num_blocks - 1))).alias("__oblk")
    # pair key (lo, hi): each unordered block pair meets in exactly one
    # task; both members replicate num_blocks times (the blocked
    # all-pairs replication factor, same as the reference's loop reads)
    left = base.select(
        F.col("__id").alias("id0"), F.col("__e").alias("__e0"), "__blk", other
    ).select(
        "id0", "__e0",
        F.least("__blk", "__oblk").alias("__lo"),
        F.greatest("__blk", "__oblk").alias("__hi"),
        F.col("__blk").alias("__blk0"),
    )
    right = base.select(
        F.col("__id").alias("id1"), F.col("__e").alias("__e1"), "__blk", other
    ).select(
        "id1", "__e1",
        F.least("__blk", "__oblk").alias("__lo"),
        F.greatest("__blk", "__oblk").alias("__hi"),
        F.col("__blk").alias("__blk1"),
    )
    joined = left.join(right, on=["__lo", "__hi"])
    # same-block pairs meet only in their diagonal key (lo==hi) — they
    # also co-occur in every (b, j) key, which must not emit them;
    # cross-block pairs meet exactly once per orientation in (i, j) —
    # keep the blk0 < blk1 orientation
    joined = joined.filter(
        (
            (F.col("__blk0") == F.col("__blk1"))
            & (F.col("__lo") == F.col("__hi"))
            & (F.col("id0") != F.col("id1"))
        )
        | (F.col("__blk0") < F.col("__blk1"))
    )
    if upper_triangular:
        out = joined.filter(F.col("id0") < F.col("id1")).select(
            "id0", "id1", sim.alias("similarity")
        )
        # cross-block pairs surviving only as (hi_id, lo_id) orientation
        # are re-emitted canonically below via the symmetric union
        swapped = joined.filter(
            (F.col("__blk0") < F.col("__blk1")) & (F.col("id0") > F.col("id1"))
        ).select(
            F.col("id1").alias("id0"), F.col("id0").alias("id1"),
            sim.alias("similarity"),
        )
        return out.unionByName(swapped)
    both = joined.select("id0", "id1", sim.alias("similarity"))
    mirrored = joined.filter(F.col("__blk0") < F.col("__blk1")).select(
        F.col("id1").alias("id0"), F.col("id0").alias("id1"), sim.alias("similarity")
    )
    diag_self = base.select(
        F.col("__id").alias("id0"), F.col("__id").alias("id1"),
        F.col("__e").alias("__e0"), F.col("__e").alias("__e1"),
    ).select("id0", "id1", sim.alias("similarity"))
    return both.unionByName(mirrored).unionByName(diag_self)


def cartesian_product_scoring(
    users: DataFrame, items: DataFrame, score_fn
) -> DataFrame:
    """All (user, item) pairs scored (reference
    ``graph_convolutional_matrix_completion.py:391-397``)."""
    return score_fn(users.crossJoin(items))
