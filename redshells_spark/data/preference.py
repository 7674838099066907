"""Preference-data construction for RLHF/DPO pipelines: chosen/
rejected pair building, best-of-n selection, and pairwise win-rate
matrices with Wilson confidence bounds.

The reference builds click-based training pairs
(``redshells/app/word_item_similarity/make_click_train_data.py``) and
similarity pairs (``make_similarity_data.py``); modern preference
tuning needs the analogous constructions over *scored responses*:
DPO-style (chosen, rejected) pairs with a margin gate (Rafailov et
al. 2023), best-of-n / rejection-sampling selection (Nakano et al.
2021), and per-model-pair win rates (arena leaderboards) —
complementing the Bradley-Terry ratings in ``ml/bradley_terry.py``.

Every ranking is a per-group window with deterministic tie-breaks;
scores compare as exact fixed-point longs (callers pass a cents/e4
column) so margins are engine-independent. Win rates export the full
Wilson interval as a fixed IEEE expression tree over exact longs.

Scale: windows partition by the group key (prompt / customer / model
pair) — no global sort anywhere; the rank-k cut keeps at most
2*max_pairs rows per group past the window (WindowGroupLimit pushes
the filter into the sort at the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def preference_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str,
    min_margin: int,
    max_pairs_per_group: int = 1,
) -> DataFrame:
    """Build DPO (chosen, rejected) pairs per group: rank items by
    ``score_col`` (an exact integer score — cents / e4 fixed-point)
    descending and ascending, pair rank-i-from-top with
    rank-i-from-bottom for i = 1..max_pairs_per_group, and keep pairs
    whose margin >= ``min_margin`` and whose two items differ (odd
    group sizes make the middle element meet itself).

    Ties break on the item id ascending, so the pair set is a pure
    function of the data. Output: (group, chosen_item, chosen_score,
    rejected_item, rejected_score, margin, pair_rank).

    ``min_margin`` must be >= 1: at margin 0 the top-i/bottom-i pairing
    emits mirrored duplicates ((A,B) at rank 1 and (B,A) at rank 2 for a
    tied 2-item group) — contradictory DPO rows — and a negative margin
    admits crossed pairs where rejected outranks chosen."""
    if int(min_margin) < 1:
        raise ValueError(
            f"min_margin must be >= 1 (got {min_margin}): margin<=0 admits "
            "mirrored/crossed chosen-rejected pairs"
        )
    top_w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    bot_w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(item_col).desc()
    )
    k = int(max_pairs_per_group)
    top = (
        df.select(group_col, item_col, score_col)
        .withColumn("pair_rank", F.row_number().over(top_w))
        .filter(F.col("pair_rank") <= k)
        .select(
            group_col,
            "pair_rank",
            F.col(item_col).alias("chosen_item"),
            F.col(score_col).alias("chosen_score"),
        )
    )
    bot = (
        df.select(group_col, item_col, score_col)
        .withColumn("pair_rank", F.row_number().over(bot_w))
        .filter(F.col("pair_rank") <= k)
        .select(
            group_col,
            "pair_rank",
            F.col(item_col).alias("rejected_item"),
            F.col(score_col).alias("rejected_score"),
        )
    )
    return (
        top.join(bot, [group_col, "pair_rank"])
        .filter(F.col("chosen_item") != F.col("rejected_item"))
        .withColumn(
            "margin", (F.col("chosen_score") - F.col("rejected_score")).cast("long")
        )
        .filter(F.col("margin") >= int(min_margin))
        .select(
            group_col,
            "chosen_item",
            "chosen_score",
            "rejected_item",
            "rejected_score",
            "margin",
            F.col("pair_rank").cast("long").alias("pair_rank"),
        )
    )


def best_of_n(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str,
) -> DataFrame:
    """Rejection-sampling selection: per group, the top-scored item
    (ties to the smaller item id), its score, the runner-up score,
    the win margin, and the candidate count. Groups with a single
    candidate report a null runner-up and margin — kept, because
    best-of-1 is still a selection."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    ranked = df.select(group_col, item_col, score_col).withColumn(
        "__rk", F.row_number().over(w)
    )
    counts = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    best = ranked.filter(F.col("__rk") == 1).select(
        group_col,
        F.col(item_col).alias("best_item"),
        F.col(score_col).alias("best_score"),
    )
    second = ranked.filter(F.col("__rk") == 2).select(
        group_col, F.col(score_col).alias("second_score")
    )
    return (
        best.join(second, group_col, "left")
        .join(counts, group_col)
        .select(
            group_col,
            "best_item",
            "best_score",
            "second_score",
            (F.col("best_score") - F.col("second_score"))
            .cast("long")
            .alias("margin"),
            "n_candidates",
        )
    )


def pair_win_counts(
    matches: DataFrame,
    winner_col: str,
    loser_col: str,
) -> DataFrame:
    """Fold a match log to per-unordered-pair exact counts
    (model_a < model_b, games, wins_a) — the associative int64 state
    a streaming ingest can merge across micro-batches with no drift."""
    m = matches.select(
        F.least(winner_col, loser_col).alias("model_a"),
        F.greatest(winner_col, loser_col).alias("model_b"),
        (F.col(winner_col) < F.col(loser_col)).cast("int").alias("a_won"),
    )
    return m.groupBy("model_a", "model_b").agg(
        F.count(F.lit(1)).cast("long").alias("games"),
        F.sum("a_won").cast("long").alias("wins_a"),
    )


def win_rate_from_counts(s: DataFrame, z: float = 1.96) -> DataFrame:
    """Wilson-bounded win rates from a (model_a, model_b, games,
    wins_a) counts relation — the derivation half of
    :func:`win_rate_matrix`, shared with the streaming state so
    stream == batch bit-for-bit."""
    p = F.col("wins_a").cast("double") / F.col("games")
    zl = F.lit(float(z))
    n = F.col("games")
    center = p + zl * zl / (2 * n)
    margin = zl * F.sqrt(p * (F.lit(1) - p) / n + zl * zl / (4 * n * n))
    denom = F.lit(1) + zl * zl / n
    return s.select(
        "model_a",
        "model_b",
        "games",
        "wins_a",
        p.alias("win_rate_a"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
    )


def win_rate_matrix(
    matches: DataFrame,
    winner_col: str,
    loser_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per unordered pair (model_a < model_b): games, wins_a,
    win_rate_a, and the Wilson score interval on it — the
    leaderboard-cell statistic that Bradley-Terry ratings summarize
    globally. One map-combined aggregate over the match log; the
    interval is the same fixed-tree IEEE export as
    ``ctr_wilson_bounds``."""
    return win_rate_from_counts(
        pair_win_counts(matches, winner_col, loser_col), z=z
    )
