"""Sort / limit / top-k operators — §2.E of SURVEY.md.

Global top-k compiles to ``TakeOrderedAndProject`` (per-partition heap
+ driver merge — no global sort); per-group top-k is one window shuffle
with rank pruning pushed below the sort by Catalyst's
``WindowGroupLimit`` (Spark ≥3.5 pushes rank<=k into partial top-k per
partition before the shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def topk_threshold_similarity(
    df: DataFrame,
    score_column: str,
    threshold: float,
    size: int,
    ascending: bool = False,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Filter score > threshold, sort, head(size) (reference
    ``make_similarity_data.py:68-82``). ``tie_break`` columns make the
    limit deterministic when scores collide."""
    require_columns(df, [score_column])
    order = [F.col(score_column).asc() if ascending else F.col(score_column).desc()]
    order += [F.col(c).asc() for c in tie_break]
    return df.filter(F.col(score_column) > threshold).orderBy(*order).limit(size)


def per_group_topk(
    df: DataFrame,
    group_column: str | Sequence[str],
    order_by: Column | str,
    k: int | Column,
    ascending: bool = False,
    tie_break: Sequence[str] = (),
    rank_column: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number window (reference per-doc
    TF-IDF top-k ``model/tfidf.py:20-24``; per-word rerank
    ``calculate_word_item_similarity.py:42-58``).

    ``k`` may be a Column for per-group adaptive k (e.g. the TF-IDF
    ``ceil(len·rate)+1`` rule)."""
    groups = [group_column] if isinstance(group_column, str) else list(group_column)
    order_col = F.col(order_by) if isinstance(order_by, str) else order_by
    order = [order_col.asc() if ascending else order_col.desc()]
    order += [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(*groups).orderBy(*order)
    k_col = F.lit(k) if isinstance(k, int) else k
    out = df.withColumn("__rank", F.row_number().over(w)).filter(F.col("__rank") <= k_col)
    if rank_column:
        return out.withColumnRenamed("__rank", rank_column)
    return out.drop("__rank")
