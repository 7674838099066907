"""Aggregation operators — §2.C of SURVEY.md.

All are single-shuffle groupBy plans with map-side partial
aggregation; none collect to the driver except scalar stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.vector import elementwise_sum, l2_normalize
from redshells_spark.schema import require_columns


def group_count_filter(
    df: DataFrame,
    key_column: str,
    min_count: int | None = None,
    max_count: int | None = None,
) -> DataFrame:
    """Keep rows whose key's group count ∈ [min_count, max_count]
    (reference ``_filter_data``,
    ``app/word_item_similarity/make_click_train_data.py:76-85``).

    Window count over the key — one shuffle, no join back. AQE handles
    skewed keys; for pathological skew pre-aggregate + broadcast the
    count table instead (see ``group_count_filter_via_join``)."""
    require_columns(df, [key_column])
    w = Window.partitionBy(key_column)
    cnt = F.count(F.lit(1)).over(w)
    out = df.withColumn("__cnt", cnt)
    if min_count is not None:
        out = out.filter(F.col("__cnt") >= min_count)
    if max_count is not None:
        out = out.filter(F.col("__cnt") <= max_count)
    return out.drop("__cnt")


def group_count_filter_via_join(
    df: DataFrame,
    key_column: str,
    min_count: int | None = None,
    max_count: int | None = None,
) -> DataFrame:
    """Same semantics via aggregate + semi-join. Preferred when the
    count table is small enough to broadcast (high-cardinality-filtered
    keys): the big side then never shuffles."""
    counts = df.groupBy(key_column).count()
    if min_count is not None:
        counts = counts.filter(F.col("count") >= min_count)
    if max_count is not None:
        counts = counts.filter(F.col("count") <= max_count)
    return df.join(F.broadcast(counts.select(key_column)), on=key_column, how="left_semi")


def distinct_count(df: DataFrame, column: str, approx: bool = False) -> DataFrame:
    """``len(set(col))`` (reference ``make_click_train_data.py:78``).
    ``approx=True`` → HLL sketch, constant memory at 100 TB."""
    agg = (
        F.approx_count_distinct(column) if approx else F.countDistinct(column)
    ).alias(f"{column}_distinct_count")
    return df.agg(agg)


def min_max_avg_std(df: DataFrame, column: str) -> DataFrame:
    """Rating stats for model init/clip (reference
    ``contrib/model/matrix_factorization_model.py:153-156``)."""
    c = F.col(column)
    return df.agg(
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("avg"),
        F.stddev_pop(c).alias("std"),
    )


def sum_embeddings_by_key(
    df: DataFrame,
    key_column: str,
    embedding_column: str,
    normalize: bool = True,
) -> DataFrame:
    """Key embedding = (L2-normalized) elementwise sum of member
    embeddings (reference
    ``app/word_item_similarity/calculate_word_embedding.py:28-35``).

    Implemented as ``reduce(zip_with(+))`` over ``collect_list`` —
    fine when group sizes are bounded. The alternative explode-by-
    dimension path shuffles V×d rows; this keeps one row per member."""
    require_columns(df, [key_column, embedding_column])
    summed = F.aggregate(
        F.collect_list(embedding_column),
        F.expr("cast(array() as array<double>)"),
        lambda acc, v: F.when(F.size(acc) == 0, v.cast("array<double>")).otherwise(
            elementwise_sum(acc, v)
        ),
    )
    out = df.groupBy(key_column).agg(summed.alias("embedding"))
    if normalize:
        out = out.withColumn("embedding", l2_normalize("embedding"))
    return out


def value_counts_id_map(
    df: DataFrame,
    id_column: str,
    min_count: int = 0,
    max_count: int | None = None,
) -> DataFrame:
    """Count-bounded vocabulary with dense indices from 1 (0 reserved
    for unknowns) — reference ``GcmcIdMap``
    (``contrib/model/gcmc_dataset.py:43-70``).

    Index = row_number over id order. The final global row_number is a
    single-partition bottleneck at extreme vocab sizes; beyond ~10⁸
    ids switch to
    :func:`redshells_spark.operators.ids.value_counts_id_map_scalable`
    (range-partition + per-partition numbering + offsets — identical
    output, no single-partition exchange)."""
    counts = df.groupBy(id_column).agg(F.count(F.lit(1)).alias("count"))
    counts = counts.filter(F.col("count") >= min_count)
    if max_count is not None:
        counts = counts.filter(F.col("count") <= max_count)
    w = Window.orderBy(F.col(id_column).asc())
    return counts.withColumn("index", F.row_number().over(w))


def feature_importance_sumsq(
    df: DataFrame, embedding_column: str, top_n: int
) -> list[int]:
    """Per-dimension importance = Σx² over rows; return indices of the
    top-n dimensions (reference
    ``app/word_item_similarity/dimension_reduction_model.py:16-25``).

    posexplode by dimension → groupBy(dim).sum — partial aggregation
    makes the shuffle d rows per partition regardless of row count;
    only the d-length importance vector reaches the driver."""
    dims = (
        df.select(F.posexplode(embedding_column).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum(F.col("x").cast("double") * F.col("x").cast("double")).alias("importance"))
        .collect()
    )
    sums = {r["dim"]: r["importance"] for r in dims}
    order = sorted(sums, key=lambda i: (-sums[i], i))
    return sorted(order[:top_n])
