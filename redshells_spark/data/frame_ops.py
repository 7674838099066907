"""DataFrame utility operators — §2.B of SURVEY.md.

Spark-first re-expression of the reference's
``redshells/data/data_frame_utils.py`` task library. Each operator is
a pure DataFrame→DataFrame function (lazy plan); the task-cache layer
(:mod:`redshells_spark.task`) supplies the Luigi/Gokart materialization
semantics.

Determinism policy: where the reference relies on pandas row order or
unseeded shuffles (keep-first dedup ``data_frame_utils.py:49``,
``sklearn.utils.shuffle`` ``:180``, ``sample(frac=1)`` ``:190-201``),
we take an explicit ``order_by`` column (or a portable md5 hash) so
results are reproducible and partition-count-independent — mandatory
at 1000-executor scale where "first row" is otherwise nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import portable_hash_str, require_columns


def extract_column(df: DataFrame, column_name: str) -> DataFrame:
    """Single-column projection (reference ``ExtractColumnAsList``,
    ``data/data_frame_utils.py:11-28``). Collect only at sinks —
    returning a DataFrame keeps the projection pushed into the scan."""
    require_columns(df, [column_name])
    return df.select(column_name)


def extract_column_as_dict(
    df: DataFrame,
    key_column_name: str,
    value_column_name: str,
    order_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """2-col projection with key dedup, **keep first** (reference
    ``ExtractColumnAsDict``, ``data/data_frame_utils.py:31-50``).

    Pandas "first" is input-order-dependent; distributed "first" is
    nondeterministic. With ``order_by`` we keep the row with the
    smallest order value per key (row_number window — one shuffle on
    the key, no join). Without it, falls back to ``dropDuplicates``
    (any-first; cheaper, map-side partial aggregation)."""
    require_columns(df, [key_column_name, value_column_name])
    projected = df.select(key_column_name, value_column_name)
    if order_by is None:
        return projected.dropDuplicates([key_column_name])
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_column_name).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.select(key_column_name, value_column_name, *[c for c in order_cols if c != value_column_name])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_column_name, value_column_name)
    )


def filter_by_column(df: DataFrame, column_names: Sequence[str]) -> DataFrame:
    """Multi-column projection (reference ``FilterByColumn``,
    ``data/data_frame_utils.py:53-70``)."""
    require_columns(df, column_names)
    return df.select(*column_names)


def rename_column(df: DataFrame, rename_rule: dict[str, str]) -> DataFrame:
    """Rename via dict (reference ``RenameColumn``,
    ``data/data_frame_utils.py:73-91``)."""
    require_columns(df, rename_rule.keys())
    return df.withColumnsRenamed(rename_rule)


def group_by_column_as_dict(
    df: DataFrame,
    key_column_name: str,
    value_column_name: str,
    sort_values: bool = True,
) -> DataFrame:
    """dropna on key+value then key → list of values (reference
    ``GroupByColumnAsDict``, ``data/data_frame_utils.py:94-116``).

    ``sort_values=True`` sorts each list so output is deterministic
    across partitionings (collect_list order is not guaranteed)."""
    require_columns(df, [key_column_name, value_column_name])
    agg = F.collect_list(value_column_name)
    if sort_values:
        agg = F.array_sort(agg)
    return (
        df.dropna(subset=[key_column_name, value_column_name])
        .groupBy(key_column_name)
        .agg(agg.alias(f"{value_column_name}_list"))
    )


def convert_to_one_hot(
    df: DataFrame,
    categorical_column_names: Sequence[str],
    drop_original: bool = True,
) -> DataFrame:
    """``pd.get_dummies``-style expansion (reference ``ConvertToOneHot``,
    ``data/data_frame_utils.py:119-139``).

    Two passes: (1) collect distinct values per column (small driver
    result — cardinality is bounded for categoricals), (2) derive one
    ``F.when`` indicator per value in-place. No join: the reference's
    merge-on-row-index is unnecessary when columns are derived
    expressions."""
    require_columns(df, categorical_column_names)
    out = df
    for col in categorical_column_names:
        values = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
        for v in values:
            out = out.withColumn(
                f"{col}_{v}", F.when(F.col(col) == F.lit(v), 1).otherwise(0)
            )
        if drop_original:
            out = out.drop(col)
    return out


def convert_type_to_category(
    df: DataFrame, columns: Sequence[str]
) -> DataFrame:
    """Pandas ``astype('category')`` equivalent (reference
    ``ConvertTypeToCategory``, ``data/data_frame_utils.py:142-162``):
    adds a dense integer code column ``{col}__code`` per categorical,
    codes assigned by (frequency desc, value asc) — deterministic,
    unlike pandas' appearance order. The mapping table is broadcast
    (categorical cardinality is bounded by definition)."""
    require_columns(df, columns)
    out = df
    for col in columns:
        w = Window.orderBy(F.col("count").desc(), F.col(col).asc())
        mapping = (
            df.groupBy(col)
            .count()
            .withColumn(f"{col}__code", F.row_number().over(w) - 1)
            .drop("count")
        )
        out = out.join(F.broadcast(mapping), on=col, how="left")
    return out


def split_train_test_data(
    df: DataFrame, test_size_rate: float, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Shuffle + split (reference ``SplitTrainTestData``,
    ``data/data_frame_utils.py:165-183``). ``randomSplit`` is the
    scalable equivalent: one pass, no global sort, per-row Bernoulli
    with deterministic seed."""
    train, test = df.randomSplit([1.0 - test_size_rate, test_size_rate], seed=seed)
    return train, test


def hash_split(
    df: DataFrame, key_column: str, test_size_rate: float, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/test split keyed on an integer column via
    the portable multiplicative hash: bucket = (key·KNUTH+seed) mod
    2³² mod 100; test = bucket < rate·100. Reproducible across
    engines, partitionings, and reruns — the split oracle-checkable
    counterpart of :func:`split_train_test_data` (which keeps Spark's
    per-row Bernoulli semantics for ML use)."""
    from redshells_spark.schema import portable_hash

    bucket = portable_hash(key_column, seed) % 100
    cut = int(test_size_rate * 100)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def sample_data(
    df: DataFrame, sample_size: int, seed: int = 42, key_column: str | None = None
) -> DataFrame:
    """Exact-size uniform sample = shuffle + head(n) (reference
    ``SampleData``, ``data/data_frame_utils.py:186-201``).

    With ``key_column``: orders by a portable md5 hash of the key —
    deterministic across engines/partitionings and oracle-checkable.
    Without: ``F.rand(seed)`` (deterministic for a fixed partitioning
    only). Both compile to ``TakeOrderedAndProject`` — per-partition
    top-n then driver merge, no global sort, scales to any input."""
    if key_column is not None:
        order = portable_hash_str(key_column, seed)
    else:
        order = F.rand(seed)
    return df.orderBy(order.asc()).limit(sample_size)


def head_cap(
    df: DataFrame, max_data_size: int, seed: int = 42, key_column: str | None = None
) -> DataFrame:
    """Cap data size after shuffle (reference
    ``contrib/train/train_matrix_factorization.py:41-42``)."""
    return sample_data(df, max_data_size, seed=seed, key_column=key_column)


def impute_with_group_median(
    df,
    value_column: str,
    group_columns: list[str],
    order_tie_break: str,
    flag_column: str | None = None,
):
    """Fill NULLs in ``value_column`` with the exact per-group lower
    median of the non-null values (the rank-(n+1)/2 row under a total
    order — no engine percentile semantics involved, so the imputed
    table is bit-reproducible; same selection trick as the
    grouped-median queries).

    The median table is |groups| rows and broadcast-joins back; one
    window pass over the non-null side, no shuffle of the full table
    beyond it. ``order_tie_break`` must be a unique column (stable
    median under value ties). ``flag_column`` optionally records which
    rows were imputed.
    """
    from pyspark.sql import Window

    require_columns(df, [value_column, *group_columns, order_tie_break])
    nn = df.filter(F.col(value_column).isNotNull())
    w = Window.partitionBy(*group_columns).orderBy(
        F.col(value_column).asc(), F.col(order_tie_break).asc()
    )
    wn = Window.partitionBy(*group_columns)
    med = (
        nn.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(*group_columns, F.col(value_column).alias("__median"))
    )
    out = df.join(F.broadcast(med), on=group_columns, how="left")
    if flag_column is not None:
        out = out.withColumn(
            flag_column,
            (F.col(value_column).isNull() & F.col("__median").isNotNull()).cast("long"),
        )
    return out.withColumn(
        value_column, F.coalesce(F.col(value_column), F.col("__median"))
    ).drop("__median")


def target_encode_loo(
    df,
    category_column: str,
    target_column: str,
    output_column: str = "te",
    prior_weight: int = 0,
    scale: int = 1_000_000,
):
    """Leave-one-out target encoding: each row's category is replaced
    by the mean target of the OTHER rows in its category —
    ``(sum_g − y_i) / (n_g − 1)`` — the standard leakage-free encoding
    for high-cardinality categoricals. With ``prior_weight`` m > 0 the
    encoding is smoothed toward the global mean:
    ``(sum_g − y_i + m·μ) / (n_g − 1 + m)``.

    Exactness: sums/counts are exact integers (the target is carried
    at ``scale`` fixed-point), each row's encoding is ONE fixed-shape
    division over exact operands (identical IEEE result in any
    engine), and the output is exported at 1e-6 fixed point — no
    order-dependent float aggregation anywhere. Rows that are alone in
    their category (n_g = 1, m = 0) get NULL, loudly, rather than a
    fabricated value.

    One groupBy (category sums broadcast back) + one join: the table
    shuffles once at most, and not at all when the category relation
    broadcasts.
    """
    require_columns(df, [category_column, target_column])
    y = F.round(F.col(target_column) * scale, 0).cast("long")
    sums = (
        df.select(category_column, y.alias("__y"))
        .groupBy(category_column)
        .agg(F.sum("__y").alias("__s"), F.count(F.lit(1)).alias("__n"))
    )
    out = df.withColumn("__y", y).join(F.broadcast(sums), on=category_column)
    if prior_weight > 0:
        gm = df.select(
            (F.sum(y) / F.count(F.lit(1))).alias("mu")
        ).collect()[0]["mu"]
        num = F.col("__s") - F.col("__y") + F.lit(float(prior_weight) * gm)
        den = F.col("__n") - 1 + prior_weight
    else:
        num = (F.col("__s") - F.col("__y")).cast("double")
        den = F.col("__n") - 1
    enc = F.when(
        den > 0, F.floor(num / den + F.lit(0.5)).cast("long")
    ).otherwise(F.lit(None))
    return out.withColumn(output_column, enc).drop("__y", "__s", "__n")


def kfold_column(
    df, key_column: str, k: int, seed: int = 42, fold_column: str = "fold"
):
    """Deterministic k-fold assignment keyed on an integer column via
    the same portable multiplicative hash as :func:`hash_split` —
    fold ∈ [0, k), grouped rows (same key) always share a fold, so
    group-aware CV falls out of choosing the key. Reproducible across
    engines/partitionings; a (train, valid) pair per fold is
    ``df.filter(fold != i)`` / ``df.filter(fold == i)``."""
    from redshells_spark.schema import portable_hash

    if k < 2:
        raise ValueError("kfold_column: k must be >= 2")
    require_columns(df, [key_column])
    return df.withColumn(fold_column, portable_hash(key_column, seed) % k)
