"""Click training data — §2.I ``make_click_train_data``.

Reference ``app/word_item_similarity/make_click_train_data.py:12-85``:
per service — dedup, count-filter items to [min_item_count,
n_users·max_item_frequency], count-filter users to ≥ min_user_count,
label observed clicks 1, negative-sample an equal number of unobserved
(user, item) pairs labeled 0, concat.

One DataFrame DAG per service branch, union at the end; every stage is
a §2.B/C/D operator. At scale the anti-join negative sampler is the
only shuffle-heavy stage (see
:func:`redshells_spark.operators.joins.anti_join_negative_sampling`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.operators.aggregates import group_count_filter
from redshells_spark.operators.joins import anti_join_negative_sampling
from redshells_spark.operators.setops import union_concat
from redshells_spark.schema import require_columns


def make_click_train_data(
    click_data: DataFrame,
    user_column: str = "user_id",
    item_column: str = "item_id",
    service_column: str | None = "service_id",
    min_user_count: int = 100,
    min_item_count: int = 100,
    max_item_frequency: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """→ (service?, user, item, click ∈ {0,1}), |negatives| ≤ |positives|
    per service. Reference defaults at ``make_click_train_data.py:15-17``."""
    require_columns(click_data, [user_column, item_column])
    services = (
        [r[0] for r in click_data.select(service_column).distinct().collect()]
        if service_column is not None
        else [None]
    )
    outputs = []
    for svc in services:
        df = (
            click_data.filter(F.col(service_column) == svc)
            if svc is not None
            else click_data
        )
        df = df.select(user_column, item_column).dropDuplicates()
        n_users = df.select(user_column).distinct().count()
        max_item_count = int(n_users * max_item_frequency)
        df = group_count_filter(df, item_column, min_item_count, max_item_count)
        df = group_count_filter(df, user_column, min_user_count, None)
        positives = df.withColumn("click", F.lit(1))
        negatives = anti_join_negative_sampling(
            df, user_column, item_column, seed=seed
        ).withColumn("click", F.lit(0))
        both = union_concat(positives, negatives)
        if svc is not None:
            both = both.withColumn(service_column, F.lit(svc))
        outputs.append(both)
    return union_concat(*outputs)
