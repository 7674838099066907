"""Exact deduplication: hash-groupBy on a (normalized) content key.

The canonical first pass of an LLM-data pipeline. One shuffle on the
md5 fingerprint; keeper = min(doc_id) per group so the result is
deterministic under any partitioning (unlike dropDuplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns
from redshells_spark.text.analysis import fingerprint


def exact_dedup(
    df: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """Keep one row per distinct (normalized) text — the row with the
    smallest id. ``normalized=False`` keys on raw-text md5.

    Window min over the fingerprint beats groupBy+join-back (one
    shuffle, no join); at 100 TB the md5 key also avoids shuffling
    full document bodies — only (id, 32-byte hash) moves."""
    require_columns(df, [id_column, text_column])
    if normalized:
        keyed = fingerprint(df, text_column)
    else:
        keyed = df.withColumn("fingerprint", F.md5(F.col(text_column)))
    w = Window.partitionBy("fingerprint")
    return (
        keyed.withColumn("__keep", F.min(id_column).over(w))
        .filter(F.col(id_column) == F.col("__keep"))
        .drop("__keep", "fingerprint")
    )
