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


def cross_source_overlap(
    df: DataFrame,
    group_column: str = "source",
    text_column: str = "text",
) -> DataFrame:
    """→ (source_a, source_b, n_shared, n_a, n_b, jaccard): exact-
    duplicate leakage between corpus sources — the data-card matrix
    that shows which crawls copy from each other (and which eval-ish
    source leaks into train sources), computed on normalized-text
    fingerprints.

    Scale design: the corpus reduces to DISTINCT (group, fingerprint)
    rows first (32-byte hashes, never text), so the self-join on
    fingerprint fans out at most #groups per hash — bounded by the
    handful of sources, not corpus size; group sizes are a tiny
    broadcast table. The full #groups² pair matrix is emitted (zero
    rows included) so "no leakage" is an asserted result, not an
    absent row.
    """
    require_columns(df, [group_column, text_column])
    fps = (
        fingerprint(df, text_column)
        .select(F.col(group_column).alias("g"), "fingerprint")
        .distinct()
    )
    sizes = fps.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    a = fps.select(F.col("g").alias("source_a"), "fingerprint")
    b = fps.select(F.col("g").alias("source_b"), "fingerprint")
    shared = (
        a.join(b, "fingerprint")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("g").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("g").alias("source_b"), F.col("n").alias("n_b"))
    pairs = sa.crossJoin(sb).filter(F.col("source_a") < F.col("source_b"))
    return (
        pairs.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )
