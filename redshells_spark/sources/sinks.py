"""Sinks: partitioned / bucketed / compacted parquet writes.

The reference's sinks are param-hash pickle targets (task.py covers
that contract); this module adds the layout controls that matter at
100 TB — partition pruning, bucketed join co-location, and bounded
file counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet. Partition columns should be
    low-cardinality scan predicates (date, source, lang) — Catalyst
    then prunes whole directories. ``maxRecordsPerFile`` bounds file
    sizes without a repartition; pair with a
    ``repartition(*partition_by)`` upstream when writers-per-partition
    explode (small-files problem)."""
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int = 64,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted managed table: joins/aggregations on the bucket
    key against another table bucketed the same way skip the shuffle
    entirely (the co-located join strategy for repeated big-big joins,
    e.g. events⋈users every batch)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name, format="parquet")


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    output_path: str | None = None,
) -> None:
    """Small-files compaction: coalesce a directory of parquet files to
    ~target-size outputs. Uses the input byte size to pick the file
    count; coalesce (not repartition) so no shuffle."""
    df = spark.read.parquet(path)
    import glob
    import os

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total_mb = sum(os.path.getsize(f) for f in files) / 1e6 if files else 1
    n = max(1, int(total_mb / target_file_mb))
    df.coalesce(n).write.mode("overwrite").parquet(output_path or path + "_compacted")


def merge_upsert(
    spark,
    path: str,
    updates: DataFrame,
    key_columns: list[str],
    version_column: str,
    staging_suffix: str = "__staged",
) -> None:
    """Keyed upsert into a parquet table: union the existing snapshot
    with ``updates``, keep the highest-``version_column`` row per key
    (ties: updates win via a source-rank tie-break), rewrite atomically
    via a staging directory.

    This is the CDC-compaction pattern (`latest_by_key`) applied as a
    sink: at 100 TB the same logic runs partition-wise against a
    transactional table format (Delta/Iceberg MERGE); plain parquet
    gets staging-then-swap, which is atomic per rename on real object
    stores only if the store offers it — documented, not hidden.
    """
    from pyspark.sql import Window

    try:
        existing = spark.read.parquet(path).withColumn("__src", F.lit(0))
    except Exception:  # noqa: BLE001 — first write: table doesn't exist yet
        updates.write.mode("overwrite").parquet(path)
        return
    both = existing.unionByName(updates.withColumn("__src", F.lit(1)))
    w = Window.partitionBy(*key_columns).orderBy(
        F.col(version_column).desc(), F.col("__src").desc()
    )
    latest = (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    staged = path.rstrip("/") + staging_suffix
    latest.write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("overwrite").parquet(path)
