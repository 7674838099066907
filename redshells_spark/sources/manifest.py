"""File-level min/max manifests: data skipping without a table format.

Modern table formats (Delta, Iceberg, Hudi) keep per-file column stats
so selective queries open only the files whose [min, max] intersects
the predicate. Plain parquet directories lose that: Spark still lists
and footer-reads every file. This module materializes the same stats as
a tiny `_manifest.parquet` next to the data —

- `write_with_manifest`: write the data, then one aggregation over
  `input_file_name()` computes per-file min/max/count for the declared
  stat columns (distributed; the manifest itself is ≤ one row per file);
- `prune_files`: evaluate a range predicate against the manifest (a
  driver-side read of file-count rows) and return only the surviving
  files' paths;
- `read_pruned`: `spark.read.parquet(*survivors)` — the scan never sees
  skipped files, which is stronger than row-group pruning: no listing,
  no footers, no tasks for them.

Combine with `operators/layout.py:write_zordered`: the Z-order sort is
what makes per-file ranges TIGHT on every interleaved dimension, and
the manifest is what turns tight ranges into skipped IO. At 100 TB
this pairing is the difference between a full-table scan and opening a
few hundred files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

MANIFEST_NAME = "_manifest.parquet"


def write_with_manifest(
    df: DataFrame,
    path: str,
    stat_columns: list[str],
    num_files: int | None = None,
    order_by: list[str] | None = None,
) -> None:
    """Write ``df`` as parquet plus a per-file stats manifest.

    ``order_by`` range-partitions + sorts before writing (pass the same
    columns as ``stat_columns`` to make their per-file ranges tight —
    or use `write_zordered` first for multi-dimensional tightness)."""
    require_columns(df, stat_columns)
    out = df
    if order_by:
        out = (
            out.repartitionByRange(num_files, *order_by)
            if num_files
            else out.repartitionByRange(*order_by)
        ).sortWithinPartitions(*order_by)
    elif num_files:
        out = out.repartition(num_files)
    out.write.mode("overwrite").parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_columns:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    manifest = written.groupBy(
        F.input_file_name().alias("file")
    ).agg(*aggs)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_NAME}")


def prune_files(
    spark: SparkSession, path: str, column: str, lower, upper
) -> tuple[list[str], int]:
    """Files whose [min_col, max_col] intersects [lower, upper], plus
    the total file count (for skip-rate reporting). Driver-side read of
    a file-count-sized manifest — the 100 TB path reads KBs to skip TBs."""
    manifest = spark.read.parquet(f"{path}/{MANIFEST_NAME}")
    rows = manifest.select("file", f"min_{column}", f"max_{column}").collect()
    keep = [
        r["file"]
        for r in rows
        if not (r[f"max_{column}"] < lower or r[f"min_{column}"] > upper)
    ]
    return keep, len(rows)


def read_pruned(
    spark: SparkSession, path: str, column: str, lower, upper
) -> DataFrame:
    """Scan only the manifest-surviving files and re-apply the exact
    predicate (file pruning is a superset cut; the filter stays for
    row-level correctness — and parquet row-group stats prune further
    inside each kept file)."""
    keep, _total = prune_files(spark, path, column, lower, upper)
    if not keep:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema).filter(
            (F.col(column) >= lower) & (F.col(column) <= upper)
        )
    return spark.read.parquet(*keep).filter(
        (F.col(column) >= lower) & (F.col(column) <= upper)
    )
