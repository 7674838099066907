"""Scalable dense-id assignment — the two-phase alternative to a
global ``row_number``.

``value_counts_id_map`` (and the dictionary trainer) assign dense ids
with ``row_number() OVER (ORDER BY key)``: one reducer sees every row.
Fine to ~10⁸ vocabulary entries, a wall beyond. The classic fix
(zipWithIndex semantics, expressed relationally):

1. range-partition the rows by the sort key (Spark's RangePartitioner
   samples to build balanced, *globally ordered* partition bounds);
2. number rows within each partition (no cross-partition exchange —
   partitions are already sorted ranges);
3. add each partition's cumulative row-count offset (a driver-side
   array of #partitions longs — trivially small).

Result: identical ids to the single-reducer ``row_number``, with the
widest exchange being the range shuffle — no single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_columns: list[str],
    index_column: str = "index",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ df + ``index_column``: dense ids from ``start`` in
    ``order_columns`` order, computed without a single-partition
    window. Ordering columns must be a unique key (same requirement a
    deterministic ``row_number`` has)."""
    cols = [F.col(c) for c in order_columns]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    # per-partition sizes → cumulative offsets (driver-side, #partitions longs)
    sizes = {
        r["__pid"]: r["n"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_df = with_pid.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        with_pid.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offset_df), on="__pid")
        .withColumn(index_column, (F.col("__rn") + F.col("__off") + start - 1).cast("int"))
        .drop("__pid", "__rn", "__off")
    )


def value_counts_id_map_scalable(
    df: DataFrame,
    id_column: str,
    min_count: int = 0,
    max_count: int | None = None,
) -> DataFrame:
    """Drop-in for
    :func:`redshells_spark.operators.aggregates.value_counts_id_map`
    at extreme vocabulary sizes: same output (id, count, index from 1,
    index ordered by id asc), no single-reducer window."""
    counts = df.groupBy(id_column).agg(F.count(F.lit(1)).alias("count"))
    counts = counts.filter(F.col("count") >= min_count)
    if max_count is not None:
        counts = counts.filter(F.col("count") <= max_count)
    return assign_dense_ids(counts, [id_column], index_column="index", start=1)
