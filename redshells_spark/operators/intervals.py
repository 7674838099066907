"""Interval sweep-line operators: concurrency and merged coverage.

Beyond-reference analytics operators over half-open intervals
[start, end): peak concurrency (max simultaneously-open intervals)
and coverage (total time covered after merging overlaps). Both are
the classic sweep-line reduced to window algebra:

- concurrency: explode each interval to a +1 event at start and a -1
  at end; a running sum ordered by (time, delta) is the number of
  open intervals after each event; ends sort before starts at the
  same instant (half-open semantics).
- coverage: order intervals by start; a new *island* begins where the
  start exceeds the running max of previous ends; summing per-island
  (max end − min start) gives overlap-free covered time.

Everything partitions by the group key — each key's sweep is
independent, so 100 TB of intervals shuffles once by key and never
needs a global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """→ per group: (group…, max_concurrent) peak number of
    simultaneously open [start, end) intervals."""
    group_cols = group_cols or []
    pts = intervals.select(
        *group_cols,
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("__e"),
    ).select(*group_cols, F.col("__e.t").alias("t"), F.col("__e.delta").alias("delta"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = pts.withColumn("open", F.sum("delta").over(w))
    agg = [F.max("open").cast("long").alias("max_concurrent")]
    return running.groupBy(*group_cols).agg(*agg) if group_cols else running.agg(*agg)


def merged_coverage(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """→ per group: (group…, covered, n_islands) where ``covered`` is
    the total length of the union of the [start, end) intervals and
    ``n_islands`` the number of disjoint merged spans."""
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = intervals.withColumn(
        "__new_island",
        (prev_max_end.isNull() | (F.col(start_col) > prev_max_end)).cast("long"),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(*group_cols, "__island").agg(
        (F.max(end_col) - F.min(start_col)).alias("__len")
    )
    agg = [
        F.sum("__len").cast("long").alias("covered"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    ]
    return islands.groupBy(*group_cols).agg(*agg) if group_cols else islands.agg(*agg)
