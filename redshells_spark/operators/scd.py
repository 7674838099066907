"""Slowly-changing-dimension (type 2) interval construction.

Beyond-reference warehouse operator: collapse a change-event stream
into validity intervals — for each key, one row per *run* of equal
state values with ``valid_from`` / ``valid_to`` bounds (half-open;
``valid_to`` NULL marks the current state). The classic
gaps-and-islands shape:

1. ``lag(state)`` per key flags change points,
2. a running sum over the flags numbers the islands,
3. one aggregate per (key, island) takes the bounds,
4. ``lead(valid_from)`` closes each interval at the next one's start.

Three window passes + one aggregate, all partitioned by the entity
key — at 100 TB this shuffles each key's history to one task, which is
exactly the locality SCD2 needs; no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    state_col: str,
    order_col: str | Column,
    tie_break: str | Column | None = None,
) -> DataFrame:
    """→ (key, state, valid_from, valid_to, n_events) intervals.

    ``order_col`` is the event time (any orderable type); pass a
    unique ``tie_break`` (e.g. an event id) whenever timestamps can
    collide, so the island numbering — and therefore the interval
    table — is deterministic.
    """
    order_cols = [F.col(order_col) if isinstance(order_col, str) else order_col]
    if tie_break is not None:
        order_cols.append(F.col(tie_break) if isinstance(tie_break, str) else tie_break)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    changed = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("long")
    islands = (
        events.withColumn("__chg", changed)
        .withColumn("__island", F.sum("__chg").over(w))
    )
    agg = islands.groupBy(key_col, "__island").agg(
        F.first(state_col).alias(state_col),
        F.min(order_cols[0]).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("__island")
    return agg.select(
        key_col,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )
