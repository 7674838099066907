"""As-of (nearest-time) joins and interval range joins.

Neither exists in the reference (its only temporal handling is
dropping raw date strings, ``examples/matrix_factorization_example.py:44-48``),
but both are core to event/feature pipelines at scale, so they are
first-class here (SURVEY §2.J beyond-reference extensions).

Scale design:

- :func:`asof_join` — the classic "union + ordered window" plan: tag
  both sides, shuffle ONCE on the join key, sort by time within the
  key, and carry the most recent right payload forward with
  ``last(..., ignoreNulls=True)``. No join explosion, no per-row probe
  — cost is one exchange + one sort, identical asymptotics to a
  sort-merge join, and it survives arbitrarily many left rows per key.
- :func:`range_join` — point-in-interval joins. A naive inequality
  join is a BroadcastNestedLoopJoin (O(n·m) — banned at scale). The
  bucketed path maps intervals to the coarse buckets they overlap
  (``sequence`` + ``explode``) and points to their single bucket, so
  the join is a plain shuffled equi-join on the bucket id with an
  exact residual filter; work is proportional to true overlaps as long
  as ``bucket_width`` is of the order of the typical interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance: int | float | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right_time`` ≤ ``left_time`` (direction="backward", inclusive;
    "forward" = smallest ``right_time`` ≥ ``left_time``).

    Returns all left columns plus the right payload columns (right
    columns minus key and time) and the matched ``right_time`` value
    (omitted if the name collides with a left column). ``tolerance`` (same units as the time
    columns, which must be mutually comparable — normalize timestamps
    to epoch numbers first) rejects matches further than that from the
    left time. ``how="inner"`` drops unmatched left rows; ``"left"``
    keeps them with null payload.

    Ties on ``right_time`` within a key are broken deterministically
    by the payload struct ordering (largest wins); pre-aggregate the
    right side to one row per (key, time) when that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in set(keys) | {right_time}]
    if not payload_cols:
        raise ValueError("right side has no payload columns besides key+time")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in payload_cols]
        ).alias("__p"),
    )
    l = left.withColumn("__t", F.col(left_time))
    tagged = l.withColumn("__is_left", F.lit(1)).unionByName(
        r.withColumn("__is_left", F.lit(0)), allowMissingColumns=True
    )
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("__is_left").asc(), F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )
    if tolerance is not None:
        lt = F.col("__t").cast("double")
        rt = F.col("__m.__rt").cast("double")
        dist = lt - rt if direction == "backward" else rt - lt
        matched = matched.withColumn(
            "__m", F.when(dist <= F.lit(float(tolerance)), F.col("__m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(c) for c in payload_cols
    ]
    if right_time not in left.columns:
        out_cols.append(F.col("__m.__rt").alias(right_time))
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_column: str,
    lo_column: str,
    hi_column: str,
    bucket_width: float | None = None,
    closed: str = "left",
    max_broadcast_intervals: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with
    lo ≤ point < hi (``closed="left"``; ``"both"`` makes hi inclusive).
    Returns points columns + intervals columns.

    With ``bucket_width`` set (the scale path): intervals explode into
    the coarse buckets they overlap and points map to exactly one
    bucket, turning the inequality into a shuffled equi-join on
    ``floor(x / bucket_width)`` plus an exact residual filter — no
    nested-loop, work ∝ overlaps (pick the width near the typical
    interval length; an interval spanning b buckets costs b candidate
    rows). Without it, the intervals side is broadcast and Catalyst
    runs a BroadcastNestedLoopJoin — acceptable ONLY for a small
    intervals side (dimension tables); the operator *probes* the
    intervals side (``limit(cap+1).count()`` — one cheap partial scan,
    never a full count) and refuses the nested loop above
    ``max_broadcast_intervals`` rather than silently launching an
    O(n·m) scan at cluster scale.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    p = F.col(point_column)
    residual = (F.col(lo_column) <= p) & (
        (p < F.col(hi_column)) if closed == "left" else (p <= F.col(hi_column))
    )
    if bucket_width is None:
        cap = int(max_broadcast_intervals)
        if intervals.limit(cap + 1).count() > cap:
            raise ValueError(
                f"range_join without bucket_width broadcasts the intervals side "
                f"into a BroadcastNestedLoopJoin, but it exceeds "
                f"max_broadcast_intervals={cap} rows. Pass bucket_width to get "
                f"the bucketed shuffled equi-join instead (scales O(overlaps), "
                f"not O(points × intervals))."
            )
        return points.join(F.broadcast(intervals), on=residual)
    w = float(bucket_width)
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_column) / w).cast("long"),
                F.floor(F.col(hi_column) / w).cast("long"),
            )
        ),
    )
    pb = points.withColumn("__bucket", F.floor(p / w).cast("long"))
    return pb.join(ib, on="__bucket").filter(residual).drop("__bucket")
