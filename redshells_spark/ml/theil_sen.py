"""Theil-Sen robust trend estimation per group — the median of all
pairwise slopes (Theil 1950; Sen 1968), with a ~29% breakdown point
where OLS breaks on a single outlier.

Shape at scale: the estimator is quadratic in points-per-group BY
CONTRACT (all n·(n-1)/2 pairwise slopes), so it fits groups that are
naturally bounded — a user's events, a device's readings, a model's
daily metric — never a whole corpus. The pair self-join is keyed by
the group column (one shuffle); ``max_points`` deterministically
EXCLUDES oversized groups (mirrored in the oracle with a HAVING) so a
hot key degrades to a reported refusal, not an n² detonation. Medians
are exact order statistics (row_number + the (n+1)//2 / (n+2)//2
pair, averaged) — no percentile_approx, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def theil_sen_trend(
    df: DataFrame,
    group_column: str,
    time_column: str,
    value_column: str,
    order_tiebreak: str,
    max_points: int = 1000,
    slope_unit_us: float = 3.6e9,
) -> DataFrame:
    """→ (``group_column``, n_points, n_slopes, slope): per-group
    Theil-Sen slope in value units per ``slope_unit_us`` microseconds
    (default: per hour). ``time_column`` must be long microseconds
    (use ``timeutil.event_us``); pairs with equal timestamps are
    excluded from the slope set (vertical lines have no slope).
    Groups with fewer than 2 distinct-time points, or more than
    ``max_points`` points, are excluded."""
    require_columns(df, [group_column, time_column, value_column, order_tiebreak])
    g, t, v = group_column, time_column, value_column
    pts = df.select(g, t, v, order_tiebreak)
    sized = pts.groupBy(g).agg(F.count("*").alias("n_points"))
    kept = sized.filter(
        (F.col("n_points") >= 2) & (F.col("n_points") <= max_points)
    )
    # no broadcast hint: the kept-group list is #groups-sized and can
    # be huge at scale — let AQE pick broadcast vs shuffle join
    pts = pts.join(kept.select(g), g)
    a = pts.select(
        F.col(g),
        F.col(t).alias("__ta"),
        F.col(v).alias("__va"),
        F.col(order_tiebreak).alias("__ka"),
    )
    b = pts.select(
        F.col(g),
        F.col(t).alias("__tb"),
        F.col(v).alias("__vb"),
        F.col(order_tiebreak).alias("__kb"),
    )
    # each unordered pair once: strict (t, tiebreak) ordering
    pairs = a.join(b, g).filter(
        (F.col("__ta") < F.col("__tb"))
        | ((F.col("__ta") == F.col("__tb")) & (F.col("__ka") < F.col("__kb")))
    )
    slopes = pairs.filter(F.col("__ta") != F.col("__tb")).select(
        g,
        (
            (F.col("__vb") - F.col("__va"))
            * F.lit(float(slope_unit_us))
            / (F.col("__tb") - F.col("__ta"))
        ).alias("__s"),
        "__ka",
        "__kb",
    )
    w = Window.partitionBy(g).orderBy(
        F.col("__s").asc(), F.col("__ka").asc(), F.col("__kb").asc()
    )
    ranked = slopes.select(
        g,
        "__s",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(g)).alias("n_slopes"),
    )
    # exact median: the floor((n+1)/2) / floor((n+2)/2) order statistics
    # (equal when n is odd), averaged — identical operands both engines
    med = (
        ranked.filter(
            (F.col("__rn") == F.floor((F.col("n_slopes") + 1) / 2))
            | (F.col("__rn") == F.floor((F.col("n_slopes") + 2) / 2))
        )
        .groupBy(g, "n_slopes")
        .agg(F.avg("__s").alias("slope"))
    )
    return (
        med.join(kept, g)
        .select(
            g,
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_slopes").cast("long").alias("n_slopes"),
            "slope",
        )
    )


def theil_sen_sql(
    points_cte: str,
    group: str = "user_id",
    max_points: int = 1000,
    slope_unit_us: float = 3.6e9,
) -> str:
    """DuckDB rendering over a CTE named ``points`` with columns
    (``group``, tus, v, k) — the exact mirror of
    :func:`theil_sen_trend`."""
    return f"""WITH {points_cte},
    sized AS (
      SELECT {group}, CAST(count(*) AS BIGINT) AS n_points
      FROM points GROUP BY {group}
      HAVING count(*) >= 2 AND count(*) <= {max_points}),
    pts AS (SELECT points.* FROM points JOIN sized USING ({group})),
    slopes AS (
      SELECT a.{group},
             (b.v - a.v) * {slope_unit_us!r} / (b.tus - a.tus) AS s,
             a.k AS ka, b.k AS kb
      FROM pts a JOIN pts b ON a.{group} = b.{group}
       AND (a.tus < b.tus OR (a.tus = b.tus AND a.k < b.k))
      WHERE a.tus <> b.tus),
    ranked AS (
      SELECT {group}, s,
             row_number() OVER (PARTITION BY {group} ORDER BY s ASC, ka ASC, kb ASC) AS rn,
             count(*) OVER (PARTITION BY {group}) AS n_slopes
      FROM slopes),
    med AS (
      SELECT {group}, CAST(n_slopes AS BIGINT) AS n_slopes, avg(s) AS slope
      FROM ranked
      WHERE rn = (n_slopes + 1) // 2 OR rn = (n_slopes + 2) // 2
      GROUP BY {group}, n_slopes)
    SELECT med.{group}, sized.n_points, med.n_slopes, med.slope
    FROM med JOIN sized USING ({group})"""
