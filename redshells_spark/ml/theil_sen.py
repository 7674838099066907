"""Theil-Sen robust trend estimation per group — the median of all
pairwise slopes (Theil 1950; Sen 1968), with a ~29% breakdown point
where OLS breaks on a single outlier.

Shape at scale: the estimator is quadratic in points-per-group BY
CONTRACT (all n·(n-1)/2 pairwise slopes), so it fits groups that are
naturally bounded — a user's events, a device's readings, a model's
daily metric — never a whole corpus. ONE group-keyed shuffle collects
each (bounded) point set; the n² slope algebra and the exact median
run INSIDE the row as array expressions, so nothing quadratic is ever
shuffled or window-sorted. ``max_points`` deterministically EXCLUDES
oversized groups (mirrored in the oracle with a HAVING) so a hot key
degrades to a reported refusal, not an n² detonation. Medians are
exact order statistics (array_sort + the (n+1)//2 / (n+2)//2 pair,
averaged) — no percentile_approx, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # ONE shuffle: collect each group's (bounded, <= max_points)
    # point set and run the quadratic slope algebra INSIDE the row
    # with array expressions — no group-keyed self-join (which
    # shuffled the point relation twice and produced the n² slope
    # relation as join output) and no n²-row window sort (the old
    # exact-median machinery). All per-pair arithmetic is unchanged:
    # pairs ordered by (t, tiebreak); pairs with equal t are excluded
    # (vertical); slope = (v_later - v_earlier)·unit / (t_later -
    # t_earlier) — orientation is the same because the array is sorted
    # by (t, tiebreak), and the median of the sorted slope array takes
    # the identical floor((n+1)/2)/floor((n+2)/2) order statistics
    # (ties in the old window's (s, ka, kb) ordering only permuted
    # EQUAL slope values, so the selected values are the same).
    # pre-shuffle by the group key with a PINNED partition count (the
    # groupBy reuses this exchange, so there is still exactly one
    # shuffle): the post-agg stage is compute-heavy but tiny in bytes
    # (one array row per group), and AQE's byte-based coalescing would
    # otherwise squeeze it onto 1-2 tasks — measured 2.5s → 0.46s at
    # sf0.1 on local[32]. defaultParallelism keeps the count
    # cluster-adaptive rather than a local constant.
    n_part = max(int(df.sparkSession.sparkContext.defaultParallelism), 1)
    grouped = (
        df.select(
            F.col(g),
            F.struct(
                F.col(t).alias("__t"),
                F.col(order_tiebreak).alias("__k"),
                F.col(v).alias("__v"),
            ).alias("__p"),
        )
        .repartition(n_part, F.col(g))
        .groupBy(g)
        .agg(
            F.sort_array(F.collect_list("__p")).alias("__ps"),
            F.count("*").alias("n_points"),
        )
        .filter(
            (F.col("n_points") >= 2) & (F.col("n_points") <= max_points)
        )
    )
    unit = float(slope_unit_us)
    slopes = (
        "filter(flatten(transform(__ps, (x, i) -> "
        "transform(slice(__ps, i + 2, size(__ps)), y -> "
        "IF(y.__t = x.__t, CAST(NULL AS DOUBLE), "
        f"(y.__v - x.__v) * {unit!r}D / (y.__t - x.__t))))), "
        "s -> s IS NOT NULL)"
    )
    # exact median: the floor((n+1)/2) / floor((n+2)/2) order statistics
    # (equal when n is odd), averaged — identical operands both
    # engines. The sorted slope array is bound ONCE as a lambda
    # variable (transform over a 1-element array) so projection
    # collapse cannot duplicate the quadratic expression per
    # reference site.
    stats = F.expr(
        f"transform(array(array_sort({slopes})), ss -> struct("
        "size(ss) AS n, "
        "IF(size(ss) < 1, CAST(NULL AS DOUBLE), "
        "(element_at(ss, cast(floor((size(ss) + 1) / 2) as int)) "
        " + element_at(ss, cast(floor((size(ss) + 2) / 2) as int))) / 2.0D"
        ") AS m))[0]"
    )
    return (
        grouped.select(F.col(g), "n_points", stats.alias("__st"))
        .filter(F.col("__st.n") >= 1)
        .select(
            g,
            F.col("n_points").cast("long").alias("n_points"),
            F.col("__st.n").cast("long").alias("n_slopes"),
            F.col("__st.m").alias("slope"),
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
