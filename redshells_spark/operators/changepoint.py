"""Mean-shift changepoint detection per group — the first split of
binary segmentation (Scott & Knott 1974; the workhorse step behind
ruptures/changepoint-style monitoring of metric streams).

For each group's time-ordered series, find the split position that
minimizes total within-segment squared error:

    cost(t) = [Q_t - S_t²/t] + [(Q_n - Q_t) - (S_n - S_t)²/(n - t)]

computed for every t from ONE pass of prefix sums in EXACT integer
cents (int64 window sums are order-free, so every downstream double is
derived from identical integers on both engines — a double prefix sum
is not portable: DuckDB aggregates window frames via a segment tree,
a different fold order than Spark's running fold). Outputs export at
full precision with zero rounding (identical doubles hash identically;
``round(x, 4)`` itself diverges cross-engine on half boundaries, which
cent-precision means hit often). The argmin is a per-group min-cost
pick with a position tie-break; no iteration, no UDF.

Scale: everything is per-group windows over naturally bounded series
(a user's events, a metric's daily points) plus one group-keyed
aggregate — the same shape as the repo's EWMA/rolling tiers. Output is
one row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def mean_shift_changepoint(
    df: DataFrame,
    group_column: str,
    value_column: str,
    order_columns: list[str],
    min_points: int = 4,
) -> DataFrame:
    """→ (``group_column``, n_points, cp_pos, mean_before, mean_after,
    gain): the best single mean-shift split per group. ``cp_pos`` is
    the 1-based size of the left segment; ``gain`` is the SSE
    reduction vs no split (>= 0). Groups with fewer than
    ``min_points`` rows are excluded."""
    require_columns(df, [group_column, value_column] + order_columns)
    g, v = group_column, value_column
    order = [F.col(c).asc() for c in order_columns]
    w = (
        Window.partitionBy(g)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy(g)
    # EXACT integer units (cents): window sums of int64 are
    # order-free, so every downstream double is derived from
    # identical integers on both engines. (A double prefix sum is NOT
    # portable here: DuckDB aggregates window frames via a segment
    # tree — a different fold order than Spark's running fold — and
    # the 1e-15 drift flips 4-decimal rounding at the boundary.)
    xc = F.floor(F.col(v).cast("double") * 100 + F.lit(0.5)).cast("long")
    pre = (
        df.select(g, xc.alias("__xc"), *[F.col(c) for c in order_columns])
        .select(
            g,
            F.sum("__xc").over(w).alias("s_t"),
            F.sum(F.col("__xc") * F.col("__xc")).over(w).alias("q_t"),
            F.row_number().over(Window.partitionBy(g).orderBy(*order)).alias("t"),
            F.count(F.lit(1)).over(full).alias("n"),
            F.sum("__xc").over(full).alias("s_n"),
            F.sum(F.col("__xc") * F.col("__xc")).over(full).alias("q_n"),
        )
        .filter((F.col("n") >= min_points) & (F.col("t") < F.col("n")))
    )

    def _sse(q, s, m):  # q,s int64 cents; all float ops on identical ints
        return q.cast("double") - s.cast("double") * s.cast("double") / m

    cost = _sse(F.col("q_t"), F.col("s_t"), F.col("t")) + _sse(
        F.col("q_n") - F.col("q_t"),
        F.col("s_n") - F.col("s_t"),
        F.col("n") - F.col("t"),
    )
    base = _sse(F.col("q_n"), F.col("s_n"), F.col("n"))
    scored = pre.select(
        g,
        "t",
        "n",
        cost.alias("cost"),
        ((base - cost) / F.lit(10000.0)).alias("gain"),
        (F.col("s_t").cast("double") / F.col("t") / F.lit(100.0)).alias(
            "mean_before"
        ),
        (
            (F.col("s_n") - F.col("s_t")).cast("double")
            / (F.col("n") - F.col("t"))
            / F.lit(100.0)
        ).alias("mean_after"),
    )
    pick = Window.partitionBy(g).orderBy(F.col("cost").asc(), F.col("t").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            g,
            F.col("n").cast("long").alias("n_points"),
            F.col("t").cast("long").alias("cp_pos"),
            F.col("mean_before").alias("mean_before"),
            F.col("mean_after").alias("mean_after"),
            F.col("gain").alias("gain"),
        )
    )


def mean_shift_changepoint_sql(
    points_cte: str,
    group: str = "user_id",
    min_points: int = 4,
) -> str:
    """DuckDB mirror over a CTE named ``points`` with columns
    (``group``, x, and an ``ord``/``ord2`` ordering pair)."""
    return f"""WITH {points_cte},
    cents AS (
      SELECT {group}, ord, ord2,
             CAST(floor(x * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS xc
      FROM points),
    pre AS (
      SELECT {group},
             CAST(sum(xc) OVER wp AS BIGINT) AS s_t,
             CAST(sum(xc * xc) OVER wp AS BIGINT) AS q_t,
             row_number() OVER wo AS t,
             count(*) OVER wg AS n,
             CAST(sum(xc) OVER wg AS BIGINT) AS s_n,
             CAST(sum(xc * xc) OVER wg AS BIGINT) AS q_n
      FROM cents
      WINDOW wo AS (PARTITION BY {group} ORDER BY ord ASC, ord2 ASC),
             wp AS (PARTITION BY {group} ORDER BY ord ASC, ord2 ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wg AS (PARTITION BY {group})),
    scored AS (
      SELECT {group}, t, n,
             (CAST(q_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / t)
               + (CAST(q_n - q_t AS DOUBLE)
                  - CAST(s_n - s_t AS DOUBLE) * CAST(s_n - s_t AS DOUBLE) / (n - t)) AS cost,
             CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / n AS base,
             CAST(s_t AS DOUBLE) / t / 100.0 AS mean_before,
             CAST(s_n - s_t AS DOUBLE) / (n - t) / 100.0 AS mean_after
      FROM pre WHERE n >= {min_points} AND t < n),
    best AS (
      SELECT *, row_number() OVER (
               PARTITION BY {group} ORDER BY cost ASC, t ASC) AS rn
      FROM scored)
    SELECT {group}, CAST(n AS BIGINT) AS n_points, CAST(t AS BIGINT) AS cp_pos,
           mean_before, mean_after, (base - cost) / 10000.0 AS gain
    FROM best WHERE rn = 1"""


def cusum_monitor(
    series: DataFrame,
    t_col: str,
    n_col: str,
    slack: int = 0,
) -> DataFrame:
    """Page's CUSUM control chart over an integer time series →
    (t, v, cusum_pos, cusum_neg, threshold, flag).

    The textbook recursion s_t = max(0, s_{t−1} + (x_t − μ0 − k)) is
    not window-expressible, but its CLOSED FORM is: with
    C_t = Σ_{i≤t}(x_i − μ0 − k),  s_t = C_t − min_{i≤t} C_i — a
    running sum minus a running min, BOTH plain window functions over
    the time-bounded series relation (the same trick that makes EWMA
    relational in queries/analytics.py). μ0 is the exact integer mean
    (Σx div n), deviations and both CUSUM sides stay int64, and the
    Poissonish decision threshold 5·sqrt(μ0) is the only double.
    Page 1954; the sequential drift monitor between the SPRT (known
    alternatives) and Mann-Kendall (monotone trend)."""
    s = series.select(
        F.col(t_col).alias("t"), F.col(n_col).cast("long").alias("v")
    )
    mu = s.agg(F.expr("sum(v) div count(*)").cast("long").alias("mu0"))
    s = s.crossJoin(F.broadcast(mu))
    w = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sk = int(slack)
    s = s.withColumn(
        "cp", F.sum(F.col("v") - F.col("mu0") - F.lit(sk)).over(w).cast("long")
    ).withColumn(
        "cn", F.sum(F.col("mu0") - F.col("v") - F.lit(sk)).over(w).cast("long")
    )
    s = s.withColumn(
        "cusum_pos",
        (F.col("cp") - F.least(F.min("cp").over(w), F.lit(0))).cast("long"),
    ).withColumn(
        "cusum_neg",
        (F.col("cn") - F.least(F.min("cn").over(w), F.lit(0))).cast("long"),
    )
    thr = F.round(F.lit(5.0) * F.sqrt(F.col("mu0").cast("double")), 6)
    return s.select(
        "t",
        "v",
        "cusum_pos",
        "cusum_neg",
        thr.alias("threshold"),
        F.greatest(
            (F.col("cusum_pos").cast("double") >= thr).cast("long"),
            (F.col("cusum_neg").cast("double") >= thr).cast("long"),
        ).alias("flag"),
    ).orderBy("t")


def page_hinkley_monitor(
    series: DataFrame,
    t_col: str,
    n_col: str,
) -> DataFrame:
    """Page-Hinkley upward-drift monitor over an integer time series →
    (t, v, m_e6, ph_e6, threshold_e6, alarm).

    m_t = Σ_{i≤t}(x_i − x̄_i) with the RUNNING mean folded to exact
    integers per step (x·1e6 − cum·1e6 div i), and
    PH_t = m_t − min_{s≤t} m_s — the reset-free closed form of the
    drift statistic (Page 1954), two plain windows over the
    time-bounded series relation just like :func:`cusum_monitor`.
    All chart columns are exact int64; the alarm threshold
    5·sqrt(μ0)·1e6 is the only double."""
    require_columns(series, [t_col, n_col])
    s = series.select(
        F.col(t_col).alias("t"), F.col(n_col).cast("long").alias("v")
    )
    mu = s.agg(F.expr("cast(sum(v) div count(*) as long)").alias("mu0"))
    wt = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = s.select(
        "t",
        "v",
        F.sum("v").over(wt).cast("long").alias("cum"),
        F.row_number().over(Window.orderBy(F.col("t").asc())).cast("long").alias("i"),
    )
    m = c.select(
        "t",
        "v",
        F.sum(F.expr("v * 1000000 - (cum * 1000000 div i)"))
        .over(wt)
        .cast("long")
        .alias("m_e6"),
    )
    ph = m.select(
        "t",
        "v",
        "m_e6",
        (F.col("m_e6") - F.min("m_e6").over(wt)).cast("long").alias("ph_e6"),
    )
    thr = F.lit(5.0) * F.sqrt(F.col("mu0").cast("double")) * F.lit(1000000.0)
    return (
        ph.crossJoin(F.broadcast(mu))
        .select(
            "t",
            "v",
            "m_e6",
            "ph_e6",
            F.round(thr, 6).alias("threshold_e6"),
            (F.col("ph_e6").cast("double") > thr).cast("long").alias("alarm"),
        )
        .orderBy("t")
    )
