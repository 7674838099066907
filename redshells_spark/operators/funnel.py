"""Product-analytics operators: ordered funnels and retention cohorts.

Reference scope: m3dev/redshells has no event-funnel tier (SURVEY.md
§2.J notes windows/streaming "absent"); these are beyond-reference
extensions in the spirit of its click-train pipelines
(`redshells/app/click_through_rate/make_click_data.py` builds
user-event training frames) re-expressed as first-class Spark
operators over the `events` table.

Scale design
------------
- ``funnel_conversion`` is k−1 sequential *filtered* aggregations
  (one per step), each a groupBy over only that step's events — no
  window over the full event stream, no per-user collect_list. At
  100 TB each stage shuffles only the matching-step subset, and every
  stage after the first joins against a per-user single-row frame
  (users-who-reached-step-i), which AQE will broadcast when small.
- ``retention_cohorts`` is two aggregations (per-user first week, then
  distinct users per cohort×offset cell) — both shuffle 16-byte rows.
- All time arithmetic is integer microseconds (`timeutil.event_us`),
  so results are bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def funnel_step_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    us_col: str = "__us",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each ordered funnel step.

    Step semantics: greedy earliest-first — step 1 time is the user's
    first `steps[0]` event; step i time is the first `steps[i-1]` event
    *strictly after* the chosen step i−1 time. Greedy earliest choice is
    optimal for "did the user complete the prefix" (matching any other
    witness implies matching the greedy one), so completion counts are
    well-defined.

    Returns one row per user who reached step 1, with columns
    ``step_1_us .. step_k_us`` (NULL once a step is unreached).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(us_col).alias("step_1_us"))
        # one narrow row per reached user; each later stage consumes it
        # TWICE (the step join and the carry left join) — unpinned the
        # plan re-expanded the whole prefix per stage, ~2^k event
        # scans (13 at funnel depth 4 in the round-8 plan audit). Same
        # superstep pin as operators/graph.py.
        .localCheckpoint(eager=True)
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(reached, user_col)
            .filter(F.col(us_col) > F.col(f"step_{i - 1}_us"))
            .groupBy(user_col)
            .agg(F.min(us_col).alias(f"step_{i}_us"))
        )
        reached = reached.join(nxt, user_col, "left").localCheckpoint(
            eager=True
        )
    return reached


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    us_col: str = "__us",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: per step, users reached + conversion vs step 1.

    Output: ``step_no, step_name, users, conv_from_first`` (rate rounded
    to 4 decimals), ordered by step_no.
    """
    times = funnel_step_times(events, steps, user_col, us_col, type_col)
    counts = times.agg(
        *[
            F.count(F.col(f"step_{i}_us")).cast("long").alias(f"step_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # k is tiny (funnel depth); explode the single summary row to long form
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_no"),
                F.lit(step).alias("step_name"),
                F.col(f"step_{i}").alias("users"),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("s"), F.col("step_1").alias("base"))
        .select(
            F.col("s.step_no").alias("step_no"),
            F.col("s.step_name").alias("step_name"),
            F.col("s.users").alias("users"),
            F.round(F.col("s.users") / F.col("base"), 4).alias("conv_from_first"),
        )
        .orderBy("step_no")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    us_col: str = "__us",
    week_us: int = WEEK_US,
) -> DataFrame:
    """Weekly retention triangle: cohort week × weeks-since-first.

    Cohort = integer week index of the user's first event
    (``first_us // week_us`` — epoch-aligned weeks, not calendar weeks,
    so the bucketing is pure integer math on both engines). A user is
    retained in offset w if they have any event in cohort_week + w.

    Output: ``cohort_week, week_offset, active_users, cohort_size,
    retention`` (rate rounded 4).
    """
    # integer `div`, not double `/`: double division of ~1e15 us values
    # can land an exact-integer quotient at n−ε and truncate to n−1,
    # diverging from the oracle's integer `//`
    weeks = events.select(
        user_col, F.expr(f"cast(`{us_col}` as bigint) div {week_us}").alias("week")
    )
    firsts = weeks.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    active = (
        weeks
        .distinct()
        .join(firsts, user_col)
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
    )
    cells = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
