"""Multi-touch revenue attribution over an event log.

The marketing-warehouse classic: credit each conversion's revenue to
the touchpoints (clicks) that preceded it inside a lookback window,
under first-touch / last-touch / linear models. The purchase-click
join is keyed on user and bounded by the lookback window, so the
blow-up is per-user touches × conversions inside the window — never a
fact-scale cartesian. Linear credit is EXACT integer division: each
touch gets cents div k and the remainder goes to the last touch, so
per-model totals reconcile to attributed revenue to the cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def multi_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    id_col: str = "event_id",
    cents_col: str = "cents",
    lookback_days: int = 7,
) -> DataFrame:
    """→ (model, touch_hour, n_touches_credited, credited_cents).

    ``conversions``: (user, ts_us, id, cents); ``touches``:
    (user, ts_us, id). A touch qualifies when it happens at or before
    the conversion inside the lookback window. Per conversion the
    qualifying touches are ranked by (ts, id) — the id tie-break makes
    first/last deterministic; per-conversion windows run over the
    window-bounded touch list, never fact-scale. Credit lands on the
    touch's hour-of-day, the report dimension.
    """
    c = conversions.select(
        F.col(user_col).alias("u"),
        F.col(ts_us_col).cast("long").alias("cts"),
        F.col(id_col).alias("cid"),
        F.col(cents_col).cast("long").alias("cents"),
    )
    t = touches.select(
        F.col(user_col).alias("u"),
        F.col(ts_us_col).cast("long").alias("tts"),
        F.col(id_col).alias("tid"),
    )
    lb = int(lookback_days) * _DAY_US
    pairs = c.join(t, "u").filter(
        (F.col("tts") <= F.col("cts")) & (F.col("tts") > F.col("cts") - F.lit(lb))
    )
    w = Window.partitionBy("cid").orderBy(F.col("tts").asc(), F.col("tid").asc())
    pairs = (
        pairs.withColumn("rk", F.row_number().over(w))
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy("cid")))
        .withColumn(
            "touch_hour",
            F.expr(f"(tts div {3_600_000_000}) % 24").cast("long"),
        )
        # the three attribution models each read the ranked touch list
        # — pin or the user-keyed join + windows re-run per model
        .localCheckpoint(eager=True)
    )
    first = pairs.filter(F.col("rk") == 1).select(
        F.lit("first_touch").alias("model"), "touch_hour", F.col("cents").alias("credit")
    )
    last = pairs.filter(F.col("rk") == F.col("k")).select(
        F.lit("last_touch").alias("model"), "touch_hour", F.col("cents").alias("credit")
    )
    linear = pairs.select(
        F.lit("linear").alias("model"),
        "touch_hour",
        (
            F.expr("cents div k")
            + F.when(F.col("rk") == F.col("k"), F.expr("cents % k")).otherwise(0)
        ).cast("long").alias("credit"),
    )
    allm = first.unionByName(last).unionByName(linear)
    return (
        allm.groupBy("model", "touch_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches_credited"),
            F.sum("credit").cast("long").alias("credited_cents"),
        )
        .orderBy("model", "touch_hour")
    )
