"""The experimentation plane end-to-end over a logged event stream:
off-policy value of a candidate policy (IPS/SNIPS), CUPED-adjusted A/B
means, uplift targeting (Qini deciles), always-valid monitoring three
ways (SPRT / group-sequential / CUSUM), robust and ratio metrics
(trimmed means, delta-method CI), multi-touch revenue attribution, and
pre-experiment power planning — every number the hash-certified output
of a one-shuffle aggregate plan.

Run: python examples/experiment_readout_example.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

from _common import example_args, example_session

DAY_US = 86_400_000_000


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("experiment_readout_example")
    from pyspark.sql import functions as F

    from redshells_spark.operators.attribution import multi_touch_attribution
    from redshells_spark.operators.changepoint import cusum_monitor
    from redshells_spark.operators.experiment import (
        cents,
        cuped_adjusted,
        delta_method_ratio,
        ips_policy_value,
        power_mde_table,
        qini_uplift_deciles,
    )
    from redshells_spark.operators.robust import trimmed_winsorized_means
    from redshells_spark.operators.sequential import sprt_monitor
    from redshells_spark.timeutil import event_us

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    ev = ev.withColumn("us", event_us(ev, "ts"))

    print("== off-policy value (uniform vs greedy-purchase target) ==")
    lg = ev.select(F.col("event_type").alias("action"), cents("value").alias("r"))
    ips_policy_value(lg, "action", "r", None, "uniform").show(truncate=False)
    ips_policy_value(lg, "action", "r", ["purchase"], "greedy").show(truncate=False)

    print("== CUPED: pre-period clicks as covariate, purchase cents as outcome ==")
    mid = ev.agg(((F.min("us") + F.max("us")) / 2).cast("long").alias("m")).collect()[0]["m"]
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.sum(F.when(F.col("us") < mid, cents("value")).otherwise(0)).cast("long").alias("pre"),
        F.sum(F.when(F.col("us") >= mid, cents("value")).otherwise(0)).cast("long").alias("post"),
    )
    cuped_adjusted(per_user, "variant", "pre", "post").show()

    print("== Qini uplift deciles (score = clicks, treat = signup) ==")
    units = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("treat"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("resp"),
    )
    qini_uplift_deciles(units, "treat", "score", "resp").show()

    print("== sequential monitors over the same daily counts ==")
    daily = ev.groupBy(F.expr(f"us div {DAY_US}").cast("long").alias("period")).agg(
        F.sum(F.expr("event_type in ('view','purchase')").cast("long")).cast("long").alias("n_trials"),
        F.sum(F.expr("event_type = 'purchase'").cast("long")).cast("long").alias("n_success"),
    )
    sprt_monitor(daily, "period", "n_trials", "n_success", p0=0.45, p1=0.55).show(8)
    cusum_monitor(daily.select("period", F.col("n_success").alias("v")), "period", "v").show(8)

    print("== robust + ratio metrics ==")
    trimmed_winsorized_means(
        ev.select("event_type", cents("value").alias("c")), ["event_type"], "c"
    ).orderBy("event_type").show()
    per_user_ratio = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents("value")).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("long").alias("y"),
    )
    delta_method_ratio(per_user_ratio, "x", "y", "revenue_per_view").show()

    print("== multi-touch attribution (7-day lookback, by touch hour) ==")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("ts_us"), "event_id", cents("value").alias("c")
    )
    touch = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("ts_us"), "event_id"
    )
    att = multi_touch_attribution(conv, touch, cents_col="c")
    att.groupBy("model").agg(F.sum("credited_cents").alias("total_cents")).orderBy("model").show()

    print("== power planning ==")
    counts = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("event_type = 'purchase'").cast("long")).cast("long").alias("n_success"),
        F.countDistinct(F.expr(f"us div {DAY_US}")).cast("long").alias("n_days"),
    )
    power_mde_table(counts, [7, 14, 28]).show()


if __name__ == "__main__":
    main()
