"""Markov-chain multi-touch attribution (removal effects).

The Anderl et al. (2014) graph-based attribution model: user journeys
become a first-order Markov chain over channel states plus
start/conv/null; a channel's credit is its REMOVAL EFFECT — the
relative drop in conversion probability when every transition into
the channel is redirected to null and the channel's outgoing edges are
deleted.

Determinism/scale contract:
- journey derivation is one partitioned window over (user, time) plus
  one min-struct aggregation for the first conversion — co-partitioned
  on user_id, no global sort;
- the transition-count relation is bounded by (channels+2)^2 rows, so
  every chain solve runs on a level table;
- conversion probability is the BOUNDED-HORIZON absorption probability
  P(reach conv within `horizon` steps): `horizon` synchronous value-
  iteration steps, each new value rounded to 10 decimals (the pagerank
  idiom) so the fixpoint prefix is bit-identical across engines. The
  bounded horizon IS the metric contract — no convergence claim, and
  the matching DuckDB oracle unrolls the identical steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def journey_transition_counts(
    events: DataFrame,
    conv_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "us",
    id_col: str = "event_id",
) -> DataFrame:
    """(src, dst, c): exact int64 transition counts of the journey
    chain. Journeys are each user's non-conversion events strictly
    before their first conversion event ((time, id) lexicographic — a
    total order), start->first / last->conv|null appended; converted
    users with no prior events contribute start->conv."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(time_col).alias("us"),
        F.col(id_col).alias("eid"),
    )
    # one per-user aggregate serves BOTH the first-conversion cutoff
    # and the empty-journey count: a converted user's journey is empty
    # iff their globally-first event IS their first purchase (events
    # before f are non-purchase by definition of f, so "no event < f"
    # ⇔ min-over-all == min-over-purchases). Materialized once —
    # it is consumed by the journey join AND the start→conv rows, and
    # the earlier tmid/tend/tempty branches each re-expanded the whole
    # events subtree (~6 fact scans, two window sorts).
    ua = (
        ev.groupBy("u")
        .agg(
            F.min(
                F.when(F.col("t") == conv_type, F.struct("us", "eid"))
            ).alias("f"),
            F.min(F.struct("us", "eid")).alias("g"),
        )
        .localCheckpoint(eager=True)  # user-dimension-bounded
    )
    pre = (
        ev.filter(F.col("t") != conv_type)
        .join(ua.select("u", "f"), "u", "left")
        .filter(F.col("f").isNull() | (F.struct("us", "eid") < F.col("f")))
        .select("u", "t", F.col("us"), "eid", F.col("f").isNotNull().alias("conv"))
    )
    # single ascending sort: last row is rn == count-over-partition
    # (the descending row_number needed a second sort of the journey
    # relation); every row emits its lag transition, the last row
    # additionally emits the absorbing edge — one pass, no union of
    # re-expanded subtrees
    w = Window.partitionBy("u").orderBy(F.col("us").asc(), F.col("eid").asc())
    wu = Window.partitionBy("u")
    ordered = pre.select(
        "t",
        "conv",
        F.lag("t").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("cnt"),
    )
    mid = F.struct(
        F.coalesce(F.col("prev"), F.lit("start")).alias("src"),
        F.col("t").alias("dst"),
    )
    end = F.struct(
        F.col("t").alias("src"),
        F.when(F.col("conv"), "conv").otherwise("null").alias("dst"),
    )
    pairs = ordered.select(
        F.explode(
            F.when(F.col("rn") == F.col("cnt"), F.array(mid, end)).otherwise(
                F.array(mid)
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    tempty = ua.filter(
        F.col("f").isNotNull() & (F.col("g") == F.col("f"))
    ).select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    return (
        pairs.unionByName(tempty)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _round_half_up(x: float, digits: int) -> float:
    """Spark's ROUND semantics for doubles: BigDecimal.valueOf(x)
    (shortest decimal repr) setScale(digits, HALF_UP) — replicated with
    Decimal(repr(x)). DuckDB's round() has matched this across the
    whole oracle suite."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _absorption_within_horizon(
    counts: dict, removed: str | None, horizon: int
) -> float:
    """P(reach conv within horizon steps from start) on the chain with
    `removed` cut (outgoing edges deleted, incoming redirected to
    null). Pure bounded scalar math over the collected level table;
    every step value is rounded to 10 decimals so the result is
    bit-identical to the relational/SQL evaluation of the same chain
    (sum-order noise ~1e-17 sits far below the rounding grid)."""
    c2: dict = {}
    for (src, dst), c in counts.items():
        if src == removed:
            continue
        d2 = "null" if dst == removed else dst
        c2[(src, d2)] = c2.get((src, d2), 0) + c
    tot: dict = {}
    for (src, _), c in c2.items():
        tot[src] = tot.get(src, 0) + c
    trans: dict = {}
    for (src, dst), c in sorted(c2.items()):
        trans.setdefault(src, []).append((dst, _round_half_up(c / tot[src], 10)))
    v = {s: 0.0 for s in tot}
    v["conv"], v["null"] = 1.0, 0.0
    for _ in range(horizon):
        nv = {}
        for src, lst in trans.items():
            nv[src] = _round_half_up(sum(p * v.get(d, 0.0) for d, p in lst), 10)
        v.update(nv)
        v["conv"], v["null"] = 1.0, 0.0
    return v.get("start", 0.0)


def removal_effect_attribution(
    spark: SparkSession,
    cnt: DataFrame,
    channels: list,
    horizon: int = 16,
) -> DataFrame:
    """(channel, pc_base, pc_removed, removal_effect,
    attribution_share) — one row per channel. The transition-count
    relation is bounded by (channels+2)^2 rows, so collecting it is the
    distributed_rank offset-map pattern, not a driver-side data loop:
    the fact-scale work (journey windows, count groupBy) stays in
    Spark; the chain solves are O(states^2 * horizon) scalar math. The
    share denominator is the fixed left-associated sum of per-channel
    effects, matching the oracle's literal expression order."""
    counts = {(r["src"], r["dst"]): r["c"] for r in cnt.collect()}
    pc_base = _absorption_within_horizon(counts, None, horizon)
    effs = {}
    pcs = {}
    for ch in channels:
        pcs[ch] = _absorption_within_horizon(counts, ch, horizon)
        effs[ch] = max(
            _round_half_up(1.0 - pcs[ch] / pc_base, 6) if pc_base > 0 else 0.0,
            0.0,
        )
    total = 0.0
    for ch in channels:
        total = total + effs[ch]
    rows = [
        (
            ch,
            pc_base,
            pcs[ch],
            effs[ch],
            _round_half_up(effs[ch] / total, 6) if total > 0 else None,
        )
        for ch in channels
    ]
    return spark.createDataFrame(
        rows,
        "channel string, pc_base double, pc_removed double, "
        "removal_effect double, attribution_share double",
    )
