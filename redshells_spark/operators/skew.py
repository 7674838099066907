"""Explicit skew-handling levers for 100 TB execution.

AQE's skew-join splitting covers sort-merge joins; these helpers cover
the cases AQE can't: skewed aggregation keys (two-phase salted
aggregation) and skewed broadcast-side fan-out joins (salt replicate).
Used when a handful of keys dominate — power-law user ids, boilerplate
LSH buckets, hot items.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_columns: Sequence[str],
    agg_exprs: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (key, salt) — spreading a hot key over ``num_salts`` reducers —
    phase 2 merges the partials on the key alone.

    ``agg_exprs``: output column → one of 'sum' | 'count' | 'min' |
    'max' (decomposable aggregates only; avg = sum+count at the call
    site). Input column is taken from the output name (``sum:col``
    convention: ``{"total": "sum:value"}``)."""
    keys = list(key_columns)
    salted = df.withColumn("__salt", (F.rand(0) * num_salts).cast("int"))

    phase1_aggs, phase2_aggs = [], []
    for out_name, spec in agg_exprs.items():
        op, _, col = spec.partition(":")
        col = col or out_name
        if op == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(out_name))
            phase2_aggs.append(F.sum(out_name).alias(out_name))
        elif op == "sum":
            phase1_aggs.append(F.sum(col).alias(out_name))
            phase2_aggs.append(F.sum(out_name).alias(out_name))
        elif op == "min":
            phase1_aggs.append(F.min(col).alias(out_name))
            phase2_aggs.append(F.min(out_name).alias(out_name))
        elif op == "max":
            phase1_aggs.append(F.max(col).alias(out_name))
            phase2_aggs.append(F.max(out_name).alias(out_name))
        else:
            raise ValueError(f"non-decomposable aggregate {op!r}")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side randomly, replicate the
    small side across all salts (explode), join on (key, salt). Turns
    one hot-key reducer into ``num_salts`` even ones. Only worth it
    when the small side fits the ``num_salts``-fold replication —
    otherwise prefer AQE skew-join."""
    big_salted = big.withColumn("__salt", (F.rand(0) * num_salts).cast("int"))
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_salted.join(small_replicated, on=[on, "__salt"], how=how).drop("__salt")


def key_skew_profile(df: DataFrame, key_column: str, top_n: int = 10) -> DataFrame:
    """Diagnostic: top-N heaviest keys with their share of rows —
    decides whether salting is warranted (share ≫ 1/shuffle.partitions)."""
    total = df.count()
    return (
        df.groupBy(key_column)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(total), 6))
        .orderBy(F.col("rows").desc(), F.col(key_column).asc())
        .limit(top_n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side ×``num_salts``, join on (keys + salt), drop the salt.

    A hot key's rows land on ``num_salts`` different reducers instead
    of one; each big row still matches exactly one replica of each
    matching small row, so the result is row-identical to the plain
    join. The salt is a deterministic hash of the whole big row
    (xxhash64 of all columns) — reruns produce the same partition
    assignment, which keeps shuffles reusable across stages.

    Use for sort-merge joins where one side is too big to broadcast
    AND AQE's skew splitting can't kick in (e.g. the skew is in the
    build of a shuffled hash join); for broadcastable small sides just
    broadcast — salting buys nothing there. Cost: small side ×num_salts
    (keep num_salts modest; the small side shuffle grows linearly).
    """
    keys = list(on)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(num_salts)).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_big.join(replicated, on=keys + ["__salt"], how=how).drop("__salt")
