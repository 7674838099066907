"""Poisson bootstrap confidence intervals — the resampling scheme that
works at 100 TB.

A classical bootstrap draws n-out-of-n WITH replacement, which needs a
global resample index — impossible to materialize for a 100 TB table.
The Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
for massive data streams") replaces it with an independent
Poisson(1)-distributed *weight per (row, replica)*: one stateless pass,
every replica a map-side-combinable weighted aggregate, no coordination.
n is random per replica but the CI is asymptotically identical.

Determinism contract (oracle-exact across engines at any scale):

- the per-(row, replica) uniform is a 4-hex-char window of
  ``md5(seed|group|id)`` (each digest serves EIGHT replicas — slot k
  reads chars [4k+1, 4k+4] — cutting the hash cost 8x), compared
  LEXICOGRAPHICALLY against precomputed 8-hex-char thresholds —
  fixed-width lowercase hex ordering == numeric ordering, and md5 is
  identical in Spark and DuckDB, so the Poisson weight is the same on
  both sides;
- the metric is accumulated in exact integer units
  (``functions/exact.py`` fixed-point), so every replica mean is a
  ratio of identical int64s — bit-identical doubles on both engines,
  no order-dependent float sums at any data size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.exact import money_units
from redshells_spark.schema import require_columns


def poisson1_thresholds(max_k: int = 8) -> list[str]:
    """Inverse-CDF thresholds for Poisson(lambda=1) as 4-hex-char
    strings (16-bit resolution — PMF quantization error ~2e-5, far
    below bootstrap noise): weight = #thresholds the md5 window is >=
    (capped at ``max_k``; the truncated tail mass at k=8 is ~1e-6)."""
    acc = 0.0
    fact = 1.0
    out = []
    for k in range(max_k):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        out.append(format(int(acc * 2**16), "04x"))
    return out


def _poisson_weight(prefix, thresholds: list[str]):
    w = F.lit(len(thresholds))
    for k in reversed(range(len(thresholds))):
        w = F.when(prefix < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def replica_sums(
    df: DataFrame,
    value_column: str,
    id_column: str,
    n_replicas: int = 200,
    seed: int = 3,
    scale: int = 100,
) -> DataFrame:
    """→ (b, wu, ws): per-replica weighted sums in exact integer units
    plus weight totals — the MERGEABLE state of the Poisson bootstrap.
    Weights depend only on (seed, replica, row id), never on batching
    or partitioning, and the sums are associative int64 — so replica
    sums computed per micro-batch and folded additively equal the
    single-pass sums EXACTLY (the streaming parity contract of
    ``streaming/bootstrap.py``)."""
    require_columns(df, [id_column, value_column])
    if n_replicas < 4:
        raise ValueError(f"n_replicas must be >= 4, got {n_replicas}")
    thresholds = poisson1_thresholds()
    units = money_units(F.col(value_column), scale)
    # one md5 yields EIGHT independent 16-bit uniforms (4 hex chars
    # each) — so the hash is computed at 1/8 of the exploded
    # cardinality: explode over hash groups g first, THEN over the 8
    # slots of each digest. replica b = 8*g + slot.
    n_groups = (n_replicas + 7) // 8
    # repartition the COMPACT (id, units) rows BEFORE the ~13x8 replica
    # explosion (the _pairs_df precedent): the input is often one scan
    # split or an AQE-coalesced pair of partitions, and without this
    # the entire exploded md5 + weight cascade — the heavy leg — runs
    # on one or two cores. Shuffling two narrow columns is ~1% of the
    # exploded volume; the hash key is the row id (deterministic).
    n_part = df.sparkSession.sparkContext.defaultParallelism
    hashed = (
        df.select(F.col(id_column).alias("__id"), units.alias("__u"))
        .repartition(n_part, "__id")
        .withColumn("g", F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))))
        .withColumn(
            "__h",
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(seed)),
                    F.col("g").cast("string"),
                    F.col("__id").cast("string"),
                )
            ),
        )
    )
    base = hashed.withColumn(
        "s", F.explode(F.sequence(F.lit(0), F.lit(7)))
    ).withColumn("b", F.col("g") * 8 + F.col("s")).filter(
        F.col("b") < n_replicas
    )
    prefix = F.substring(F.col("__h"), F.col("s") * 4 + 1, 4)
    weighted = base.withColumn("__w", _poisson_weight(prefix, thresholds))
    return weighted.groupBy("b").agg(
        F.sum(F.col("__w") * F.col("__u")).cast("long").alias("wu"),
        F.sum("__w").cast("long").alias("ws"),
    )


def value_totals(
    df: DataFrame, value_column: str, scale: int = 100
) -> DataFrame:
    """→ one row (su, n): exact integer-unit value sum and row count —
    the mergeable state behind the point estimate."""
    units = money_units(F.col(value_column), scale)
    return df.agg(
        F.coalesce(F.sum(units), F.lit(0)).cast("long").alias("su"),
        F.count("*").cast("long").alias("n"),
    )


def ci_from_sums(
    reps: DataFrame,
    tot: DataFrame,
    n_replicas: int = 200,
    alpha: float = 0.05,
    scale: int = 100,
) -> DataFrame:
    """(b, wu, ws) + (su, n) → one row (n_replicas, point_mean, ci_lo,
    ci_hi), doubles rounded to 4 decimals. ``ci_lo``/``ci_hi`` are the
    discrete floor(alpha/2 * B) order statistics of the replica means
    (no interpolation — engine-portable by construction). The window
    is bounded by ``n_replicas``, never by data size."""
    means = (
        reps.filter(F.col("ws") > 0)
        .select(
            "b",
            (
                F.col("wu").cast("double")
                / F.col("ws").cast("double")
                / F.lit(float(scale))
            ).alias("boot_mean"),
        )
        # n_replicas rows; pin them so the ci-lo / ci-hi / count
        # branches below don't each re-run the upstream aggregation
        .localCheckpoint(eager=True)
    )
    k_lo = int(math.floor(alpha / 2 * n_replicas))
    w = Window.orderBy(F.col("boot_mean").asc(), F.col("b").asc())
    ordered = means.withColumn("rn", F.row_number().over(w) - 1)
    cnt = ordered.groupBy().agg(F.count("*").alias("n_reps"))
    lo = ordered.filter(F.col("rn") == k_lo).select(
        F.round("boot_mean", 4).alias("ci_lo")
    )
    hi = ordered.join(cnt).filter(
        F.col("rn") == F.col("n_reps") - 1 - F.lit(k_lo)
    ).select(F.round("boot_mean", 4).alias("ci_hi"))
    point = tot.select(
        F.round(
            F.col("su").cast("double")
            / F.col("n").cast("double")
            / F.lit(float(scale)),
            4,
        ).alias("point_mean")
    )
    return (
        cnt.select(F.col("n_reps").cast("long").alias("n_replicas"))
        .crossJoin(point)
        .crossJoin(lo)
        .crossJoin(hi)
    )


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_column: str,
    id_column: str,
    n_replicas: int = 200,
    seed: int = 3,
    alpha: float = 0.05,
    scale: int = 100,
) -> DataFrame:
    """Percentile-bootstrap CI for ``mean(value_column)`` — one scan
    exploded into mergeable replica sums (:func:`replica_sums`), then
    the B-row order-statistic CI (:func:`ci_from_sums`)."""
    reps = replica_sums(df, value_column, id_column, n_replicas, seed, scale)
    tot = value_totals(df, value_column, scale)
    return ci_from_sums(reps, tot, n_replicas, alpha, scale)
