"""MinHash-LSH banding parameter planner (the MMDS S-curve).

Given a signature length ``n_perm`` and a target Jaccard threshold,
enumerate every (bands b, rows r) factorization b·r = n_perm and score
it analytically (Leskovec/Rajaraman/Ullman, *Mining of Massive
Datasets* §3.4.3): a pair with Jaccard j collides in at least one band
with probability

    P(j; b, r) = 1 − (1 − j^r)^b

and the S-curve's inflection threshold is approximately (1/b)^(1/r).
The planner reports, per factorization, the estimated threshold, the
collision probabilities at caller-supplied probe similarities, the
false-negative rate at the target (1 − P(target)) and the
false-positive rate at a caller-chosen "clearly different" level, and
flags the factorization whose threshold lands closest to the target —
the (b, r) a production pipeline should feed to
:mod:`redshells_spark.dedup.minhash`.

This is pure closed-form arithmetic over at most a few dozen rows
(the divisor count of n_perm) — it runs on the driver-sized tail of a
plan, never touches the corpus, and exists so the expensive corpus
pass is run with parameters chosen by math instead of folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def lsh_parameter_plan(
    spark: SparkSession,
    n_perm: int = 128,
    target_jaccard: float = 0.8,
    fp_probe_jaccard: float = 0.4,
) -> DataFrame:
    """→ one row per (b, r) with b·r = ``n_perm``:
    (bands, rows_per_band, threshold_est, p_at_target, fn_at_target,
    fp_at_probe, selected) — ``selected`` marks the argmin of
    |threshold_est − target| (ties broken toward more bands, i.e. the
    recall-favouring side). Doubles are rounded to 4 decimals."""
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    b = F.col("bands").cast("double")
    r = F.col("rows_per_band").cast("double")
    thr = F.pow(1.0 / b, 1.0 / r)
    p_t = 1.0 - F.pow(1.0 - F.pow(F.lit(float(target_jaccard)), r), b)
    p_fp = 1.0 - F.pow(1.0 - F.pow(F.lit(float(fp_probe_jaccard)), r), b)
    divisors = (
        spark.range(1, n_perm + 1)
        .filter(F.lit(n_perm) % F.col("id") == 0)
        .select(
            F.col("id").alias("bands"),
            (F.lit(n_perm) / F.col("id")).cast("long").alias("rows_per_band"),
        )
    )
    scored = divisors.select(
        "bands",
        "rows_per_band",
        F.round(thr, 4).alias("threshold_est"),
        F.round(p_t, 4).alias("p_at_target"),
        F.round(1.0 - p_t, 4).alias("fn_at_target"),
        F.round(p_fp, 4).alias("fp_at_probe"),
        # integer micro-units of |threshold − target| so the argmin
        # below compares exact int64, never raw doubles
        F.floor(
            F.abs(thr - F.lit(float(target_jaccard))) * 1_000_000 + F.lit(0.5)
        )
        .cast("long")
        .alias("__dist_e6"),
    )
    # argmin over a divisor-count-sized relation: one global window is
    # fine here (bounded ~d(n_perm) rows, never corpus-sized)
    w = Window.partitionBy()
    best_dist = F.min("__dist_e6").over(w)
    best_bands = F.max(
        F.when(F.col("__dist_e6") == best_dist, F.col("bands"))
    ).over(w)
    return scored.select(
        "bands",
        "rows_per_band",
        "threshold_est",
        "p_at_target",
        "fn_at_target",
        "fp_at_probe",
        (
            (F.col("__dist_e6") == best_dist)
            & (F.col("bands") == best_bands)
        ).alias("selected"),
    )
