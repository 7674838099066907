"""Unbiased pass@k estimation (Chen et al. 2021, arXiv:2107.03374).

"Evaluating Large Language Models Trained on Code" defines the
standard generation-eval metric: given n samples per problem of which
c are correct,

    pass@k = 1 − C(n−c, k) / C(n, k)
           = 1 − Π_{i=0..k−1} (n−c−i) / (n−i)

— the unbiased estimator of the probability that at least one of k
drawn samples is correct. Computing the binomial ratio as the
telescoping product keeps every intermediate in [0, 1] (no factorial
overflow at any n) and, because both engines fold the SAME sequence of
IEEE doubles left-to-right, the result is bit-identical across Spark
(``F.aggregate`` over ``F.sequence``) and SQL (``list_reduce`` over
``generate_series``).

Scale shape: one groupBy(problem) over the sample table (map-side
combinable counts), then per-(problem, k) closed-form arithmetic on a
problems×|ks| relation — the expensive part is counting, which is one
shuffle; the estimator itself never touches the samples again.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def pass_at_k_estimator(n: Column, c: Column, k: Column) -> Column:
    """pass@k as a Catalyst expression from long columns (n samples,
    c correct, k draws); defined for k <= n. When every sample is
    wrong the product is 1 and pass@k = 0; when n − c < k at least one
    correct sample is always drawn and pass@k = 1 (the product hits a
    zero factor)."""
    prod = F.aggregate(
        F.sequence(F.lit(0), k - 1),
        F.lit(1.0),
        lambda acc, i: acc * (n - c - i) / (n - i),
    )
    # n - c < k makes a factor non-positive; the closed form is exactly 1
    return F.when(n - c < k, F.lit(1.0)).otherwise(1.0 - prod)


def pass_at_k(
    samples: DataFrame,
    problem_column: str,
    correct_column: str,
    ks: Sequence[int] = (1, 5, 10),
) -> DataFrame:
    """→ (problem, n_samples, n_correct, k, pass_at_k) — one row per
    problem per k with k <= n_samples (the unbiased estimator needs at
    least k samples; smaller groups drop that k, they are not
    extrapolated). ``correct_column`` is boolean."""
    require_columns(samples, [problem_column, correct_column])
    if not ks or any(int(k) < 1 for k in ks):
        raise ValueError(f"ks must be positive ints, got {ks}")
    counts = samples.groupBy(F.col(problem_column).alias("problem")).agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(F.col(correct_column).cast("long")).cast("long").alias("n_correct"),
    )
    ks_dedup = list(dict.fromkeys(int(k) for k in ks))
    with_k = (
        counts.select(
            "*",
            F.explode(F.array(*[F.lit(k) for k in ks_dedup])).alias("__k"),
        )
        .withColumn("k", F.col("__k").cast("long"))
        .filter(F.col("k") <= F.col("n_samples"))
    )
    return with_k.select(
        "problem",
        "n_samples",
        "n_correct",
        "k",
        F.round(
            pass_at_k_estimator(
                F.col("n_samples"), F.col("n_correct"), F.col("k")
            ),
            4,
        ).alias("pass_at_k"),
    )
