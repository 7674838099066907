"""Greedy maximum-coverage subset selection (coreset/eval-set picking).

"Pick the k documents that together cover the most vocabulary" is the
maximum-coverage problem; the greedy algorithm (pick the document with
the most not-yet-covered elements, repeat) is the classic (1 − 1/e)
approximation (Nemhauser, Wolsey & Fisher 1978) and the standard
recipe for diverse eval subsets, seed corpora, and dictionary-building
passes in data pipelines.

Relational form: k bounded rounds; each round is one map-combined
groupBy count over the REMAINING (id, element) relation, one
argmax (orderBy/limit(1) → TakeOrdered — no global window), and one
anti-join that removes the newly covered elements. The per-round
driver collect is a single row, k ≤ a constant — the capped-and-loud
driver-boundary pattern used by the repo's other iterative fits.
``localCheckpoint`` per round bounds the plans.

Deterministic (total-order argmax tie-break on id), so the whole loop
unrolls into exact SQL stages — see queries/r6c_ops.py's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def greedy_max_coverage(
    sets_df: DataFrame,
    id_column: str = "doc_id",
    element_column: str = "shingle",
    k: int = 6,
) -> DataFrame:
    """→ (step, ``id_column``, gain, covered_total): the greedy
    max-coverage picks in order. Stops early (fewer than k rows) when
    every element is covered — matching the unrolled-SQL oracle, whose
    later stages go empty the same way."""
    require_columns(sets_df, [id_column, element_column])
    if k < 1:
        raise ValueError(f"bad k={k}")
    remaining = sets_df.select(
        F.col(id_column).alias("__id"), F.col(element_column).alias("__el")
    ).localCheckpoint(eager=True)
    rows: list[tuple[int, object, int, int]] = []
    covered = 0
    for step in range(1, k + 1):
        top = (
            remaining.groupBy("__id")
            .agg(F.count(F.lit(1)).alias("__g"))
            .orderBy(F.col("__g").desc(), F.col("__id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pick, gain = top[0]["__id"], int(top[0]["__g"])
        covered += gain
        rows.append((step, pick, gain, covered))
        picked_els = remaining.filter(F.col("__id") == F.lit(pick)).select("__el")
        remaining = remaining.join(
            picked_els, "__el", "left_anti"
        ).localCheckpoint(eager=True)
    spark = sets_df.sparkSession
    id_type = dict(sets_df.dtypes)[id_column]
    return spark.createDataFrame(
        rows, f"step long, {id_column} {id_type}, gain long, covered_total long"
    )
