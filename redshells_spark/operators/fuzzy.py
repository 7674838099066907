"""Blocked fuzzy string matching (entity resolution).

The classic record-linkage shape (Fellegi-Sunter blocking; Christen,
"Data Matching" 2012): exact-match on a cheap blocking key first, then
pay the edit-distance only inside blocks. Two scale decisions make
this hold at 100 TB:

- **dedupe before the quadratic**: candidates are the DISTINCT name
  strings, not the rows — a corpus with billions of rows over millions
  of distinct names does the pairwise work on the millions;
- **block-partitioned self-join**: the candidate join shuffles on the
  blocking key, so each block's quadratic runs locally and skew is
  bounded by the largest block (pick blocking keys accordingly), never
  by the corpus.

`F.levenshtein` is JVM-side codegen (same DP definition as DuckDB's
``levenshtein``), so the whole pipeline stays off Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def fuzzy_blocked_matches(
    df: DataFrame,
    name_column: str,
    block_sql: str,
    max_distance: int = 3,
) -> DataFrame:
    """→ (block, name_a, name_b, lev): distinct-name pairs within a
    block at Levenshtein distance 1..max_distance, ``name_a < name_b``.

    ``block_sql`` is a SQL expression over the aliased column ``name``
    producing the blocking key (e.g. last token + first char). Pairs
    straddling blocks are not compared — the standard blocking recall
    tradeoff; callers wanting higher recall union several blocking
    passes.
    """
    require_columns(df, [name_column])
    names = (
        df.select(F.col(name_column).alias("name"))
        .distinct()
        .withColumn("block", F.expr(block_sql))
    )
    a = names.alias("a")
    b = names.alias("b")
    lev = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            lev.cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= max_distance)
    )
