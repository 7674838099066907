"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`redshells_spark.queries`; this module is
the thin contract shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end word→item retrieval on sf0.001 — keyword
    matching → word embeddings (L2-normalized sums over member docs) →
    broadcast dot-product retrieval with per-word top-k. The whole
    reference app dataflow, all JVM-side, oracle-verified at sf0.01."""
    from redshells_spark.queries import QUERIES

    return QUERIES["word_item_retrieval"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from redshells_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from redshells_spark.queries import get_oracles

    return get_oracles()
