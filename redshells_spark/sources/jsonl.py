"""JSONL document ingestion with explicit corruption policy.

Web-scale document corpora arrive as JSON-lines with a long tail of
malformed records; silently dropping them skews the corpus and
silently crashing on them loses the job at hour N. This reader makes
the policy explicit:

- ``mode="permissive"`` (default): malformed lines land in a corrupt-
  record column; the caller gets (clean_df, corrupt_df) and decides —
  count them, quarantine them to a side sink, alert on a threshold.
- ``mode="failfast"``: refuse the batch on the first malformed line
  (CI / backfill gates).

The schema is REQUIRED, never inferred: inference costs an extra full
pass at 100 TB and worse, silently re-types columns when a batch's
value distribution shifts (the dtype drift that broke round 2 —
NOTES.md). Pin the schema; let corrupt-record capture absorb drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "permissive",
) -> tuple[DataFrame, DataFrame]:
    """→ (clean, corrupt): ``clean`` has the pinned schema, ``corrupt``
    is (raw_line) rows that failed to parse. ``failfast`` raises at
    action time on the first bad line and returns an empty corrupt
    frame."""
    if mode not in ("permissive", "failfast"):
        raise ValueError(f"read_jsonl: unknown mode {mode!r}")
    if mode == "failfast":
        df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        return df, df.limit(0).select(F.lit("").alias("raw_line")).limit(0)
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materialization barriers around the
    # corrupt-record column when filtering on it; a checkpoint-free
    # cache-scope is enough for the split reads
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def corruption_rate_guard(
    clean: DataFrame, corrupt: DataFrame, max_rate: float
) -> dict[str, float]:
    """Count both sides and refuse the batch when the corrupt share
    exceeds ``max_rate`` — the alert a production ingest wires to its
    quarantine sink. Returns the counts for logging."""
    n_clean, n_corrupt = clean.count(), corrupt.count()
    total = n_clean + n_corrupt
    rate = (n_corrupt / total) if total else 0.0
    if rate > max_rate:
        raise ValueError(
            f"corruption_rate_guard: {n_corrupt}/{total} lines corrupt "
            f"({rate:.4f} > {max_rate})"
        )
    return {"n_clean": n_clean, "n_corrupt": n_corrupt, "rate": rate}
