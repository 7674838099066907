"""Streaming deduplication — the ingest-side counterpart of
:mod:`redshells_spark.dedup` for continuously-arriving documents.

A production LLM-data pipeline dedups at ingest, not only in batch:
exact duplicates (retries, crawler re-fetches, mirrored feeds) should
never reach storage. Spark-first shape:

- fingerprint = md5 of the normalized text (the same portable
  fingerprint the batch ``dedup/exact.py`` uses, so batch re-dedup of
  a streamed corpus is a no-op);
- ``dropDuplicatesWithinWatermark`` keyed on the fingerprint: state is
  one (fingerprint, timestamp) entry per distinct doc inside the
  watermark horizon — eviction is bounded by the watermark, so state
  can't grow forever (the failure mode of naive stream dedup).

Works identically on a static DataFrame (minus the watermark), which
is how the parity test validates it against the batch dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_column(text_column: str = "text", normalize: bool = True) -> F.Column:
    """Portable content fingerprint: md5 of lowercased,
    whitespace-collapsed text — identical in DuckDB, so oracle-able."""
    c = F.col(text_column)
    if normalize:
        c = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.md5(c)


def dedup_stream(
    docs: DataFrame,
    text_column: str = "text",
    ts_column: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct document.

    Streaming input (with ``ts_column``): watermarked
    ``dropDuplicatesWithinWatermark`` on the fingerprint — per-key
    state evicted once the watermark passes, memory bounded by
    (distinct docs per horizon), not stream length.

    Static input (``ts_column=None``): plain ``dropDuplicates`` on the
    same fingerprint — the batch-parity path.
    """
    with_fp = docs.withColumn("fingerprint", fingerprint_column(text_column))
    if ts_column is None:
        return with_fp.dropDuplicates(["fingerprint"])
    return with_fp.withWatermark(ts_column, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
