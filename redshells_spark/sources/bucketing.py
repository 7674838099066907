"""Bucketed table layout: pre-shuffled, co-located joins.

At 100 TB the single biggest recurring cost in a star-join workload is
re-shuffling the fact table on its join key for every query. Spark's
answer is bucketing: write the table hash-partitioned on the key into
a fixed number of buckets (``DataFrameWriter.bucketBy`` +
``saveAsTable``); every later equi-join or aggregate on that key reads
the bucket layout from the catalog and skips the Exchange entirely —
both sides arrive pre-partitioned, so a sort-merge join runs with NO
shuffle stage. The write pays the shuffle once; every query after
rides it.

Rules that make this work (and that :func:`write_bucketed` enforces):

- both join sides must be bucketed **on the same key into the same
  bucket count** (or one side's count a divisor — we require equal);
- the number of buckets fixes max parallelism of the no-shuffle read,
  so size it to the target cluster (buckets ≈ cores × a small factor);
- ``spark.sql.sources.bucketing.enabled`` must be on (default) and
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` left alone —
  we sort within buckets at write so merge joins skip the sort too.

The local tests register tables in the session's in-memory catalog
(``spark.sql.warehouse.dir``); on a cluster this is the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    One shuffle now, zero shuffles for every later join/aggregate on
    ``bucket_col`` against a table bucketed the same way.
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_within:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-key/same-count bucketed tables — reads both
    layouts from the catalog; the plan contains no Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on)


def verify_no_shuffle_join(df: DataFrame) -> bool:
    """True when the physical plan joins without any Exchange —
    the property bucketing exists to buy."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return "Exchange" not in plan and ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)
