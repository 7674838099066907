"""Corpus integrity digests — cheap snapshot-equality certificates.

"Is this copy of the corpus the one we trained on?" at 100 TB can't be
answered by row-by-row diffing across clusters. A Merkle-style digest
table can: hash every row's content to 60 bits, bucket rows by hash,
and keep per-bucket (count, XOR-fold, bounded-sum-fold). Properties:

- **order-free and mergeable**: XOR and sum are commutative monoids,
  so per-partition partial digests combine map-side and across
  incremental loads; the global row is the fold of the bucket rows;
- **locating**: two snapshots that differ disagree in the specific
  bucket rows containing the changed rows — a 64-row diff pinpoints
  which 1/64th of the keyspace to re-scan;
- **complementary folds**: XOR alone is blind to duplicated rows
  (x ⊕ x = 0), the modular sum alone is blind to crafted offsets —
  together with the count they make accidental collisions ~2^-88.

The sum fold uses h mod 2^28 so int64 never overflows below ~3·10^10
rows per bucket (raise the bucket count, not the modulus, beyond
that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.operators.bloom import _h60_sql
from redshells_spark.schema import require_columns

SUM_MOD = 1 << 28


def corpus_digest(
    df: DataFrame,
    content_columns: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """→ one row per bucket plus a '__all__' fold: (bucket, n_rows,
    xor_digest, sum_digest). Row content is the '|'-joined string of
    ``content_columns`` (NULL-safe via empty-string coalesce)."""
    require_columns(df, content_columns)
    content = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_columns]
    )
    h = df.select(content.alias("__c")).select(
        F.expr(_h60_sql("__c")).alias("__h")
    )
    per_bucket = (
        h.select(
            (F.col("__h") % n_buckets).cast("long").alias("bucket"),
            "__h",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(__h)").cast("long").alias("xor_digest"),
            F.sum(F.col("__h") % SUM_MOD).cast("long").alias("sum_digest"),
        )
    )
    total = per_bucket.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.expr("bit_xor(xor_digest)").cast("long").alias("xor_digest"),
        F.sum("sum_digest").cast("long").alias("sum_digest"),
    )
    return per_bucket.unionByName(total)
