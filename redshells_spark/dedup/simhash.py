"""SimHash near-duplicate detection (Charikar '02, Google-style).

64-bit signature: per token, xxhash64 → ±1 per bit, weighted by term
frequency; signature bit b = sign of the summed weights. Near-dups =
pairs whose signatures differ in ≤ k bits; candidate generation via
the block-permutation trick (split 64 bits into k+1 blocks — any pair
within Hamming distance k shares at least one exact block).

Two token-hash modes:

- default ``xxhash64`` (64 bits) — JVM-side, fastest, engine-specific;
- ``portable=True`` (60 bits) — the hash is the first 15 hex digits of
  ``md5(token)`` as an integer, arithmetic DuckDB can replicate
  digit-by-digit, so the WHOLE pipeline (signatures → block-permutation
  candidates → Hamming filter) gets a full SQL oracle
  (see ``queries.py`` ``simhash_near_dup``). Same plan shape, ~2×
  hash cost — use it when cross-engine verifiability matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

BITS = 64
PORTABLE_BITS = 60  # 15 md5 hex digits; fits a signed 64-bit int


def portable_token_hash(col: str | Column) -> Column:
    """60-bit integer from the first 15 hex chars of md5 — identical in
    Spark and DuckDB (md5 over UTF-8 is engine-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    docs: DataFrame,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
    portable: bool = False,
) -> DataFrame:
    """→ (doc_id, simhash:long).

    Plan: explode → tf per (doc, token) → per-bit contribution via
    shiftright/mask over the token hash (an array expression — one row
    per (doc, token), not per bit) → groupBy(doc) elementwise sum →
    pack sign bits. All integer arithmetic inside codegen."""
    require_columns(docs, [doc_id_column, tokens_column])
    bits = PORTABLE_BITS if portable else BITS
    tf = (
        docs.select(F.col(doc_id_column).alias("doc_id"), F.explode(tokens_column).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = portable_token_hash("token") if portable else F.xxhash64("token")
    # unrolled per-bit contributions: literal shifts keep everything in
    # codegen; one sum aggregate per bit, all partial map-side
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
            .cast("long")
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    summed = tf.groupBy("doc_id").agg(*bit_sums)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        bit_on = F.lit(-(1 << 63)) if b == 63 else F.lit(1 << b)
        packed = packed.bitwiseOR(
            F.when(F.col(f"__b{b}") > 0, bit_on.cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return summed.select("doc_id", packed.alias("simhash"))


def hamming_distance(a, b) -> F.Column:
    return F.bit_count(
        (F.col(a) if isinstance(a, str) else a).bitwiseXOR(F.col(b) if isinstance(b, str) else b)
    )


def simhash_near_dup_pairs(
    signatures: DataFrame, max_hamming: int = 3, bits: int = BITS
) -> DataFrame:
    """→ (doc_id_0, doc_id_1, hamming ≤ max_hamming).

    Block-permutation candidate generation: split the ``bits``-wide
    signature into ``max_hamming+1`` blocks; a pair within distance k
    must agree exactly on ≥1 block (pigeonhole — bits outside the
    covered ``width*(k+1)`` prefix only loosen candidate generation,
    never lose a pair), so the join key is (block_idx, block_value) —
    equi-join, no cross product."""
    nblocks = max_hamming + 1
    width = bits // nblocks
    blocks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("block_idx"),
                    F.shiftright(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("block_val"),
                )
                for i in range(nblocks)
            ]
        )
    )
    keyed = signatures.select("doc_id", "simhash", blocks.alias("blk")).select(
        "doc_id", "simhash", "blk.block_idx", "blk.block_val"
    )
    left = keyed.select(
        "block_idx", "block_val", F.col("doc_id").alias("doc_id_0"), F.col("simhash").alias("sh0")
    )
    right = keyed.select(
        "block_idx", "block_val", F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("sh1")
    )
    return (
        left.join(right, on=["block_idx", "block_val"])
        .filter(F.col("doc_id_0") < F.col("doc_id_1"))
        .select("doc_id_0", "doc_id_1", "sh0", "sh1")
        .dropDuplicates(["doc_id_0", "doc_id_1"])
        .withColumn("hamming", hamming_distance("sh0", "sh1"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_0", "doc_id_1", "hamming")
    )
