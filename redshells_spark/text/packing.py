"""Sequence packing: assign documents to fixed-token-budget chunks.

Training pipelines concatenate documents into context-length sequences
("packing"). The distributed version packs *within shards* (here: a
partition column like ``source`` — at 100 TB you never want one global
sequential scan): within each shard, documents are laid out in a
deterministic order and a running token total assigns each doc to chunk
``floor(tokens_before / budget)`` — the streaming first-fit used by
t5/llm-foundry-style packers, expressed as ONE window cumulative sum
(no UDF, no iteration).

A chunk may overflow the budget by at most one document's tokens (the
doc that straddles the boundary) — identical to streaming packers that
split/pad at the sequence writer. The chunk assignment itself stays
pure relational so a SQL oracle verifies it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def pack_sequences(
    docs: DataFrame,
    budget: int,
    partition_column: str,
    doc_id_column: str = "doc_id",
    token_count_column: str = "n_tokens",
) -> DataFrame:
    """→ input columns + ``chunk_id``: sequential token-budget packing
    per ``partition_column`` shard, documents ordered by
    ``doc_id_column``.

    chunk_id = floor((Σ tokens of preceding docs in shard) / budget).
    One window shuffle keyed on the shard column; each shard's packing
    is independent, so shard count = parallelism and no global order is
    ever imposed."""
    require_columns(docs, [partition_column, doc_id_column, token_count_column])
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(partition_column)
        .orderBy(doc_id_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tokens_before = F.sum(token_count_column).over(w) - F.col(token_count_column)
    # exact int64 division (floor(x / float(budget)) drifts once a
    # shard's running token count passes 2^53 — real at 100 TB)
    return (
        docs.withColumn("__before", tokens_before.cast("long"))
        .withColumn("chunk_id", F.expr(f"__before div {int(budget)}").cast("long"))
        .drop("__before")
    )


def chunk_stats(
    packed: DataFrame,
    partition_column: str,
    token_count_column: str = "n_tokens",
) -> DataFrame:
    """→ (shard, chunk_id, n_docs, total_tokens): packing efficiency
    summary (fill rate = total_tokens / budget per chunk). Plain
    aggregation over the packed frame."""
    require_columns(packed, [partition_column, "chunk_id", token_count_column])
    return packed.groupBy(partition_column, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_column).cast("long").alias("total_tokens"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int,
    bucket_bounds: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024),
) -> DataFrame:
    """Length-bucketed batching for training/inference: assign each
    sequence to the smallest bucket bound >= its length, order within
    the bucket by length descending (id ascending ties), and cut
    batches of ``batch_size`` — the dynamic-batching layout that
    minimizes padding waste while keeping tensor shapes per-bucket
    static (the XLA/TPU-friendly convention).

    Returns one row per (bucket, batch_id) with exact int64 padding
    accounting::

        n_seqs        sequences in the batch
        max_len       longest sequence in the batch
        sum_tokens    real tokens
        pad_to_bucket n_seqs * bucket - sum_tokens  (static shapes)
        pad_to_max    n_seqs * max_len - sum_tokens (dynamic shapes)

    Sequences longer than the last bound land in bucket 0 = REFUSED
    (callers chunk them first; silent truncation would corrupt the
    padding stats). The bucket ladder is a fixed CASE expression —
    identical integer arithmetic in any engine, no log2/floats.

    Scale: the within-bucket ranking is a per-bucket total order —
    fine for the bounded ladder because each bucket's window sorts in
    parallel by range partitioning on the (bucket, length) prefix. At
    extreme skew (one bucket >> memory), production packers switch to
    per-partition local batching after a repartition on (bucket,
    hash) — statistically identical padding, no global order; this
    exact form is kept because the oracle contract pins tie
    semantics."""
    require_columns(df, [id_col, len_col])
    bucket = F.lit(0).cast("long")
    for b in sorted(bucket_bounds, reverse=True):
        bucket = F.when(F.col(len_col) <= b, F.lit(b).cast("long")).otherwise(
            bucket
        )
    bucket = F.when(F.col(len_col) > sorted(bucket_bounds)[-1], F.lit(0)).otherwise(
        bucket
    )
    ranked = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
        bucket.alias("bucket"),
    ).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(
                F.col("__len").desc(), F.col("__id").asc()
            )
        ),
    )
    batched = ranked.withColumn(
        "batch_id", F.expr(f"(__rk - 1) div {int(batch_size)}").cast("long")
    )
    return batched.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.max("__len").cast("long").alias("max_len"),
        F.sum("__len").cast("long").alias("sum_tokens"),
    ).select(
        "bucket",
        "batch_id",
        "n_seqs",
        "max_len",
        "sum_tokens",
        (F.col("n_seqs") * F.col("bucket") - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_to_bucket"),
        (F.col("n_seqs") * F.col("max_len") - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_to_max"),
    )


def packed_attention_boundaries(
    packed: DataFrame,
    partition_column: str,
    doc_id_column: str = "doc_id",
    token_count_column: str = "n_tokens",
) -> DataFrame:
    """→ (shard, chunk_id, doc, start_tok, end_tok, n_tokens): each
    document's token span INSIDE its packed chunk — the block-diagonal
    attention-mask map a trainer needs so packed documents don't
    attend across their boundaries (the packing counterpart of the SFT
    loss-mask spans). Spans are chunk-local, inclusive, and exact:
    one within-chunk window cumulative sum over the same doc-id order
    :func:`pack_sequences` packed with."""
    require_columns(
        packed, [partition_column, "chunk_id", doc_id_column, token_count_column]
    )
    w = (
        Window.partitionBy(partition_column, "chunk_id")
        .orderBy(doc_id_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_column).over(w).cast("long")
    return packed.select(
        partition_column,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        doc_id_column,
        (cum - F.col(token_count_column)).cast("long").alias("start_tok"),
        (cum - F.lit(1)).cast("long").alias("end_tok"),
        F.col(token_count_column).cast("long").alias("n_tokens"),
    )
