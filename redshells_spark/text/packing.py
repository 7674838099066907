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
    return docs.withColumn(
        "chunk_id", F.floor(tokens_before / F.lit(float(budget))).cast("long")
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
