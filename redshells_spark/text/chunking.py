"""Document chunking and within-document dedup for LLM training data.

Beyond-reference LLM-pipeline operators (no counterpart in the
reference repo): long documents must be split into model-context-sized
overlapping windows before packing, and C4-style cleaning removes
repeated lines/tokens inside a document before corpus-level dedup.

Both are pure DataFrame algebra — explode / window / re-aggregate —
with no Python in the hot path, so they scale as ordinary shuffles
keyed by doc_id (near-perfectly parallel; one document's tokens land
in one task via the aggregation key, and documents are bounded in
size so there is no skew risk beyond the corpus's own max-doc-length).

Tokenization is a plain single-separator split (identical semantics
in the SQL oracle): consecutive separators produce empty units, which
are kept deterministically. Run text through
``text/analysis.py:clean_text`` (whitespace normalization) first —
that is the pipeline order the corpus composites use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows.

    Chunks start at token offsets 0, stride, 2·stride, … < n_tokens;
    each covers up to ``chunk_tokens`` tokens (the final chunk may be
    shorter). ``stride < chunk_tokens`` gives overlapping context
    windows; ``stride == chunk_tokens`` tiles exactly.

    → (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).

    No shuffle at all: sequence+explode is a per-row generator, so
    chunking 100 TB is a single map stage that Catalyst pipelines into
    whatever consumes the chunks.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_documents: chunk_tokens and stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(stride)
    )
    out = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long"),
            F.col("chunk_start").cast("long"),
            F.slice(F.col("__toks"), F.col("chunk_start") + 1, F.lit(chunk_tokens)).alias(
                "__chunk"
            ),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def dedup_within_doc(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit_sep: str = " ",
) -> DataFrame:
    """Remove repeated units (tokens / lines) *within* each document,
    keeping the first occurrence in document order.

    ``unit_sep=" "`` dedups repeated tokens; ``unit_sep="\\n"`` is the
    C4-style repeated-line filter. → (doc_id, text, n_units,
    n_removed) with ``text`` rebuilt from the surviving units in their
    original order.

    NO shuffle at all: ``array_distinct`` keeps the FIRST occurrence
    of each unit in array order — exactly the keep-first-by-position
    window the earlier explode/window/reassemble formulation computed
    with two fact-scale shuffles — so within-doc dedup of 100 TB is a
    single map stage that pipelines into its consumer.
    """
    units = F.split(F.col(text_col), unit_sep)
    return docs.select(
        F.col(id_col),
        F.col(text_col),
    ).select(
        id_col,
        F.size(units).alias("__n"),
        F.array_distinct(units).alias("__kept"),
    ).select(
        id_col,
        F.array_join("__kept", unit_sep).alias(text_col),
        F.col("__n").cast("long").alias("n_units"),
        (F.col("__n") - F.size("__kept")).cast("long").alias("n_removed"),
    )
