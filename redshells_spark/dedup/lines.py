"""Cross-document unit (line/paragraph) deduplication — the CCNet
pre-processing stage (Wenzek et al. 2020, arXiv:1911.00359): hash every
paragraph, drop repeated paragraphs corpus-wide, keep the first
occurrence. Catches boilerplate (headers, footers, licence blocks)
that document-level dedup never sees because the surrounding text
differs.

Beyond-reference LLM-pipeline operator. Units are pluggable:

- :func:`split_units` — split on a separator (``\\n`` for real
  paragraph-structured corpora);
- :func:`block_units` — non-overlapping k-token blocks for
  unstructured text (the synthetic corpus has no newlines).

Scale design: ONE shuffle keyed by the 32-byte unit hash — a
map-combined ``groupBy(hash)`` producing (occurrences, first
occurrence), then an equi-join back. groupBy+join instead of a window
over the hash partition on purpose: a boilerplate unit appearing in
billions of documents becomes one combinable aggregate row, not one
giant window partition (skew-safe). Reconstruction is a per-doc
``array_sort`` over collected (pos, unit) structs — partition-local,
no global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def split_units(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """→ (doc_id, pos, unit): separator-split units with 0-based
    position; empty units dropped (positions keep the original
    ordering)."""
    require_columns(docs, [id_col, text_col])
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "unit"),
        )
        .filter(F.trim("unit") != "")
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "unit")
    )


def block_units(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 8,
    token_sep: str = " ",
) -> DataFrame:
    """→ (doc_id, pos, unit): non-overlapping ``block_tokens``-token
    blocks (pos = block index) — the unit extractor for corpora without
    paragraph structure. The trailing partial block is kept."""
    require_columns(docs, [id_col, text_col])
    if block_tokens < 1:
        raise ValueError("block_units: block_tokens must be >= 1")
    toks = F.filter(F.split(F.col(text_col), token_sep), lambda t: t != "")
    blocks = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(toks) - 1) / block_tokens).cast("int")
        ),
        lambda b: F.concat_ws(
            token_sep, F.slice(toks, b * block_tokens + 1, block_tokens)
        ),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), blocks.alias("__blocks"))
        .filter(F.size("__blocks") > 0)
        .select("doc_id", F.posexplode("__blocks").alias("pos", "unit"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "unit")
    )


def cross_doc_unit_dedup(
    units: DataFrame, min_occurrences: int = 2, joiner: str = " "
) -> DataFrame:
    """→ (doc_id, n_units, n_dropped, text): per document, the unit
    count, how many units were dropped as corpus-wide duplicates, and
    the reconstructed text of surviving units in original order.

    A unit is a duplicate when its hash occurs ≥ ``min_occurrences``
    times corpus-wide; the globally FIRST occurrence (min (doc_id,
    pos)) survives, every other occurrence is dropped — CCNet's
    keep-one-paragraph semantics, deterministic and
    oracle-reproducible (md5 hashing, integer tie-breaks)."""
    require_columns(units, ["doc_id", "pos", "unit"])
    h = units.withColumn("__h", F.md5(F.col("unit")))
    stats = h.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct("doc_id", "pos")).alias("__first"),
    )
    j = h.join(stats, "__h")
    kept_flag = (F.col("__cnt") < min_occurrences) | (
        (F.col("__first.doc_id") == F.col("doc_id"))
        & (F.col("__first.pos") == F.col("pos"))
    )
    flagged = j.withColumn("__keep", kept_flag)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_dropped"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__keep"), F.struct("pos", "unit"))
                )
            ).alias("__kept"),
        )
        .select(
            "doc_id",
            F.col("n_units").cast("long").alias("n_units"),
            "n_dropped",
            F.concat_ws(
                joiner, F.transform(F.col("__kept"), lambda s: s["unit"])
            ).alias("text"),
        )
    )
