"""Positional phrase matching (exact consecutive-token search).

BM25 (:mod:`redshells_spark.text.bm25`) ranks by bag-of-words — it
cannot distinguish "machine learning" from "learning machine". This
module adds the classic positional-index capability: count exact
consecutive-token phrase occurrences per document and rank documents
per phrase. Lucene/Elasticsearch implement this with positional
postings lists; the relational re-expression slides a fixed-width
window over each document's token array (pure codegen: sequence +
slice + concat) and filters on equality with the query phrases —
Catalyst folds the phrase set to a literal IN filter evaluated during
the same projection that generates the window, so the only shuffle is
the final per-(phrase, doc) count, whose cardinality is bounded by the
number of *matches*, not the corpus.

Phrases of different lengths each need their own window width; the
implementation makes one pass per distinct length and unions the
results (phrase sets are human-sized — a handful of lengths).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def phrase_occurrences(
    tokens_df: DataFrame,
    phrases: list[str],
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
) -> DataFrame:
    """→ (phrase, doc_id, n_occurrences) — exact consecutive-token
    occurrence counts; documents with zero occurrences are absent.
    Phrases are matched against the tokens as given (tokenize/lowercase
    upstream with the same pipeline that built ``tokens_column``)."""
    require_columns(tokens_df, [doc_id_column, tokens_column])
    cleaned = [" ".join(p.split()) for p in phrases]
    if not cleaned or any(not p for p in cleaned):
        raise ValueError("phrases must be non-empty strings")
    by_len: dict[int, list[str]] = {}
    for p in cleaned:
        by_len.setdefault(len(p.split()), []).append(p)
    t = F.col(tokens_column)
    parts = []
    for m, group in sorted(by_len.items()):
        win = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("pos") + 1, m))
        parts.append(
            tokens_df.select(
                F.col(doc_id_column).alias("doc_id"),
                F.explode(
                    F.when(F.size(t) >= m, F.sequence(F.lit(0), F.size(t) - m))
                ).alias("pos"),
                t.alias("__toks"),
            )
            .select("doc_id", win.alias("phrase"))
            .filter(F.col("phrase").isin(group))
        )
    matches = reduce(DataFrame.unionByName, parts)
    return matches.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def phrase_topk(
    tokens_df: DataFrame,
    phrases: list[str],
    k: int = 10,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
) -> DataFrame:
    """→ per phrase, the top-``k`` documents by occurrence count
    (phrase, doc_id, n_occurrences, rank) — deterministic tie-break on
    doc_id ascending. The per-phrase window runs on the match counts
    (small), and Spark's WindowGroupLimit pushes the rank<=k cut below
    the sort at scale."""
    occ = phrase_occurrences(tokens_df, phrases, doc_id_column, tokens_column)
    w = Window.partitionBy("phrase").orderBy(
        F.col("n_occurrences").desc(), F.col("doc_id").asc()
    )
    return (
        occ.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("phrase", "doc_id", "n_occurrences", F.col("rank").cast("long").alias("rank"))
    )
