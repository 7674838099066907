"""Benchmark decontamination + duplicated-span measurement.

Standard training-corpus hygiene ops (GPT-3 appendix C / Dolma-style
n-gram decontamination; Lee et al. 2021 "Deduplicating Training Data
Makes Language Models Better" for duplicated-span analysis), expressed
relationally on top of the same token-id shingles the MinHash pipeline
uses (:func:`redshells_spark.dedup.minhash.doc_shingles`) so the whole
dedup tier shares one fingerprint space and one explode.

Scale shape:
- the benchmark side (eval sets) is tiny by construction → its distinct
  shingle set is broadcast; contamination check is a broadcast
  LEFT SEMI join against the corpus shingles — no shuffle of the
  corpus, no driver collect.
- duplicated-span fractions are one groupBy(shingle) + one join +
  one groupBy(doc) — all with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def contaminated_doc_ids(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    min_overlap: int = 1,
) -> DataFrame:
    """→ distinct (doc_id) of corpus docs sharing ≥ ``min_overlap``
    distinct shingles with the benchmark set.

    Both inputs are (doc_id, shingle) frames (distinct per doc) from
    :func:`doc_shingles`. The benchmark's distinct shingle values are
    broadcast — eval benchmarks are thousands of documents, not
    billions, so this side is always the small one."""
    require_columns(corpus_shingles, ["doc_id", "shingle"])
    bench = F.broadcast(benchmark_shingles.select("shingle").distinct())
    hits = corpus_shingles.join(bench, on="shingle", how="inner")
    if min_overlap <= 1:
        return hits.select("doc_id").distinct()
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__overlap"))
        .filter(F.col("__overlap") >= min_overlap)
        .select("doc_id")
    )


def decontaminate(
    corpus_docs: DataFrame,
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    doc_id_column: str = "doc_id",
    min_overlap: int = 1,
) -> DataFrame:
    """Drop corpus docs that leak benchmark n-grams → surviving docs
    (all columns of ``corpus_docs``). Anti-join against the
    contaminated id set (itself small: contamination is rare, and the
    id set is one column) — the corpus is filtered in place, never
    re-shuffled."""
    bad = contaminated_doc_ids(corpus_shingles, benchmark_shingles, min_overlap)
    return corpus_docs.join(
        F.broadcast(bad.withColumnRenamed("doc_id", doc_id_column)),
        on=doc_id_column,
        how="left_anti",
    )


def duplicate_span_fraction(shingles: DataFrame) -> DataFrame:
    """→ (doc_id, dup_fraction): per document, the fraction of its
    distinct shingles that also occur in at least one other document —
    the corpus-level duplicated-text signal used to decide between
    doc-level near-dedup and span-level rewriting (Lee et al. 2021).

    shingle → doc-frequency (one groupBy, partial count) → join back →
    per-doc mean. The join key is the shingle, whose frequency table is
    exactly as skewed as the corpus's boilerplate — at 100 TB the hot
    shingles are the interesting ones, and AQE skew-join splits them."""
    require_columns(shingles, ["doc_id", "shingle"])
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        shingles.join(freq, on="shingle")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg((F.col("__n_docs") > 1).cast("double")), 4).alias(
                "dup_fraction"
            )
        )
    )
