"""Reciprocal-Rank Fusion (RRF) — hybrid search's standard rank
combiner (Cormack, Clarke & Buettcher 2009: "Reciprocal rank fusion
outperforms Condorcet and individual rank learning methods").

Two (or more) rankers retrieve per-query candidate lists; RRF fuses
them by summing ``1 / (K + rank)`` across lists (K = 60 in the paper
and everywhere since — Elasticsearch, OpenSearch, Vespa all default to
it). Scores never mix — only RANKS — which is exactly why RRF is the
production default for BM25 + vector hybrid search: no score
calibration across heterogeneous retrievers.

Here the fused pair is per-term BM25 (length-normalized) and raw
term-frequency (unnormalized) — two genuinely different orderings of
the same corpus; swap either side for an ANN ranking at no change to
the fusion. Everything is rank arithmetic on identical integers, so
the fused scores are bit-identical cross-engine with NO rounding.

Scale: each ranker is a per-term window capped to ``depth`` (top-N
per partition pruned map-side by WindowGroupLimit), the fusion a
full-outer join on (term, doc) of two depth-bounded lists — shuffle
volume O(#terms · depth), independent of corpus size after the
ranker windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

RRF_K = 60  # Cormack et al. 2009 constant; industry default


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    query_column: str = "term",
    id_column: str = "doc_id",
    rank_column: str = "rank",
) -> DataFrame:
    """Fuse two (query, doc, rank) lists → (query, doc_id, rrf_score,
    rank): top-``k`` per query by RRF score, doc-id tie-break. A doc
    missing from one list contributes only the other list's term."""
    require_columns(ranked_a, [query_column, id_column, rank_column])
    require_columns(ranked_b, [query_column, id_column, rank_column])
    a = ranked_a.select(
        query_column, id_column, F.col(rank_column).alias("__ra")
    )
    b = ranked_b.select(
        query_column, id_column, F.col(rank_column).alias("__rb")
    )
    fused = a.join(b, [query_column, id_column], "full_outer").select(
        query_column,
        id_column,
        (
            F.when(
                F.col("__ra").isNotNull(),
                F.lit(1.0) / (F.lit(RRF_K) + F.col("__ra")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("__rb").isNotNull(),
                F.lit(1.0) / (F.lit(RRF_K) + F.col("__rb")),
            ).otherwise(F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.partitionBy(query_column).orderBy(
        F.col("rrf_score").desc(), F.col(id_column).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_column,
            id_column,
            "rrf_score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hybrid_bm25_tf_search(
    docs_tokens: DataFrame,
    terms: tuple[str, ...],
    k: int = 10,
    depth: int = 30,
    k1: float = 1.2,
    b: float = 0.75,
    id_column: str = "doc_id",
    tokens_column: str = "tokens",
) -> DataFrame:
    """Per-term hybrid retrieval: BM25 ranking ⊕ raw-tf ranking, RRF
    fused → (term, doc_id, rrf_score, rank). Each ranker keeps its
    top-``depth``; ranks break ties on doc id so both lists are total
    orders."""
    require_columns(docs_tokens, [id_column, tokens_column])
    tok = docs_tokens.select(
        F.col(id_column).alias("doc_id"),
        F.size(tokens_column).cast("long").alias("dl"),
        F.explode(tokens_column).alias("term"),
    )
    stats = tok.groupBy().agg(
        F.count_distinct("doc_id").alias("n_docs"), F.count("*").alias("tok_sum")
    )
    # dl sums tokens per doc, so avgdl = tok_sum / n_docs
    p = (
        tok.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = p.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        p.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b)
                        * F.col("dl")
                        / (F.col("tok_sum") / F.col("n_docs"))
                    )
                )
            ).alias("bm25"),
        )
    )
    wa = Window.partitionBy("term").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    wb = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    ranked_a = (
        scored.withColumn("rank", F.row_number().over(wa))
        .filter(F.col("rank") <= depth)
        .select("term", "doc_id", "rank")
    )
    ranked_b = (
        scored.withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= depth)
        .select("term", "doc_id", "rank")
    )
    return rrf_fuse(ranked_a, ranked_b, k=k)
