"""Dictionary (vocabulary) training — §2.H ``train_dictionary``.

Reference: gensim ``Dictionary(texts)`` +
``filter_extremes(no_below=5, no_above=0.5, keep_n=100000)``
(``train/train_dictionary.py:12-33``).

Spark-first: the dictionary is a *DataFrame* ``(token, doc_freq,
token_id)`` computed relationally — explode → per-doc distinct →
doc-frequency count → bounds filter → top-keep_n → dense ids. Fully
SQL-expressible (DuckDB oracle) and shuffle-minimal: one groupBy on
token with partial aggregation; ids assigned by (doc_freq desc, token
asc) ranking which is deterministic, unlike gensim's insertion order.

For MLlib interop (``CountVectorizerModel``-style vectors) use
:func:`fit_count_vectorizer`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def train_dictionary(
    docs: DataFrame,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
    no_below: int = 5,
    no_above: float = 0.5,
    keep_n: int | None = 100000,
) -> DataFrame:
    """→ DataFrame(token, doc_freq, token_id) with gensim
    ``filter_extremes`` bounds: doc_freq ≥ no_below and doc_freq ≤
    no_above·n_docs; then most-frequent keep_n (ties → token asc)."""
    require_columns(docs, [doc_id_column, tokens_column])
    n_docs = docs.count()
    doc_tokens = docs.select(
        F.col(doc_id_column).alias("doc_id"),
        F.explode(F.array_distinct(tokens_column)).alias("token"),
    )
    freq = doc_tokens.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    freq = freq.filter(
        (F.col("doc_freq") >= no_below)
        & (F.col("doc_freq") <= F.lit(float(no_above)) * n_docs)
    )
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("token").asc())
    ranked = freq.withColumn("token_id", F.row_number().over(w) - 1)
    if keep_n is not None:
        ranked = ranked.filter(F.col("token_id") < keep_n)
    return ranked.select("token", "doc_freq", "token_id")


def fit_count_vectorizer(
    docs: DataFrame,
    tokens_column: str = "tokens",
    min_df: float = 5,
    max_df: float = 0.5,
    vocab_size: int = 100000,
):
    """MLlib CountVectorizer counterpart (sparse bow vectors for
    LDA/classifiers). Returns the fitted model; ``.vocabulary`` is the
    id→token list.

    NB MLlib semantics: min_df/max_df < 1.0 are corpus fractions,
    ≥ 1.0 are absolute document counts — ``max_df=1.0`` means "at most
    ONE document", which silently empties the vocabulary."""
    from pyspark.ml.feature import CountVectorizer

    cv = CountVectorizer(
        inputCol=tokens_column,
        outputCol="bow",
        minDF=min_df,
        maxDF=max_df,
        vocabSize=vocab_size,
    )
    return cv.fit(docs)
