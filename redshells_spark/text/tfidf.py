"""TF-IDF — §2.H ``train_tfidf`` / ``tfidf_apply``.

Reference: gensim ``TfidfModel`` fit on bow, apply → per-doc
``[(token, score)]`` sorted desc with the top ``ceil(len·rate)+1``
kept; empty docs → ``[]`` (``model/tfidf.py:11-24``).

Spark-first: TF-IDF is a *relational* computation — no vectors, no
UDFs, three shuffles total (term count, doc frequency, top-k window),
each with map-side partial aggregation:

    explode(tokens) → count per (doc, token)            # TF
    distinct (doc, token) → count per token             # DF
    tf·idf, idf = log2(n_docs / df)  [gensim default]
    window top-k per doc with (score desc, token asc) tie-break

Fully SQL-expressible for the DuckDB oracle. The gensim default
normalization ('nnc': raw tf, idf=log2(N/df), cosine-normalized doc
vector) is configurable; ``normalize=False`` matches unnormalized
scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.operators.topk import per_group_topk
from redshells_spark.schema import require_columns


def tfidf_scores(
    docs: DataFrame,
    dictionary: DataFrame | None = None,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
    normalize: bool = True,
    n_docs: int | None = None,
) -> DataFrame:
    """→ DataFrame(doc_id, token, tfidf). ``dictionary`` (from
    :func:`redshells_spark.text.dictionary.train_dictionary`) restricts
    and supplies doc_freq; otherwise df is computed from the corpus.

    ``normalize`` applies gensim's cosine doc-normalization
    (tfidf / ||doc tfidf vector||₂) via a per-doc window — no second
    aggregation pass."""
    require_columns(docs, [doc_id_column, tokens_column])
    if n_docs is None:
        n_docs = docs.count()

    term = docs.select(
        F.col(doc_id_column).alias("doc_id"), F.explode(tokens_column).alias("token")
    )
    tf = term.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))

    if dictionary is not None:
        df_tbl = dictionary.select("token", "doc_freq")
        tf = tf.join(F.broadcast(df_tbl), on="token", how="inner")
    else:
        df_tbl = (
            tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
        )
        tf = tf.join(df_tbl, on="token", how="inner")

    idf = F.log2(F.lit(float(n_docs)) / F.col("doc_freq"))
    scored = tf.withColumn("tfidf", F.col("tf") * idf).filter(F.col("tfidf") != 0.0)
    if normalize:
        w = Window.partitionBy("doc_id")
        norm = F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf")).over(w))
        scored = scored.withColumn("tfidf", F.col("tfidf") / norm)
    return scored.select("doc_id", "token", "tfidf")


def tfidf_top_tokens(
    scores: DataFrame,
    keep_top_rate: float,
    doc_id_column: str = "doc_id",
) -> DataFrame:
    """Per doc keep top ``ceil(n_tokens·rate)+1`` by (tfidf desc, token
    asc) — the reference's keep rule (``model/tfidf.py:20-24``), with a
    deterministic tie-break the reference lacks. One window shuffle;
    Spark ≥3.5 prunes with WindowGroupLimit before the exchange."""
    w = Window.partitionBy(doc_id_column)
    with_n = scores.withColumn(
        "__k", F.ceil(F.count(F.lit(1)).over(w) * F.lit(float(keep_top_rate))) + 1
    )
    return per_group_topk(
        with_n,
        doc_id_column,
        "tfidf",
        F.col("__k"),
        tie_break=["token"],
    ).drop("__k")
