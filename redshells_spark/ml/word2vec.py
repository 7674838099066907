"""Word embeddings — §2.H ``train_word2vec`` / ``train_fasttext`` /
``train_doc2vec``.

Reference: gensim ``Word2Vec(sentences)`` with pre-shuffle
(``train/train_word2vec.py:11-28``). Spark-first: MLlib Word2Vec —
distributed skip-gram, no corpus shuffle needed (hogwild-style
partition training makes input order irrelevant; seed fixed for
reproducibility).

FastText (``train/train_fasttext.py:14-38``) subword OOV composition
lives in :mod:`redshells_spark.ml.fasttext` (char-n-gram bucket
vectors induced on top of this Word2Vec). Doc2Vec
(``train/train_doc2vec.py:11-30``) is available as a from-scratch
PV-DBOW in :mod:`redshells_spark.ml.doc2vec`; SCDV
(:mod:`redshells_spark.ml.scdv`) and ``doc_vectors_mean`` here remain
the recommended distributed document embeddings at scale.
"""

from __future__ import annotations

from pyspark.ml.feature import Word2Vec, Word2VecModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import l2_normalize


def train_word2vec(
    docs: DataFrame,
    tokens_column: str = "tokens",
    vector_size: int = 100,
    min_count: int = 5,
    window_size: int = 5,
    max_iter: int = 1,
    num_partitions: int = 1,
    seed: int = 42,
) -> Word2VecModel:
    w2v = Word2Vec(
        inputCol=tokens_column,
        outputCol="__w2v",
        vectorSize=vector_size,
        minCount=min_count,
        windowSize=window_size,
        maxIter=max_iter,
        numPartitions=num_partitions,
        seed=seed,
    )
    return w2v.fit(docs)


def word_vectors(model: Word2VecModel) -> DataFrame:
    """→ (word, vector: array<float>) DataFrame from the fitted model."""
    from pyspark.ml.functions import vector_to_array

    return model.getVectors().select(
        "word", vector_to_array("vector").alias("vector")
    )


def doc_vectors_mean(
    docs: DataFrame,
    model: Word2VecModel,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
    normalize: bool = True,
) -> DataFrame:
    """Doc2Vec substitute: document vector = mean of token vectors
    (MLlib Word2Vec.transform semantics), optionally L2-normalized."""
    from pyspark.ml.functions import vector_to_array

    out = model.setInputCol(tokens_column).transform(docs).select(
        doc_id_column, vector_to_array("__w2v").alias("embedding")
    )
    if normalize:
        out = out.withColumn("embedding", l2_normalize("embedding"))
    return out
