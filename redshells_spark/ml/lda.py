"""LDA topic model — §2.H ``train_lda``.

Reference wraps gensim LDA with shuffle, dictionary, bow, train/test
split, adaptive passes, ``log_perplexity`` reporting
(``model/lda_model.py:12-59``; task ``train/train_lda_model.py:16-34``).

Spark-first: MLlib ``LDA`` (online variational Bayes — distributed,
single pass per iteration, no corpus shuffle needed) on
CountVectorizer bow vectors; document topics via ``transform`` →
``topicDistribution`` (dense, matching the reference's
``get_document_topics`` dense output at ``lda_model.py:36-44``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.feature import CountVectorizerModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.text.dictionary import fit_count_vectorizer


@dataclass
class LdaResult:
    cv_model: CountVectorizerModel
    lda_model: LDAModel
    log_perplexity: float

    def document_topics(self, docs: DataFrame, tokens_column: str = "tokens") -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        bow = self.cv_model.setInputCol(tokens_column).transform(docs)
        out = self.lda_model.transform(bow)
        return out.withColumn(
            "topic_distribution", vector_to_array("topicDistribution")
        ).drop("bow", "topicDistribution")


def train_lda(
    docs: DataFrame,
    tokens_column: str = "tokens",
    n_topics: int = 10,
    max_iter: int = 20,
    vocab_size: int = 100000,
    min_df: float = 2,
    max_df: float = 0.95,
    test_size: float = 0.1,
    seed: int = 42,
) -> LdaResult:
    """Adaptive passes in the reference (``clip(100000/len, 1, 20)``,
    ``model/lda_model.py:52-59``) become ``maxIter`` on the online
    optimizer; perplexity is reported on a held-out split like the
    reference's train/test protocol."""
    cv_model = fit_count_vectorizer(
        docs, tokens_column, min_df=min_df, max_df=max_df, vocab_size=vocab_size
    )
    bow = cv_model.transform(docs).filter(F.expr("bow is not null"))
    train, test = bow.randomSplit([1.0 - test_size, test_size], seed=seed)
    lda = LDA(
        k=n_topics,
        maxIter=max_iter,
        optimizer="online",
        featuresCol="bow",
        seed=seed,
    )
    model = lda.fit(train)
    perplexity = model.logPerplexity(test if test.count() > 0 else train)
    return LdaResult(cv_model=cv_model, lda_model=model, log_perplexity=float(perplexity))
