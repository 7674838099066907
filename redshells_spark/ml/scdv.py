"""SCDV document embeddings — §2.H ``train_scdv`` (arXiv 1612.06778).

Reference ``model/scdv.py:15-138``: normalize word vectors → GMM
soft-clustering (k=60) → word-topic vectors = word_vec ⊗ cluster_probs
× idf → flatten to (V, k·d) → doc vector = Σ count·wtv → sparsify at
``p%·avg(|min|+|max|)/2`` → L2-normalize.

Spark-first decomposition:
- Word2Vec + GaussianMixture fit on the vocabulary (V rows — small;
  MLlib handles it distributed anyway).
- The word-topic table is a DataFrame ``(word, wtv: array<double>)``
  of width k·d — computed with one pandas_udf batch matmul per
  partition (outer product ⊗ is numpy's job, not a Catalyst lambda).
- Doc inference is pure DataFrame algebra: explode tokens → broadcast
  join wtv → groupBy(doc) elementwise sum — shuffles (doc, k·d)
  vectors once, with map-side partial aggregation.
- The sparsify threshold is estimated from a bounded sample of doc
  vectors (reference samples 10k docs, ``train/train_scdv.py:21-22``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import l2_normalize
from redshells_spark.ml.mllib_compat import strip_training_summary


@dataclass
class SCDV:
    word_topic_vectors: DataFrame  # (word, wtv: array<double>)
    cluster_size: int
    embedding_size: int
    sparsity_threshold: float

    @classmethod
    def fit(
        cls,
        docs: DataFrame,
        tokens_column: str = "tokens",
        doc_id_column: str = "doc_id",
        cluster_size: int = 60,
        embedding_size: int = 50,
        sparsity_percentage: float = 0.04,
        word2vec_kwargs: dict | None = None,
        gmm_sample_size: int = 100000,
        threshold_sample_size: int = 10000,
        seed: int = 42,
    ) -> "SCDV":
        from pyspark.ml.clustering import GaussianMixture
        from pyspark.ml.functions import array_to_vector, vector_to_array

        from redshells_spark.ml.word2vec import train_word2vec, word_vectors
        from redshells_spark.text.tfidf import tfidf_scores

        spark = docs.sparkSession
        w2v_kwargs = dict(vector_size=embedding_size, min_count=2, seed=seed)
        w2v_kwargs.update(word2vec_kwargs or {})
        w2v = train_word2vec(docs, tokens_column, **w2v_kwargs)
        wv = word_vectors(w2v)  # (word, vector)
        wv = wv.withColumn("vector", l2_normalize("vector"))

        # GMM soft clustering over the (small) vocabulary
        gmm = GaussianMixture(
            k=cluster_size, seed=seed, featuresCol="__v", probabilityCol="__p"
        )
        wv_vec = wv.withColumn("__v", array_to_vector("vector"))
        # deterministic sample: limit() without ordering is partition-
        # order dependent — hash-order the vocabulary first so the
        # fitted clusters (hence all doc embeddings) are stable across
        # runs and cluster layouts; a no-op cost when V < sample size
        gmm_fit_input = (
            wv_vec.orderBy(F.xxhash64(F.col("word"), F.lit(seed))).limit(gmm_sample_size)
        )
        gmm_model = strip_training_summary(gmm.fit(gmm_fit_input))
        clustered = (
            gmm_model.transform(wv_vec)
            .withColumn("probs", vector_to_array("__p"))
            .select("word", "vector", "probs")
        )

        # idf per word from the corpus (gensim-style log2(N/df))
        n_docs = docs.count()
        df_tbl = (
            docs.select(F.explode(F.array_distinct(tokens_column)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
        )
        with_idf = clustered.join(df_tbl, on="word", how="inner").withColumn(
            "idf", F.log2(F.lit(float(n_docs)) / F.col("doc_freq"))
        )

        # word-topic vector: flatten(outer(probs, vector)) * idf — one
        # numpy outer product per word inside an Arrow batch
        def make_wtv(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                vecs = np.array(list(pdf["vector"]), dtype=np.float64)
                probs = np.array(list(pdf["probs"]), dtype=np.float64)
                idf = pdf["idf"].to_numpy()[:, None]
                wtv = (probs[:, :, None] * vecs[:, None, :]).reshape(len(pdf), -1) * idf
                yield pd.DataFrame({"word": pdf["word"], "wtv": list(wtv)})

        wtv = with_idf.select("word", "vector", "probs", "idf").mapInPandas(
            make_wtv, schema="word string, wtv array<double>"
        )
        wtv = wtv.cache()

        model = cls(
            word_topic_vectors=wtv,
            cluster_size=cluster_size,
            embedding_size=embedding_size,
            sparsity_threshold=0.0,
        )
        # threshold from a sampled batch of raw doc vectors:
        # p% · avg(|min| + |max|)/2 (reference model/scdv.py:100-121)
        # deterministic sample (same rationale as the GMM sample above):
        # hash-order doc ids before limit so the fitted threshold is
        # stable across runs and partition layouts
        sample_docs = (
            docs.orderBy(F.xxhash64(F.col(doc_id_column), F.lit(seed)))
            .limit(threshold_sample_size)
        )
        sample = model._raw_doc_vectors(sample_docs, tokens_column, doc_id_column)
        mm = sample.select(
            F.aggregate("embedding", F.lit(float("inf")), lambda a, x: F.least(a, x)).alias("mn"),
            F.aggregate("embedding", F.lit(float("-inf")), lambda a, x: F.greatest(a, x)).alias("mx"),
        ).agg(F.avg(F.abs(F.col("mn"))).alias("amin"), F.avg(F.abs(F.col("mx"))).alias("amax"))
        row = mm.head()
        threshold = sparsity_percentage * float((row["amin"] + row["amax"]) / 2.0)
        model.sparsity_threshold = threshold
        return model

    def _raw_doc_vectors(
        self, docs: DataFrame, tokens_column: str, doc_id_column: str
    ) -> DataFrame:
        from pyspark.ml.functions import array_to_vector, vector_to_array
        from pyspark.ml.stat import Summarizer

        # bow counts first: the sum then runs over distinct in-vocab
        # words per doc (vocab-bounded), not every token occurrence
        tf = (
            docs.select(
                F.col(doc_id_column).alias("doc_id"), F.explode(tokens_column).alias("word")
            )
            .groupBy("doc_id", "word")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        joined = tf.join(F.broadcast(self.word_topic_vectors), on="word", how="inner")
        scaled = joined.withColumn(
            "wtv", F.transform("wtv", lambda x: x * F.col("tf"))
        )
        # Summarizer.sum is a typed JVM aggregate with map-side partial
        # combine: per-group state is ONE k·d vector, not a
        # collect_list of every word's k·d array (which made per-group
        # memory ∝ distinct words × k·d before the fold even ran)
        return (
            scaled.withColumn("__wv", array_to_vector("wtv"))
            .groupBy("doc_id")
            .agg(Summarizer.sum(F.col("__wv")).alias("__sum"))
            .select("doc_id", vector_to_array("__sum").alias("embedding"))
        )

    def save(self, path: str) -> None:
        """Word-topic table as parquet + scalar params as JSON — the
        model-target role for a model whose state is a DataFrame."""
        import json

        self.word_topic_vectors.write.mode("overwrite").parquet(f"{path}/wtv")
        spark = self.word_topic_vectors.sparkSession
        meta = json.dumps(
            {
                "cluster_size": self.cluster_size,
                "embedding_size": self.embedding_size,
                "sparsity_threshold": self.sparsity_threshold,
            }
        )
        spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
            "overwrite"
        ).json(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "SCDV":
        import json

        meta = json.loads(spark.read.json(f"{path}/meta").head()["meta"])
        return cls(
            word_topic_vectors=spark.read.parquet(f"{path}/wtv"),
            cluster_size=int(meta["cluster_size"]),
            embedding_size=int(meta["embedding_size"]),
            sparsity_threshold=float(meta["sparsity_threshold"]),
        )

    def infer_vector(
        self,
        docs: DataFrame,
        tokens_column: str = "tokens",
        doc_id_column: str = "doc_id",
        l2_normalize_vectors: bool = True,
    ) -> DataFrame:
        """→ (doc_id, embedding) sparsified SCDV vectors (reference
        ``infer_vector``, ``model/scdv.py:59-63``)."""
        raw = self._raw_doc_vectors(docs, tokens_column, doc_id_column)
        t = self.sparsity_threshold
        sparsified = raw.withColumn(
            "embedding",
            F.transform("embedding", lambda x: F.when(F.abs(x) < t, 0.0).otherwise(x)),
        )
        if l2_normalize_vectors:
            sparsified = sparsified.withColumn("embedding", l2_normalize("embedding"))
        return sparsified

    def embed_words(self, words: DataFrame, word_column: str = "word") -> DataFrame:
        """Embed single words as 1-token docs (reference
        ``app/word_item_similarity/calculate_word_embedding.py:38-59``)."""
        docs = words.select(
            F.col(word_column).alias("doc_id"), F.array(word_column).alias("tokens")
        )
        return self.infer_vector(docs).withColumnRenamed("doc_id", word_column)
