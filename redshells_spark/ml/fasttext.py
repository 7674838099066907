"""FastText-style subword vectors — §2.H ``train_fasttext``.

Reference ``train/train_fasttext.py:14-38`` trains gensim FastText
(char n-grams min_n=3..max_n=6, 2M hashed buckets per
``app/word_item_similarity/build_word_item_similarity.py:46-68``); its
value over Word2Vec is that OUT-OF-VOCABULARY words still get vectors
composed from their character n-grams — the common case for query
words in word-item retrieval.

gensim is not available here, so the subword layer is induced
post-hoc on top of MLlib Word2Vec (Bojanowski et al. 2017 semantics,
standard "subword vectors from pretrained words" construction):

1. fit Word2Vec on the corpus (distributed skip-gram);
2. explode every vocabulary word into its boundary-marked char
   n-grams, hash each n-gram into ``bucket`` slots (FNV-style via
   xxhash64 — deterministic, engine-portable);
3. bucket vector = mean of the vectors of all words containing that
   n-gram (``Summarizer.mean`` — JVM partial aggregation);
4. OOV inference: word → n-grams → bucket lookup → L2-normalized sum.

Everything is DataFrame algebra; n-gram generation is a Catalyst
``transform`` over ``sequence`` (codegen, no Python). In-vocab words
return their trained Word2Vec vector, mirroring FastText's behavior
of using the full-word vector when known.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import l2_normalize


def char_ngrams_column(
    word: str | Column, min_n: int = 3, max_n: int = 6
) -> Column:
    """→ array<string> of boundary-marked char n-grams of ``word``
    (``"<word>"`` markers, lengths min_n..max_n) — one flattened
    codegen expression, no UDF."""
    marked = F.concat(F.lit("<"), word if isinstance(word, Column) else F.col(word), F.lit(">"))

    # NB: the lambda must be unary — F.transform treats a 2-arg
    # function as (element, index)
    def _slice(n: int):
        return lambda i: F.substring(marked, i, F.lit(n))

    per_n = [
        F.when(
            F.length(marked) >= n,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(marked) - n + 1, F.lit(1))),
                _slice(n),
            ),
        ).otherwise(F.array().cast("array<string>"))
        for n in range(min_n, max_n + 1)
    ]
    return F.array_distinct(F.flatten(F.array(*per_n)))


def ngram_bucket(ngram: str | Column, bucket: int = 2_000_000, seed: int = 42) -> Column:
    """Hash an n-gram string into one of ``bucket`` slots (reference
    bucket=2,000,000, ``build_word_item_similarity.py:46-68``)."""
    col = ngram if isinstance(ngram, Column) else F.col(ngram)
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(bucket)).alias("bucket")


@dataclass
class FastTextVectors:
    """Fitted subword model: in-vocab word vectors + n-gram bucket
    vectors. ``infer_vectors`` handles any mix of known and OOV words."""

    word_vectors: DataFrame  # (word, vector: array<double>)
    bucket_vectors: DataFrame  # (bucket: long, vector: array<double>)
    min_n: int
    max_n: int
    bucket: int
    seed: int

    @classmethod
    def fit(
        cls,
        docs: DataFrame,
        tokens_column: str = "tokens",
        vector_size: int = 100,
        min_count: int = 5,
        min_n: int = 3,
        max_n: int = 6,
        bucket: int = 2_000_000,
        seed: int = 42,
        word2vec_kwargs: dict | None = None,
    ) -> "FastTextVectors":
        from pyspark.ml.functions import array_to_vector, vector_to_array
        from pyspark.ml.stat import Summarizer

        from redshells_spark.ml.word2vec import train_word2vec, word_vectors

        kwargs = dict(
            vector_size=vector_size, min_count=min_count, seed=seed,
        )
        kwargs.update(word2vec_kwargs or {})
        wv = word_vectors(train_word2vec(docs, tokens_column, **kwargs))
        wv = wv.withColumn("vector", F.col("vector").cast("array<double>"))

        grams = wv.select(
            "vector",
            F.explode(char_ngrams_column("word", min_n, max_n)).alias("ngram"),
        ).select(ngram_bucket("ngram", bucket, seed), "vector")
        bucket_vecs = (
            grams.withColumn("__v", array_to_vector("vector"))
            .groupBy("bucket")
            .agg(Summarizer.mean(F.col("__v")).alias("__m"))
            .select("bucket", vector_to_array("__m").alias("vector"))
        )
        return cls(
            word_vectors=wv,
            bucket_vectors=bucket_vecs,
            min_n=min_n,
            max_n=max_n,
            bucket=bucket,
            seed=seed,
        )

    def save(self, path: str) -> None:
        """Word + bucket vector tables as parquet (distributed-sized),
        hyperparameters as a JSON sidecar — the model-target role for
        a model whose state is DataFrames, not driver arrays."""
        import json

        self.word_vectors.write.mode("overwrite").parquet(f"{path}/word_vectors")
        self.bucket_vectors.write.mode("overwrite").parquet(f"{path}/bucket_vectors")
        spark = self.word_vectors.sparkSession
        meta = json.dumps(
            {"min_n": self.min_n, "max_n": self.max_n, "bucket": self.bucket, "seed": self.seed}
        )
        spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
            "overwrite"
        ).json(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "FastTextVectors":
        import json

        meta = json.loads(spark.read.json(f"{path}/meta").head()["meta"])
        return cls(
            word_vectors=spark.read.parquet(f"{path}/word_vectors"),
            bucket_vectors=spark.read.parquet(f"{path}/bucket_vectors"),
            min_n=int(meta["min_n"]),
            max_n=int(meta["max_n"]),
            bucket=int(meta["bucket"]),
            seed=int(meta["seed"]),
        )

    def infer_vectors(
        self, words: DataFrame, word_column: str = "word", normalize: bool = True
    ) -> DataFrame:
        """→ (word, vector, oov): trained vector for in-vocab words;
        L2-normalized sum of n-gram bucket vectors for OOV words (the
        FastText composition). Words whose every n-gram bucket is
        unseen get a null vector (flagged ``oov`` = true as well)."""
        from pyspark.ml.functions import array_to_vector, vector_to_array
        from pyspark.ml.stat import Summarizer

        w = words.select(F.col(word_column).alias("word")).dropDuplicates()
        known = w.join(self.word_vectors, on="word", how="inner").select(
            "word", "vector", F.lit(False).alias("oov")
        )
        oov = w.join(self.word_vectors.select("word"), on="word", how="left_anti")
        oov_grams = oov.select(
            "word", F.explode(char_ngrams_column("word", self.min_n, self.max_n)).alias("ngram")
        ).select("word", ngram_bucket("ngram", self.bucket, self.seed))
        summed = (
            oov_grams.join(self.bucket_vectors, on="bucket", how="inner")
            .withColumn("__v", array_to_vector("vector"))
            .groupBy("word")
            .agg(Summarizer.sum(F.col("__v")).alias("__s"))
            .select("word", vector_to_array("__s").alias("vector"))
        )
        if normalize:
            summed = summed.withColumn("vector", l2_normalize("vector"))
        composed = oov.join(summed, on="word", how="left").select(
            "word", "vector", F.lit(True).alias("oov")
        )
        return known.unionByName(composed)
