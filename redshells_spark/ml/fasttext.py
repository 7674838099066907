"""FastText-style subword vectors — §2.H ``train_fasttext``.

Reference ``train/train_fasttext.py:14-38`` trains gensim FastText
(char n-grams min_n=3..max_n=6, 2M hashed buckets per
``app/word_item_similarity/build_word_item_similarity.py:46-68``); its
value over Word2Vec is that OUT-OF-VOCABULARY words still get vectors
composed from their character n-grams — the common case for query
words in word-item retrieval.

gensim is not available here. Two fits are provided:

- :meth:`FastTextVectors.fit` — the fast compositional construction:
  MLlib Word2Vec (distributed skip-gram), then bucket vector = mean of
  the vectors of the words containing that n-gram. Subwords are
  induced post-hoc, not trained.
- :meth:`FastTextVectors.fit_sgd` — the paper's actual training
  objective (Bojanowski et al. 2017 §3.2): skip-gram with negative
  sampling where the CENTER word is represented as the sum of its
  char-n-gram vectors (word token included), so subword vectors are
  SGD-trained against co-occurrence, exactly like gensim's. Vectorized
  minibatch SGD on the driver over a capped corpus — the same
  single-node training boundary the reference's gensim fit has (cf.
  ml/doc2vec.py, ml/gcmc.py); the n-gram→bucket hashing runs
  DISTRIBUTED through the same xxhash64 expression the relational
  composition uses, so one hash function defines the bucket space
  everywhere.

Both produce the same (word_vectors, bucket_vectors) state, so
``save``/``load``/``infer_vectors`` (OOV = L2-normalized sum of
bucket vectors) are shared. N-gram generation is a Catalyst
``transform`` over ``sequence`` (codegen, no Python). In-vocab words
return their trained vector, mirroring FastText's behavior of using
the full-word vector when known.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import l2_normalize
from redshells_spark.ml.doc2vec import _sigmoid


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

    @classmethod
    def fit_sgd(
        cls,
        docs: DataFrame,
        tokens_column: str = "tokens",
        vector_size: int = 50,
        window: int = 5,
        min_count: int = 2,
        epochs: int = 5,
        learning_rate: float = 0.05,
        negative: int = 5,
        min_n: int = 3,
        max_n: int = 6,
        bucket: int = 2_000_000,
        max_docs: int = 100_000,
        seed: int = 42,
    ) -> "FastTextVectors":
        """SGD-trained subword skip-gram (Bojanowski et al. 2017):
        maximize σ(Σ_{g∈G_w} z_g · v_c) for (center w, context c)
        pairs inside ``window``, minimize against ``negative``
        unigram^0.75 samples. G_w = w's boundary-marked char n-grams
        plus the word token itself; every gram's vector receives the
        center gradient, which is what makes the learned buckets
        compose sensible OOV vectors. Driver minibatch SGD over a
        ``max_docs``-capped corpus (loud refusal beyond), mirroring
        the reference's single-node gensim boundary."""
        import numpy as np
        import pandas as pd

        spark = docs.sparkSession
        pdf = docs.select(F.col(tokens_column).alias("tokens")).limit(max_docs).toPandas()
        counts: dict = {}
        for toks in pdf["tokens"]:
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
        vocab = sorted(w for w, c in counts.items() if c >= min_count)
        widx = {w: i for i, w in enumerate(vocab)}
        V = len(vocab)
        if V == 0:
            raise ValueError("empty vocabulary; lower min_count")
        freq = np.array([counts[w] for w in vocab], dtype=np.float64) ** 0.75
        noise = freq / freq.sum()

        # subword buckets per vocab word, hashed DISTRIBUTED with the
        # same xxhash64 expression the relational composition uses
        # (numpy has no xxhash64) — vocab-bounded collect
        vdf = spark.createDataFrame([(w,) for w in vocab], "word string")
        gram_rows = (
            vdf.select(
                "word",
                F.explode(char_ngrams_column("word", min_n, max_n)).alias("ngram"),
            )
            .select("word", ngram_bucket("ngram", bucket, seed))
            .collect()
        )
        word_buckets: dict[str, list[int]] = {w: [] for w in vocab}
        for r in gram_rows:
            word_buckets[r["word"]].append(int(r["bucket"]))
        used = sorted({b for bs in word_buckets.values() for b in bs})
        b_row = {b: V + i for i, b in enumerate(used)}  # grams after words
        R = V + len(used) + 1  # +1: zero padding row (mask keeps it 0)
        pad = R - 1

        # padded gram-row table: row i holds word i's input rows
        # (itself + its gram buckets); Gmax is bounded by max word len
        g_lists = [
            [i] + [b_row[b] for b in word_buckets[vocab[i]]] for i in range(V)
        ]
        gmax = max(len(g) for g in g_lists)
        gram_table = np.full((V, gmax), pad, dtype=np.int64)
        gram_mask = np.zeros((V, gmax), dtype=np.float64)
        for i, g in enumerate(g_lists):
            gram_table[i, : len(g)] = g
            gram_mask[i, : len(g)] = 1.0
        gram_count = gram_mask.sum(axis=1)

        # skip-gram training pairs
        ci, xi = [], []
        for toks in pdf["tokens"]:
            ids = [widx[t] for t in toks if t in widx]
            n = len(ids)
            for i in range(n):
                for j in range(max(0, i - window), min(n, i + window + 1)):
                    if j != i:
                        ci.append(ids[i])
                        xi.append(ids[j])
        ci = np.array(ci, dtype=np.int64)
        xi = np.array(xi, dtype=np.int64)
        n_pairs = len(ci)
        if n_pairs == 0:
            raise ValueError("no skip-gram pairs; corpus too small")

        rng = np.random.default_rng(seed)
        Z = rng.normal(0, 0.1, (R, vector_size))  # input: words + grams
        Z[pad] = 0.0
        O = np.zeros((V, vector_size))  # output (context) matrix
        # true-SGD updates (no per-row gradient averaging) need each
        # row's within-batch multiplicity ~1, so the batch is capped
        # relative to the vocabulary — an uncapped 2048-batch over a
        # tiny vocab multiplies the effective step per row by
        # batch·(1+negative)/V and diverges
        batch = max(1, min(2048, n_pairs, 8 * V))
        for epoch in range(epochs):
            order = rng.permutation(n_pairs)
            lr = learning_rate * (1.0 - epoch / max(epochs, 1))
            for s in range(0, n_pairs, batch):
                idx = order[s : s + batch]
                c, x = ci[idx], xi[idx]
                gt, gm = gram_table[c], gram_mask[c]  # (b, G)
                cnt = gram_count[c]
                # hidden = MEAN of gram rows (fastText model.cc): the
                # full gradient then lands on each gram row, moving the
                # mean by exactly lr*grad regardless of |G_w|
                center = (Z[gt] * gm[..., None]).sum(axis=1) / cnt[:, None]
                neg = rng.choice(V, size=(len(idx), negative), p=noise)
                gpos = _sigmoid((center * O[x]).sum(axis=1)) - 1.0  # (b,)
                gc = gpos[:, None] * O[x]
                go = gpos[:, None] * center
                gneg = _sigmoid(np.einsum("bk,bnk->bn", center, O[neg]))
                gc += np.einsum("bn,bnk->bk", gneg, O[neg])
                gno = gneg[..., None] * center[:, None, :]
                np.add.at(O, x, -lr * go)
                np.subtract.at(O, neg.ravel(), lr * gno.reshape(-1, vector_size))
                # center gradient flows to EVERY gram row of the word
                np.add.at(
                    Z,
                    gt.ravel(),
                    (-lr * gc[:, None, :] * gm[..., None]).reshape(-1, vector_size),
                )
                Z[pad] = 0.0  # padding row stays inert

        word_vecs = np.stack(
            [
                (Z[gram_table[i]] * gram_mask[i][:, None]).sum(axis=0)
                / gram_count[i]
                for i in range(V)
            ]
        )
        wv = spark.createDataFrame(
            pd.DataFrame(
                {"word": vocab, "vector": [[float(x) for x in v] for v in word_vecs]}
            )
        )
        bv = spark.createDataFrame(
            pd.DataFrame(
                {
                    "bucket": used,
                    "vector": [[float(x) for x in Z[b_row[b]]] for b in used],
                }
            )
        )
        return cls(
            word_vectors=wv,
            bucket_vectors=bv,
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
