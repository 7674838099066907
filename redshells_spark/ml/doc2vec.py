"""Doc2Vec (PV-DBOW) — §2.H ``train_doc2vec``.

Reference ``train/train_doc2vec.py:11-30`` fits gensim Doc2Vec.
gensim is absent here, so this is a from-scratch PV-DBOW trainer
(Le & Mikolov 2014, "Distributed Representations of Sentences and
Documents", the dm=0 mode) with negative sampling:

- maximize σ(d·w) for words in the doc, minimize σ(d·n) for sampled
  negatives (unigram^0.75 distribution);
- vectorized minibatch SGD on the driver over a capped corpus — the
  same single-node training boundary the reference's gensim fit has
  (and the same as the GCMC trainer's ``max_data_size`` cap);
- ``infer_vector`` freezes word vectors and fits vectors for unseen
  docs, so inference is available for any downstream corpus.

SCDV / mean-word-vectors remain the recommended distributed document
embeddings at 100 TB (they never collect the corpus); this exists for
reference API parity where PV-DM/PV-DBOW semantics are wanted.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


@dataclass
class Doc2Vec:
    word_index: dict  # word -> row in word_vectors
    word_vectors: np.ndarray  # (V, d)
    doc_vectors: pd.DataFrame  # (doc_id, vector) for training docs
    vector_size: int
    negative: int
    noise_probs: np.ndarray  # unigram^0.75 over vocab
    seed: int

    @classmethod
    def fit(
        cls,
        docs: DataFrame,
        tokens_column: str = "tokens",
        doc_id_column: str = "doc_id",
        vector_size: int = 50,
        min_count: int = 2,
        epochs: int = 10,
        learning_rate: float = 0.05,
        negative: int = 5,
        max_docs: int = 100_000,
        seed: int = 42,
    ) -> "Doc2Vec":
        pdf = (
            docs.select(F.col(doc_id_column).alias("doc_id"), F.col(tokens_column).alias("tokens"))
            .limit(max_docs)
            .toPandas()
        )
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

        # flatten (doc_row, word_row) training pairs
        di, wi = [], []
        for row, toks in enumerate(pdf["tokens"]):
            for t in toks:
                j = widx.get(t)
                if j is not None:
                    di.append(row)
                    wi.append(j)
        di = np.array(di, dtype=np.int64)
        wi = np.array(wi, dtype=np.int64)

        rng = np.random.default_rng(seed)
        D = rng.normal(0, 0.1, (len(pdf), vector_size))
        W = rng.normal(0, 0.1, (V, vector_size))
        n_pairs = len(di)
        batch = max(1, min(8192, n_pairs))
        for epoch in range(epochs):
            order = rng.permutation(n_pairs)
            lr = learning_rate * (1.0 - epoch / max(epochs, 1))
            for s in range(0, n_pairs, batch):
                idx = order[s : s + batch]
                d, w = di[idx], wi[idx]
                neg = rng.choice(V, size=(len(idx), negative), p=noise)
                dv = D[d]  # (b, k)
                # positive
                gpos = _sigmoid((dv * W[w]).sum(axis=1)) - 1.0  # (b,)
                gd = gpos[:, None] * W[w]
                gw = gpos[:, None] * dv
                # negatives
                gneg = _sigmoid(np.einsum("bk,bnk->bn", dv, W[neg]))  # (b, n)
                gd += np.einsum("bn,bnk->bk", gneg, W[neg])
                gnw = gneg[..., None] * dv[:, None, :]  # (b, n, k)
                np.add.at(W, w, -lr * gw)
                np.subtract.at(W, neg.ravel(), lr * gnw.reshape(-1, vector_size))
                np.add.at(D, d, -lr * gd)

        doc_vecs = pd.DataFrame(
            {"doc_id": pdf["doc_id"], "vector": [list(map(float, v)) for v in D]}
        )
        return cls(
            word_index=widx,
            word_vectors=W,
            doc_vectors=doc_vecs,
            vector_size=vector_size,
            negative=negative,
            noise_probs=noise,
            seed=seed,
        )

    def doc_vectors_df(self, spark) -> DataFrame:
        return spark.createDataFrame(self.doc_vectors)

    def save(self, path: str) -> None:
        """npz (word vectors, noise table) + JSON vocab + parquet doc
        vectors — the pickle-model-target role, dependency-free."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "doc2vec.npz"),
            word_vectors=self.word_vectors,
            noise_probs=self.noise_probs,
        )
        with open(os.path.join(path, "doc2vec_meta.json"), "w") as f:
            json.dump(
                {
                    "word_index": self.word_index,
                    "vector_size": self.vector_size,
                    "negative": self.negative,
                    "seed": self.seed,
                },
                f,
            )
        self.doc_vectors.to_parquet(os.path.join(path, "doc_vectors.parquet"))

    @classmethod
    def load(cls, path: str) -> "Doc2Vec":
        import json
        import os

        z = np.load(os.path.join(path, "doc2vec.npz"))
        with open(os.path.join(path, "doc2vec_meta.json")) as f:
            meta = json.load(f)
        return cls(
            word_index=meta["word_index"],
            word_vectors=z["word_vectors"],
            doc_vectors=pd.read_parquet(os.path.join(path, "doc_vectors.parquet")),
            vector_size=int(meta["vector_size"]),
            negative=int(meta["negative"]),
            noise_probs=z["noise_probs"],
            seed=int(meta["seed"]),
        )

    def infer_vector(
        self,
        docs: DataFrame,
        tokens_column: str = "tokens",
        doc_id_column: str = "doc_id",
        steps: int = 20,
        learning_rate: float = 0.05,
    ) -> DataFrame:
        """Fit vectors for unseen docs with word vectors frozen —
        distributed: each Arrow batch runs the same PV-DBOW update on
        its documents only (doc vectors are per-doc state; nothing is
        shared across docs, so this parallelizes embarrassingly)."""
        spark = docs.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.word_index, self.word_vectors, self.noise_probs, self.negative, self.seed)
        )
        k = self.vector_size
        id_type = docs.schema[doc_id_column].dataType.simpleString()

        def run(batches):
            widx, W, noise, n_neg, seed = bc.value
            V = W.shape[0]
            for pdf in batches:
                if pdf.empty:
                    continue
                rng = np.random.default_rng(seed)
                out = []
                for toks in pdf[tokens_column]:
                    rows = [widx[t] for t in toks if t in widx]
                    d = rng.normal(0, 0.1, k)
                    if rows:
                        w = np.array(rows)
                        for step in range(steps):
                            lr = learning_rate * (1.0 - step / max(steps, 1))
                            neg = rng.choice(V, size=(len(w), n_neg), p=noise)
                            gpos = _sigmoid(W[w] @ d) - 1.0
                            gd = gpos @ W[w]
                            gneg = _sigmoid(np.einsum("k,bnk->bn", d, W[neg]))
                            gd += np.einsum("bn,bnk->k", gneg, W[neg])
                            d -= lr * gd
                    out.append([float(x) for x in d])
                yield pd.DataFrame({"doc_id": pdf[doc_id_column], "vector": out})

        return docs.select(doc_id_column, tokens_column).mapInPandas(
            run, schema=f"doc_id {id_type}, vector array<double>"
        )
