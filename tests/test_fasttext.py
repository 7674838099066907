"""FastText subword layer: n-gram generation, bucket vectors, OOV
composition (reference train/train_fasttext.py:14-38 semantics — OOV
words must get nonzero vectors composed from char n-grams)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.fasttext import (
    FastTextVectors,
    char_ngrams_column,
    ngram_bucket,
)


def _expected_ngrams(word: str, min_n: int, max_n: int) -> set[str]:
    marked = f"<{word}>"
    out = set()
    for n in range(min_n, max_n + 1):
        for i in range(len(marked) - n + 1):
            out.add(marked[i : i + n])
    return out


def test_char_ngrams_match_python_reference(spark):
    words = ["spark", "ab", "distributed"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: set(r["g"])
        for r in df.select("word", char_ngrams_column("word", 3, 6).alias("g")).collect()
    }
    for w in words:
        assert got[w] == _expected_ngrams(w, 3, 6), w


@pytest.fixture(scope="module")
def ft(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.split(F.lower("text"), r"\s+").alias("tokens"))
        .limit(300)
    )
    return FastTextVectors.fit(
        docs, vector_size=16, min_count=2, bucket=50_000, seed=42
    )


def test_in_vocab_words_get_trained_vectors(ft):
    vocab_sample = ft.word_vectors.limit(5)
    out = ft.infer_vectors(vocab_sample.select("word"))
    joined = out.join(
        vocab_sample.withColumnRenamed("vector", "expected"), on="word"
    ).collect()
    assert len(joined) == 5
    for r in joined:
        assert not r["oov"]
        assert r["vector"] == pytest.approx(r["expected"])


def test_oov_vector_is_normalized_ngram_sum(spark, ft):
    # an OOV word built from corpus-like character material
    oov_word = "sparkly"
    assert ft.word_vectors.filter(F.col("word") == oov_word).count() == 0
    out = ft.infer_vectors(spark.createDataFrame([(oov_word,)], ["word"])).collect()
    assert len(out) == 1 and out[0]["oov"]
    vec = out[0]["vector"]
    assert vec is not None
    norm = math.sqrt(sum(x * x for x in vec))
    assert norm == pytest.approx(1.0, rel=1e-9)  # L2-normalized
    # and equals the normalized sum of its n-gram bucket vectors
    grams = spark.createDataFrame([(oov_word,)], ["word"]).select(
        F.explode(char_ngrams_column("word", ft.min_n, ft.max_n)).alias("ngram")
    ).select(ngram_bucket("ngram", ft.bucket, ft.seed))
    rows = grams.join(ft.bucket_vectors, on="bucket", how="inner").collect()
    assert rows, "no bucket hits — corpus should share n-grams with 'sparkly'"
    dim = len(rows[0]["vector"])
    sums = [sum(r["vector"][d] for r in rows) for d in range(dim)]
    n = math.sqrt(sum(x * x for x in sums))
    expected = [x / n for x in sums]
    assert vec == pytest.approx(expected, rel=1e-9)


def test_unmatchable_oov_gets_null_vector(spark, ft):
    out = ft.infer_vectors(spark.createDataFrame([("ZZZZQQQXXJ",)], ["word"])).collect()
    assert len(out) == 1
    # every n-gram bucket unseen → null vector, flagged oov
    if out[0]["vector"] is not None:
        # tiny bucket space can collide; at least verify the flag
        assert out[0]["oov"]
    else:
        assert out[0]["oov"]


def test_embed_query_words_pipeline_fallback(spark, ft):
    """Retrieval front-door: known words use the pipeline embedding,
    OOV words get the FastText composition, unmatchable junk falls
    out — so a query batch never silently loses real words."""
    from redshells_spark.pipelines.word_item_similarity import embed_query_words

    word2emb = ft.word_vectors.limit(3).select(
        "word", F.col("vector").alias("embedding")
    )
    known_words = [r["word"] for r in word2emb.collect()]
    queries = spark.createDataFrame(
        [(w,) for w in known_words + ["sparkly"]], ["word"]
    )
    out = embed_query_words(queries, word2emb, fasttext=ft)
    rows = {r["word"]: r for r in out.collect()}
    assert set(rows) == set(known_words) | {"sparkly"}
    for w in known_words:
        assert not rows[w]["oov"]
    assert rows["sparkly"]["oov"]
    assert rows["sparkly"]["embedding"] is not None

    # without a fasttext model, OOV words are absent (Word2Vec behavior)
    out2 = embed_query_words(queries, word2emb, fasttext=None)
    assert {r["word"] for r in out2.collect()} == set(known_words)


# ------------------------------------------------------- SGD-trained subwords


@pytest.fixture(scope="module")
def ft_sgd(spark):
    """Two-topic synthetic corpus: fruit words co-occur with fruit
    words, furniture with furniture — the skip-gram objective must
    place topics in separable regions."""
    import numpy as np

    fruit = ["apple", "banana", "cherry", "grape", "melon"]
    furn = ["table", "chair", "sofa", "desk", "shelf"]
    rng = np.random.default_rng(11)
    docs = []
    for i in range(240):
        topic = fruit if i % 2 == 0 else furn
        docs.append((i, [topic[j] for j in rng.integers(0, len(topic), 12)]))
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    return FastTextVectors.fit_sgd(
        df, vector_size=16, window=4, min_count=2, epochs=8,
        negative=5, bucket=50_000, seed=7,
    )


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb)


def test_fit_sgd_learns_topic_structure(ft_sgd):
    vecs = {r["word"]: r["vector"] for r in ft_sgd.word_vectors.collect()}
    fruit = ["apple", "banana", "cherry", "grape", "melon"]
    furn = ["table", "chair", "sofa", "desk", "shelf"]
    intra = [
        _cos(vecs[a], vecs[b])
        for grp in (fruit, furn)
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ]
    cross = [_cos(vecs[a], vecs[b]) for a in fruit for b in furn]
    margin = sum(intra) / len(intra) - sum(cross) / len(cross)
    # co-occurring words must be measurably closer than cross-topic
    assert margin > 0.2, margin


def test_fit_sgd_oov_composition_uses_trained_subwords(ft_sgd, spark):
    """A misspelling shares most n-grams with its source word, so its
    composed OOV vector must be closer to that word than an unrelated
    word's vector is — the whole point of TRAINING the subwords."""
    vecs = {r["word"]: r["vector"] for r in ft_sgd.word_vectors.collect()}
    out = {
        r["word"]: r
        for r in ft_sgd.infer_vectors(
            spark.createDataFrame([("bananna",), ("zzqqxx",)], "word string")
        ).collect()
    }
    assert out["bananna"]["oov"] and out["bananna"]["vector"] is not None
    sim_src = _cos(out["bananna"]["vector"], vecs["banana"])
    sim_far = _cos(out["bananna"]["vector"], vecs["table"])
    assert sim_src > sim_far


def test_fit_sgd_roundtrips_through_save_load(ft_sgd, spark, tmp_path):
    ft_sgd.save(str(tmp_path / "ftsgd"))
    loaded = FastTextVectors.load(spark, str(tmp_path / "ftsgd"))
    a = sorted(ft_sgd.word_vectors.collect())
    b = sorted(loaded.word_vectors.collect())
    assert a == b
