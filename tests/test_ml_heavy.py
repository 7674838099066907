"""Heavier estimator smoke/threshold tests (SCDV, LDA, FM, sources)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.factorization_machine import (
    evaluate_auc,
    train_factorization_machine,
)
from redshells_spark.ml.lda import train_lda
from redshells_spark.ml.scdv import SCDV


@pytest.fixture(scope="module")
def topic_corpus(spark):
    # two clearly separated topics
    a = ["spark", "query", "join", "shuffle", "plan"]
    b = ["music", "guitar", "piano", "chord", "melody"]
    rows = []
    for i in range(60):
        src = a if i % 2 == 0 else b
        rows.append((i, [src[j % 5] for j in range(i % 4 + 4)]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_scdv_fit_and_infer(topic_corpus):
    model = SCDV.fit(
        topic_corpus,
        cluster_size=4,
        embedding_size=8,
        word2vec_kwargs={"min_count": 1, "seed": 3},
        seed=3,
    )
    assert model.sparsity_threshold > 0.0
    vecs = model.infer_vector(topic_corpus)
    rows = vecs.collect()
    assert len(rows) == 60
    dim = 4 * 8
    assert all(len(r["embedding"]) == dim for r in rows)
    by_id = {r["doc_id"]: r["embedding"] for r in rows}

    def cos(x, y):
        dot = sum(a * b for a, b in zip(x, y))
        nx = sum(a * a for a in x) ** 0.5
        ny = sum(b * b for b in y) ** 0.5
        return dot / (nx * ny + 1e-12)

    same = cos(by_id[0], by_id[2])  # both topic A
    cross = cos(by_id[0], by_id[1])  # A vs B
    assert same > cross  # topic structure must be captured


def test_scdv_word_embedding(topic_corpus):
    model = SCDV.fit(
        topic_corpus, cluster_size=2, embedding_size=4,
        word2vec_kwargs={"min_count": 1, "seed": 3}, seed=3,
    )
    words = topic_corpus.sparkSession.createDataFrame([("spark",), ("music",)], "word string")
    out = model.embed_words(words)
    assert out.count() == 2


def test_lda_topics(topic_corpus):
    res = train_lda(topic_corpus, n_topics=2, max_iter=10, min_df=1, max_df=0.99)
    assert res.log_perplexity == res.log_perplexity  # not NaN
    topics = res.document_topics(topic_corpus)
    row = topics.head()
    assert len(row["topic_distribution"]) == 2
    assert sum(row["topic_distribution"]) == pytest.approx(1.0, abs=1e-6)


def test_factorization_machine_auc(spark):
    # clickthrough is a function of (C1, I1) incl. their interaction
    rows = [
        (1 if (i % 3 == 0) != (i % 5 < 2) else 0, i % 5, f"c{i % 3}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "label int, I1 int, C1 string")
    model = train_factorization_machine(
        df, ["I1"], ["C1"], embedding_size=4, max_iter=30, learning_rate=0.1
    )
    auc = evaluate_auc(model.transform(df))
    assert auc > 0.6


def test_netflix_parser(spark, tmp_path):
    p = tmp_path / "netflix.txt"
    p.write_text("1:\n10,3.0,2005-09-06\n11,4.0,2005-09-07\n2:\n10,5.0,2005-09-08\n")
    from redshells_spark.sources.readers import read_netflix_ratings

    df = read_netflix_ratings(spark, str(p))
    got = {(r["user_id"], r["item_id"]): r["rating"] for r in df.collect()}
    assert got == {(10, 1): 3.0, (11, 1): 4.0, (10, 2): 5.0}


def test_criteo_reader(spark, tmp_path):
    p = tmp_path / "criteo.tsv"
    cols = ["1"] + [str(i) for i in range(13)] + [f"cat{i}" for i in range(26)]
    p.write_text("\t".join(cols) + "\n")
    from redshells_spark.sources.readers import read_criteo_tsv

    df = read_criteo_tsv(spark, str(p))
    assert df.columns[:3] == ["label", "I1", "I2"]
    assert df.head()["label"] == 1 and df.head()["C26"] == "cat25"
