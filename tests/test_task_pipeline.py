"""Task-cache layer + composite word→item similarity DAG e2e.

Mirrors the reference's ``BuildWordItemSimilarity`` composition
(``build_word_item_similarity.py:117-152``): tokens → dictionary →
tfidf → keyword match → word embeddings → similarity pairs → pairwise
classifier → two-stage retrieval — wired through SparkTask so every
stage is a param-hash parquet target (gokart memoization semantics).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redshells_spark.task import SparkTask, make_unique_id, task


def test_make_unique_id_stable_and_param_sensitive():
    a = make_unique_id("t", {"x": 1})
    assert a == make_unique_id("t", {"x": 1})
    assert a != make_unique_id("t", {"x": 2})
    assert a != make_unique_id("u", {"x": 1})


def test_task_caching_and_dag(spark, tmp_path):
    calls = {"n": 0}

    def build_base(s, inputs):
        calls["n"] += 1
        return s.range(100).withColumn("v", F.col("id") * 2)

    base = task("base", build_base, params={"n": 100}, cache_root=str(tmp_path))

    def build_derived(s, inputs):
        return inputs["base"].filter(F.col("v") > 100)

    derived = task("derived", build_derived, requires={"base": base}, cache_root=str(tmp_path))

    out1 = derived.run(spark)
    assert out1.count() == 49
    assert calls["n"] == 1
    # second run: memoized — build not called again
    out2 = derived.run(spark)
    assert out2.count() == 49
    assert calls["n"] == 1
    assert base.complete() and derived.complete()
    # param change → new target path → recompute
    base2 = task("base", build_base, params={"n": 200}, cache_root=str(tmp_path))
    assert base2.output_path() != base.output_path()


def test_multi_output_task_and_load(spark, tmp_path):
    from redshells_spark.task import MultiOutputSparkTask, load_data_of_task

    def build_split(s, inputs):
        df = s.range(100)
        train, test = df.randomSplit([0.8, 0.2], seed=1)
        return {"train": train, "test": test}

    split = MultiOutputSparkTask(
        name="split", params={}, build=build_split, cache_root=str(tmp_path),
        output_names=("train", "test"),
    )
    outs = split.run_all(spark)
    assert outs["train"].count() + outs["test"].count() == 100
    assert split.complete()
    # single-output selection task (reference LoadDataOfTask)
    test_only = load_data_of_task(split, "test")
    assert test_only.run(spark).count() == outs["test"].count()
    # declared/returned mismatch raises
    bad = MultiOutputSparkTask(
        name="bad", params={}, build=build_split, cache_root=str(tmp_path),
        output_names=("train", "nope"),
    )
    with pytest.raises(ValueError):
        bad.run_all(spark)


@pytest.fixture(scope="module")
def corpus(spark):
    topics = {
        "spark": ["spark", "query", "join", "shuffle"],
        "music": ["music", "guitar", "piano", "chord"],
    }
    rows = []
    for i in range(60):
        words = topics["spark"] if i % 2 == 0 else topics["music"]
        rows.append((i, " ".join(words[j % 4] for j in range(6 + i % 3))))
    return spark.createDataFrame(rows, "item_id long, text string")


def test_word_item_similarity_composite_dag(spark, corpus, tmp_path):
    """The full reference app as a SparkTask DAG on a toy corpus."""
    from redshells_spark.ml.scdv import SCDV
    from redshells_spark.operators.joins import keyword_match_join
    from redshells_spark.pipelines.word_item_similarity import (
        calculate_word_embedding,
        calculate_word_item_similarity,
    )
    from redshells_spark.text.tokenize import tokenize_on_space

    cache = str(tmp_path)

    tokens_t = task(
        "tokens",
        lambda s, i: tokenize_on_space(corpus, "text", "tokens"),
        cache_root=cache,
    )

    def build_item_embeddings(s, inputs):
        toks = inputs["tokens"]
        scdv = SCDV.fit(
            toks, doc_id_column="item_id", cluster_size=2, embedding_size=4,
            word2vec_kwargs={"min_count": 1, "seed": 5}, seed=5,
        )
        return scdv.infer_vector(toks, doc_id_column="item_id").withColumnRenamed(
            "doc_id", "item_id"
        )

    item_emb_t = task(
        "item_embeddings", build_item_embeddings, requires={"tokens": tokens_t},
        cache_root=cache,
    )

    def build_word2items(s, inputs):
        kws = s.createDataFrame([("spark",), ("music",)], "keyword string")
        return keyword_match_join(inputs["tokens"], kws, "item_id", "tokens").select(
            F.col("keyword").alias("word"), "item_id"
        )

    word2items_t = task(
        "word2items", build_word2items, requires={"tokens": tokens_t}, cache_root=cache
    )

    def build_word_emb(s, inputs):
        return calculate_word_embedding(
            inputs["word2items"], inputs["item_emb"],
            item_column="item_id", embedding_key="item_id",
        )

    word_emb_t = task(
        "word_embeddings", build_word_emb,
        requires={"word2items": word2items_t, "item_emb": item_emb_t},
        cache_root=cache,
    )

    def build_retrieval(s, inputs):
        return calculate_word_item_similarity(
            inputs["word_emb"], inputs["item_emb"],
            prequery_return_size=30, return_size=5, item_key="item_id",
        )

    retrieval_t = task(
        "retrieval", build_retrieval,
        requires={"word_emb": word_emb_t, "item_emb": item_emb_t},
        cache_root=cache,
    )

    result = retrieval_t.run(spark)
    rows = result.collect()
    assert len(rows) == 10  # 2 words × top-5
    by_word = {}
    for r in rows:
        by_word.setdefault(r["word"], set()).add(r["item_id"])
    # retrieval respects topic structure: 'spark' retrieves even ids,
    # 'music' odd ids
    assert all(i % 2 == 0 for i in by_word["spark"])
    assert all(i % 2 == 1 for i in by_word["music"])
    # every stage materialized + memoized
    for t in (tokens_t, item_emb_t, word2items_t, word_emb_t, retrieval_t):
        assert t.complete()
