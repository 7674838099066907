from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.pipelines.click_train_data import make_click_train_data
from redshells_spark.pipelines.similarity_data import (
    cross_group_negative_pairs,
    make_similarity_data,
    random_pair_within_group,
)
from redshells_spark.pipelines.word_item_similarity import (
    calculate_word_embedding,
    calculate_word_item_similarity,
    filter_item_by_word_similarity,
)


@pytest.fixture(scope="module")
def clicks(spark):
    rows = [
        (u, i, 0)
        for u in range(30)
        for i in range(10)
        if (u + i) % 3 != 0
    ]
    return spark.createDataFrame(rows, "user_id int, item_id int, service_id int")


def test_make_click_train_data(clicks):
    out = make_click_train_data(
        clicks, min_user_count=2, min_item_count=2, max_item_frequency=1.0, seed=3
    )
    labels = dict(out.groupBy("click").count().collect())
    assert labels[1] > 0 and labels[0] > 0
    assert labels[0] <= labels[1]
    # negatives are never observed positives
    pos = clicks.select("user_id", "item_id")
    neg = out.filter(F.col("click") == 0).select("user_id", "item_id")
    assert neg.join(pos, on=["user_id", "item_id"], how="inner").count() == 0


@pytest.fixture(scope="module")
def word2items(spark):
    rows = [("w1", f"i{k}") for k in range(4)] + [("w2", f"i{k}") for k in range(4, 10)]
    return spark.createDataFrame(rows, "word string, item_id string")


def test_random_pair_within_group(word2items):
    pairs = random_pair_within_group(word2items)
    rows = pairs.collect()
    items_by_word = {"w1": {f"i{k}" for k in range(4)}, "w2": {f"i{k}" for k in range(4, 10)}}
    for r in rows:
        assert r["item_id_0"] in items_by_word[r["word"]]
        assert r["item_id_1"] in items_by_word[r["word"]]
        assert r["item_id_0"] != r["item_id_1"]


def test_cross_group_negative_pairs(word2items):
    neg = cross_group_negative_pairs(word2items)
    items_by_word = {"w1": {f"i{k}" for k in range(4)}, "w2": {f"i{k}" for k in range(4, 10)}}
    for r in neg.collect():
        assert r["item_id_1"] not in items_by_word[r["word"]]


def test_make_similarity_data(spark, word2items):
    mf_sim = spark.createDataFrame(
        [("i0", "i5", 0.9), ("i1", "i6", 0.1)], "id0 string, id1 string, similarity double"
    )
    out = make_similarity_data(word2items, mf_sim)
    assert set(out.columns) == {"item_id_0", "item_id_1", "similarity"}
    # deduped on pair
    assert out.count() == out.dropDuplicates(["item_id_0", "item_id_1"]).count()
    got = {(r["item_id_0"], r["item_id_1"]): r["similarity"] for r in out.collect()}
    assert got[("i0", "i5")] == 1  # mf positive above 0.7


@pytest.fixture(scope="module")
def embeddings_small(spark):
    rows = [
        ("i0", [1.0, 0.0]),
        ("i1", [0.9, 0.1]),
        ("i2", [0.0, 1.0]),
        ("i3", [0.1, 0.9]),
    ]
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def test_calculate_word_embedding(spark, embeddings_small):
    w2i = spark.createDataFrame(
        [("wx", "i0"), ("wx", "i1"), ("wy", "i2")], "word string, item_id string"
    )
    out = {r["word"]: r["embedding"] for r in calculate_word_embedding(w2i, embeddings_small).collect()}
    assert out["wy"] == pytest.approx([0.0, 1.0])
    norm = sum(x * x for x in out["wx"]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-9)


def test_filter_item_by_word_similarity(spark, embeddings_small):
    w2e = spark.createDataFrame([("wx", [1.0, 0.0])], "word string, embedding array<double>")
    i2t = embeddings_small.select(F.col("vec_id").alias("item_id"), "embedding")
    w2i = spark.createDataFrame(
        [("wx", "i0"), ("wx", "i2")], "word string, item_id string"
    )
    out = filter_item_by_word_similarity(w2i, w2e, i2t, no_below=0.5)
    assert [r["item_id"] for r in out.collect()] == ["i0"]


def test_calculate_word_item_similarity(spark, embeddings_small):
    w2e = spark.createDataFrame(
        [("wx", [1.0, 0.0]), ("wy", [0.0, 1.0])], "word string, embedding array<double>"
    )
    out = calculate_word_item_similarity(
        w2e, embeddings_small, prequery_return_size=3, return_size=2
    )
    got = {(r["word"], r["item_id"]) for r in out.collect()}
    assert ("wx", "i0") in got and ("wy", "i2") in got
    assert out.groupBy("word").count().filter(F.col("count") > 2).count() == 0


def test_word_item_similarity_pluggable_candidates(spark, sf_dir):
    """Stage-1 candidate generation swaps between the exact BLAS path
    and the LSH tier; with multiprobe the approximate results cover
    most of the exact top-k on this corpus."""
    from pyspark.sql import functions as F

    from redshells_spark.pipelines.word_item_similarity import (
        calculate_word_item_similarity,
    )
    from redshells_spark.similarity.ann import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    words = emb.filter(F.col("vec_id") < 10).select(
        F.concat(F.lit("w"), F.col("vec_id")).alias("word"), "embedding"
    )
    exact = calculate_word_item_similarity(
        words, emb, prequery_return_size=20, return_size=5
    )
    approx = calculate_word_item_similarity(
        words, emb, prequery_return_size=20, return_size=5,
        candidate_fn=lambda q, c, k: lsh_topk(q, c, k=k, multiprobe=1, dim=64),
    )
    e = {(r["word"], r["item_id"]) for r in exact.collect()}
    a = {(r["word"], r["item_id"]) for r in approx.collect()}
    assert len(e) == 50 and len(a) == 50
    # NB: exact uses dot, lsh uses cosine — ranking may differ; on this
    # corpus overlap must still be substantial
    assert len(e & a) / len(e) > 0.5


def test_weighted_sample_priority_bias_and_determinism(spark):
    # 500 light rows (w=1) + 50 heavy rows (w=1000): heavy rows should
    # dominate a k=25 priority sample; sample is exactly reproducible
    from pyspark.sql import functions as F

    from redshells_spark.data.sampling import weighted_sample_priority

    rows = [(i, "g", 1) for i in range(500)] + [(1000 + i, "g", 1000) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    a = weighted_sample_priority(df, "g", "id", "w", k=25, seed=0).collect()
    b = weighted_sample_priority(df, "g", "id", "w", k=25, seed=0).collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    heavy = sum(1 for r in a if r["id"] >= 1000)
    assert heavy >= 18  # heavy rows carry ~99% of total weight
    # non-positive weight refused
    bad = spark.createDataFrame([(1, "g", 0)], "id long, g string, w long")
    import pytest as _pytest

    with _pytest.raises(Exception, match="non-positive"):
        weighted_sample_priority(bad, "g", "id", "w", k=1).collect()


def test_weighted_sample_priority_refuses_fractional_weights(spark):
    # ADVICE r4: a weight in (0,1) used to pass the pre-cast guard,
    # truncate to 0, and win the sample via null-priority ordering —
    # it must be refused like any other non-positive weight.
    import pytest as _pytest

    from redshells_spark.data.sampling import weighted_sample_priority

    frac = spark.createDataFrame(
        [(1, "g", 0.7), (2, "g", 2.0)], "id long, g string, w double"
    )
    with _pytest.raises(Exception, match="non-positive"):
        weighted_sample_priority(frac, "g", "id", "w", k=1).collect()
