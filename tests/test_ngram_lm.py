from __future__ import annotations

import math

from pyspark.sql import functions as F

from redshells_spark.text.ngram_lm import BigramLM, score_perplexity, train_bigram_lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_perplexity_separates_fluent_from_noise(spark):
    # train on repetitive "fluent" text; a doc drawn from the same
    # distribution must score lower perplexity than unseen-word noise
    train = _docs(
        spark,
        [(f"t{i}", "the cat sat on the mat and the cat ran") for i in range(5)],
    )
    lm = train_bigram_lm(train)
    target = _docs(
        spark,
        [("fluent", "the cat sat on the mat"), ("noise", "zq xv wk jj qqq zzz")],
    )
    out = {r["doc_id"]: r["perplexity"] for r in score_perplexity(target, lm).collect()}
    assert out["fluent"] < out["noise"]


def test_unseen_context_floor_is_one_over_v(spark):
    # both words and the context are unseen: P = alpha/(alpha*V) = 1/V
    train = _docs(spark, [("a", "x y z w")])
    lm = train_bigram_lm(train)
    target = _docs(spark, [("d", "aa bb")])
    row = score_perplexity(target, lm, alpha=0.5).head()
    v = lm.vocab_size
    # bigrams: (BOS, aa) has seen context BOS (n_prev=1), (aa, bb) fully unseen
    p1 = 0.5 / (1 + 0.5 * v)
    p2 = 0.5 / (0.5 * v)
    expected_ce = -(math.log2(p1) + math.log2(p2)) / 2
    assert abs(row["cross_entropy"] - expected_ce) < 1e-9
    assert abs(row["perplexity"] - 2**expected_ce) < 1e-6


def test_empty_docs_drop_out(spark):
    lm = train_bigram_lm(_docs(spark, [("a", "x y")]))
    out = score_perplexity(_docs(spark, [("e", ""), ("a", "x y")]), lm)
    assert [r["doc_id"] for r in out.collect()] == ["a"]


def test_save_load_roundtrip(spark, tmp_path):
    train = _docs(spark, [("a", "the cat sat"), ("b", "the dog sat")])
    lm = train_bigram_lm(train)
    lm.save(str(tmp_path / "lm"))
    lm2 = BigramLM.load(spark, str(tmp_path / "lm"))
    assert lm2.vocab_size == lm.vocab_size
    target = _docs(spark, [("q", "the cat sat")])
    a = score_perplexity(target, lm).head()["perplexity"]
    b = score_perplexity(target, lm2).head()["perplexity"]
    assert abs(a - b) < 1e-12


def test_min_count_prunes_bigram_table_not_distribution(spark):
    train = _docs(spark, [("a", "x y x y x z")])
    full = train_bigram_lm(train, min_count=1)
    pruned = train_bigram_lm(train, min_count=2)
    assert pruned.bigram_counts.count() < full.bigram_counts.count()
    # context counts and V stay exact
    assert pruned.vocab_size == full.vocab_size
    assert (
        pruned.context_counts.orderBy("prev").collect()
        == full.context_counts.orderBy("prev").collect()
    )


def test_broadcast_hint_plan(spark):
    train = _docs(spark, [("a", "x y z")])
    lm = train_bigram_lm(train)
    target = _docs(spark, [("q", "x y")])
    plan = score_perplexity(target, lm, broadcast_lm=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
