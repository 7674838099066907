from __future__ import annotations

import math

import pytest

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


def test_kn_probabilities_sum_to_one(spark):
    from redshells_spark.text.ngram_lm import train_kn_bigram_lm

    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "b a b a")], "doc_id long, text string"
    )
    lm = train_kn_bigram_lm(docs)
    bc = {(r["prev"], r["word"]): r["n"] for r in lm.bigram_counts.collect()}
    ctx = {
        r["prev"]: (r["c_prev"], r["n1p_fwd"])
        for r in lm.context_stats.collect()
    }
    cont = {r["word"]: r["n1p_bwd"] for r in lm.continuation_counts.collect()}
    d, ty = 0.75, lm.n_bigram_types
    vocab = sorted(cont)  # every word observed as a continuation
    for prev, (c_prev, n1p) in ctx.items():
        total = sum(
            (max(bc.get((prev, w), 0) - d, 0.0) + d * n1p * (cont[w] / ty))
            / c_prev
            for w in vocab
        )
        # interpolated KN is a proper distribution over observed
        # continuations when Pcont is normalized over them
        assert total == pytest.approx(1.0), (prev, total)


def test_kn_scores_match_hand_computation(spark):
    from redshells_spark.text.ngram_lm import (
        score_kn_perplexity,
        train_kn_bigram_lm,
    )

    docs = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    lm = train_kn_bigram_lm(docs)
    r = score_kn_perplexity(docs, lm).collect()[0]
    d = 0.75
    # bigrams: (BOS,a) (a,b) (b,a); all counts 1, 3 types
    # ctx: BOS:(1,1), a:(1,1), b:(1,1); cont: a:2, b:1
    def p(n, n1p_fwd, n1p_bwd, c_prev):
        return (max(n - d, 0.0) + d * n1p_fwd * (n1p_bwd / 3)) / c_prev

    lps = [
        math.log2(p(1, 1, 2, 1)),  # BOS -> a
        math.log2(p(1, 1, 1, 1)),  # a -> b
        math.log2(p(1, 1, 2, 1)),  # b -> a
    ]
    want = -sum(lps) / 3
    assert r["cross_entropy"] == pytest.approx(want)
    assert r["perplexity"] == pytest.approx(2**want)
