"""Decontamination, duplicated spans, stratified sampling, mix weights,
sequence packing — the corpus-composition tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.data.sampling import (
    apply_mix_weights,
    domain_mix_weights,
    stratified_sample_exact,
)
from redshells_spark.dedup.decontaminate import (
    contaminated_doc_ids,
    decontaminate,
    duplicate_span_fraction,
)
from redshells_spark.text.packing import chunk_stats, pack_sequences


@pytest.fixture()
def shingles(spark):
    # doc 0 and 1 share shingle 100; doc 2 is disjoint; doc 9 is the benchmark
    rows = [
        (0, 100), (0, 101), (0, 102),
        (1, 100), (1, 103),
        (2, 200), (2, 201),
        (9, 101), (9, 300),
    ]
    return spark.createDataFrame(rows, "doc_id long, shingle long")


def test_contaminated_doc_ids(spark, shingles):
    corpus = shingles.filter(F.col("doc_id") != 9)
    bench = shingles.filter(F.col("doc_id") == 9)
    hit = {r["doc_id"] for r in contaminated_doc_ids(corpus, bench).collect()}
    assert hit == {0}  # only doc 0 shares shingle 101 with the benchmark


def test_contaminated_min_overlap(spark, shingles):
    corpus = shingles.filter(F.col("doc_id") != 9)
    bench = shingles.filter(F.col("doc_id") == 9)
    assert contaminated_doc_ids(corpus, bench, min_overlap=2).count() == 0


def test_decontaminate_drops_only_hits(spark, shingles):
    docs = spark.createDataFrame([(i, f"d{i}") for i in (0, 1, 2)], "doc_id long, text string")
    corpus = shingles.filter(F.col("doc_id") != 9)
    bench = shingles.filter(F.col("doc_id") == 9)
    kept = decontaminate(docs, corpus, bench)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}


def test_duplicate_span_fraction(spark, shingles):
    out = {
        r["doc_id"]: r["dup_fraction"]
        for r in duplicate_span_fraction(shingles.filter(F.col("doc_id") != 9)).collect()
    }
    # doc 0: shingle 100 shared with doc 1 → 1/3; doc 1: 1/2; doc 2: 0
    assert out[0] == pytest.approx(1 / 3, abs=1e-4)
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0


def test_stratified_sample_exact_sizes(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_sample_exact(df, "grp", 10, "id", seed=1)
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"a": 10, "b": 10}
    # deterministic across invocations
    again = stratified_sample_exact(df, "grp", 10, "id", seed=1)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # quota above group size keeps the whole group
    assert stratified_sample_exact(df, "grp", 1000, "id").count() == 60


def test_domain_mix_weights_uniform_target(spark):
    rows = [(i, "big") for i in range(90)] + [(i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, grp string")
    w = {r["grp"]: r for r in domain_mix_weights(df, "grp").collect()}
    # 'small' is furthest below the uniform 50% target → keeps everything
    assert w["small"]["sample_prob"] == 1.0
    # 'big' is thinned by the ratio of ratios: (0.5/0.9)/(0.5/0.1) = 1/9
    assert w["big"]["sample_prob"] == pytest.approx(1 / 9, abs=1e-4)
    assert w["big"]["n_rows"] == 90


def test_domain_mix_weights_explicit_target(spark):
    rows = [(i, "a") for i in range(50)] + [(i, "b") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string")
    w = {r["grp"]: r["sample_prob"] for r in
         domain_mix_weights(df, "grp", {"a": 0.8, "b": 0.2}).collect()}
    assert w["a"] == 1.0
    assert w["b"] == pytest.approx(0.25)


def test_apply_mix_weights_deterministic_and_thins(spark):
    rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string")
    w = domain_mix_weights(df, "grp")
    out = apply_mix_weights(df, w, "grp", "id", seed=3)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 40  # prob 1.0 keeps all
    assert 10 <= counts["big"] <= 80  # ~1/9 of 400, hash-Bernoulli spread
    again = apply_mix_weights(df, w, "grp", "id", seed=3)
    assert {r["id"] for r in out.collect()} == {r["id"] for r in again.collect()}


def test_pack_sequences_budget_property(spark):
    rows = [(i, "s0" if i < 8 else "s1", 300 + 100 * (i % 4)) for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    packed = pack_sequences(df, budget=1000, partition_column="source").collect()
    # mirror the sequential packing in plain python per shard
    by_shard: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r["source"], r["doc_id"])):
        by_shard.setdefault(r["source"], []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        for r in shard_rows:
            assert r["chunk_id"] == cum // 1000
            cum += r["n_tokens"]
    # chunk ids are dense-ish and nondecreasing within shard
    for shard_rows in by_shard.values():
        ids = [r["chunk_id"] for r in shard_rows]
        assert ids == sorted(ids)
        assert ids[0] == 0


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "s", 10)], "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0, partition_column="source")


def test_chunk_stats(spark):
    df = spark.createDataFrame(
        [(1, "s", 600), (2, "s", 600), (3, "s", 600)],
        "doc_id long, source string, n_tokens long",
    )
    packed = pack_sequences(df, budget=1000, partition_column="source")
    stats = {r["chunk_id"]: r for r in chunk_stats(packed, "source").collect()}
    # docs 1,2 start below 1000 cumulative → chunk 0; doc 3 starts at 1200 → chunk 1
    assert stats[0]["n_docs"] == 2 and stats[0]["total_tokens"] == 1200
    assert stats[1]["n_docs"] == 1 and stats[1]["total_tokens"] == 600
