"""Bloom runtime-filter: no false negatives, deterministic bitmap,
exact-mode parity with a native left-semi join."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshells_spark.operators.bloom import (
    BloomFilter,
    bloom_contains,
    bloom_semi_join,
    build_bloom,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_no_false_negatives(spark, sf_dir):
    keys = (
        _orders(spark, sf_dir)
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("key"))
        .dropDuplicates()
    )
    bloom = build_bloom(keys, "key", num_words=64, num_hashes=3)
    # every inserted key must pass its own filter
    missed = keys.filter(~bloom_contains(bloom, "key")).count()
    assert missed == 0


def test_probe_is_superset_and_exact_matches_semi_join(spark, sf_dir):
    orders = _orders(spark, sf_dir).filter(F.col("o_totalprice") > 300000)
    li = _lineitem(spark, sf_dir)

    probe = bloom_semi_join(li, orders.select("o_orderkey"), "l_orderkey", "o_orderkey", num_words=64)
    exact = bloom_semi_join(
        li, orders.select("o_orderkey"), "l_orderkey", "o_orderkey", num_words=64, exact=True
    )
    native = li.join(
        F.broadcast(orders.select(F.col("o_orderkey").alias("l_orderkey")).dropDuplicates()),
        on="l_orderkey",
        how="left_semi",
    )

    n_probe, n_exact, n_native = probe.count(), exact.count(), native.count()
    assert n_exact == n_native
    assert n_probe >= n_exact  # false positives only ever ADD rows
    # exact-mode rows are literally the semi-join rows
    assert exact.select("l_orderkey").exceptAll(native.select("l_orderkey")).count() == 0


def test_bitmap_is_deterministic(spark, sf_dir):
    keys = _orders(spark, sf_dir).select(F.col("o_orderkey").alias("key")).limit(200)
    b1 = build_bloom(keys, "key", num_words=32, num_hashes=2)
    b2 = build_bloom(keys, "key", num_words=32, num_hashes=2)
    assert b1 == b2
    assert isinstance(b1, BloomFilter) and len(b1.words) == 32


def test_empty_key_set_rejects_everything(spark, sf_dir):
    empty = _orders(spark, sf_dir).select(F.col("o_orderkey").alias("key")).limit(0)
    bloom = build_bloom(empty, "key", num_words=16)
    assert all(w == 0 for w in bloom.words)
    li = _lineitem(spark, sf_dir)
    assert li.filter(bloom_contains(bloom, "l_orderkey")).count() == 0
