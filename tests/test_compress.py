"""Compression-ratio quality signal: property gates (no SQL oracle —
DuckDB has no DEFLATE surface)."""

from __future__ import annotations

import zlib

from redshells_spark.queries import get_queries

SF = "/root/testdata/sf0.001"


def test_ratio_orders_text_quality(spark):
    from redshells_spark.text.compress import compression_signals

    import hashlib

    junk, h = [], b"seed"
    while sum(map(len, junk)) < 800:
        h = hashlib.md5(h).digest()
        junk.append(h.hex())
    docs = spark.createDataFrame(
        [
            (0, "the " * 200),  # degenerate repetition
            (1, "the quick brown fox jumps over the lazy dog " * 18),
            (2, "".join(junk)[:800]),  # hash-chain: incompressible
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    # repetitive << phrase-repeating << incompressible junk
    assert out[0]["ratio"] < out[1]["ratio"] < out[2]["ratio"]
    assert out[0]["ratio"] < 0.05 and out[2]["ratio"] > 0.5
    assert out[1]["raw_len"] == 18 * 44  # the pangram + trailing space


def test_exact_lengths_and_determinism(spark):
    from redshells_spark.text.compress import compression_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    b = {
        r["doc_id"]: r
        for r in compression_signals(docs.repartition(13)).collect()
    }
    assert a == b  # partitioning-invariant
    sample = docs.limit(5).collect()
    for row in sample:
        raw = row["text"].encode("utf-8")
        assert a[row["doc_id"]]["raw_len"] == len(raw)
        assert a[row["doc_id"]]["comp_len"] == len(zlib.compress(raw, 6))


def test_registry_query_runs(spark):
    out = get_queries()["compression_ratio_signals"](spark, SF)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["ratio"] is not None and 0 < r["ratio"] <= 1.2 for r in rows)
