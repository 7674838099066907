"""JSONL ingest: corrupt-record capture, failfast, rate guard, and
parquet schema evolution via mergeSchema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.sources.jsonl import corruption_rate_guard, read_jsonl

LINES = [
    '{"doc_id": 1, "text": "hello world"}',
    '{"doc_id": 2, "text": "second doc"}',
    "this is not json at all {{{",
    '{"doc_id": "not-a-number", "text": 4}',  # type mismatch -> corrupt
    '{"doc_id": 5, "text": "fifth"}',
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_permissive_splits_clean_and_corrupt(spark, jsonl_path):
    clean, corrupt = read_jsonl(spark, jsonl_path, "doc_id long, text string")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 5]
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_failfast_raises_on_bad_line(spark, jsonl_path):
    df, _ = read_jsonl(spark, jsonl_path, "doc_id long, text string", mode="failfast")
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_corruption_rate_guard(spark, jsonl_path):
    clean, corrupt = read_jsonl(spark, jsonl_path, "doc_id long, text string")
    stats = corruption_rate_guard(clean, corrupt, max_rate=0.5)
    assert stats == {"n_clean": 3, "n_corrupt": 2, "rate": 0.4}
    with pytest.raises(ValueError, match="corrupt"):
        corruption_rate_guard(clean, corrupt, max_rate=0.1)


def test_unknown_mode_refused(spark, jsonl_path):
    with pytest.raises(ValueError, match="unknown mode"):
        read_jsonl(spark, jsonl_path, "doc_id long", mode="lenient")


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    # generation 1: (id, a); generation 2 adds column b — mergeSchema
    # reads the union, old files null-fill the new column
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(f"{p}/g=1")
    spark.createDataFrame([(2, "y", 9.5)], "id long, a string, b double").write.parquet(
        f"{p}/g=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", 9.5)}

    # without mergeSchema the picked footer may miss b — the footgun
    # the option exists for; just assert the merged read is a superset
    plain = spark.read.parquet(p)
    assert set(plain.columns) <= set(df.columns)
