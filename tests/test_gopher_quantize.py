"""Gopher rule battery (text/analysis.py) and int8 quantization
(similarity/quantize.py) unit checks on hand-computable inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.quantize import (
    embedding_absmax,
    int8_quantize,
    int8_reconstruction_report,
)
from redshells_spark.text.analysis import gopher_quality_rules


def test_gopher_rules_keep_and_reject(spark):
    good = "the cat and the dog have fun with that ball " * 6  # 60 tokens
    short = "the cat and the dog"  # fails the 50-token floor
    bullets = "- one\n- two\n- three\nthe rest of and that have with " + (
        "word " * 50
    )
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, bullets)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality_rules(df).collect()}
    assert rows[0]["keep"] is True
    assert rows[0]["n_tokens"] == 60
    assert rows[0]["n_gopher_stopwords"] == 5  # the, and, have, with, that
    assert rows[1]["keep"] is False and rows[1]["n_tokens"] == 5
    # 3 of 4 lines are bullets -> 0.75, under the 0.9 cap; still long enough
    assert rows[2]["frac_bullet_lines"] == 0.75


def test_gopher_symbol_and_ellipsis_signals(spark):
    text = "see more... and #tag #tag " + "the of and that word " * 12
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = gopher_quality_rules(df).collect()[0]
    n_tok = r["n_tokens"]
    assert r["symbol_word_ratio"] == pytest.approx((2 + 1) / n_tok)
    assert r["frac_ellipsis_lines"] == 0.0  # '...' mid-line, not line-end


def test_int8_quantize_codes_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, [0.5, 4.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = {
        (r["vec_id"], r["dim"]): (r["code"], r["recon"])
        for r in int8_quantize(df).collect()
    }
    # dim0 absmax=1.0, dim1 absmax=4.0
    assert q[(1, 0)][0] == 127 and q[(3, 0)][0] == -127
    assert q[(2, 0)][0] == math.floor(0.5 * 127 / 1.0 + 0.5)  # 64
    assert q[(1, 1)][0] == math.floor(-2.0 * 127 / 4.0 + 0.5)  # -63
    assert q[(2, 1)] == (127, 4.0)
    assert q[(3, 1)] == (0, 0.0)


def test_int8_zero_dimension_codes_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 3.0]), (2, [0.0, -3.0])],
        "vec_id long, embedding array<double>",
    )
    rows = int8_quantize(df).filter(F.col("dim") == 0).collect()
    assert all(r["code"] == 0 and r["recon"] == 0.0 for r in rows)


def test_int8_serving_reuses_training_scales(spark):
    train = spark.createDataFrame(
        [(1, [2.0]), (2, [-4.0])], "vec_id long, embedding array<double>"
    )
    serve = spark.createDataFrame(
        [(9, [8.0])], "vec_id long, embedding array<double>"
    )
    am = embedding_absmax(train)
    q = int8_quantize(serve, absmax=am).collect()[0]
    assert q["code"] == 127  # clamped: 8.0 on a scale trained to absmax 4.0


def test_int8_report_checksums(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, [0.5, 4.0])],
        "vec_id long, embedding array<double>",
    )
    r = {x["vec_id"]: x for x in int8_reconstruction_report(df).collect()}
    assert r[1]["code_sum"] == 127 - 63 and r[1]["code_l1"] == 127 + 63
    # vec 2 quantizes exactly (0.5 -> 64/127*1.0 is inexact; 4.0 exact)
    d = 0.5 - 64 * 1.0 / 127
    assert r[2]["err_e8"] == math.floor(d * d * 1e8 + 0.5)


def test_gopher_repetition_battery_hand_checked(spark):
    from redshells_spark.text.analysis import gopher_repetition_battery

    rows = [
        (0, "a b a b a b"),      # top bigram 'a b' x3 (of 5), chars 2 ea
        (1, "x y z w v u"),      # no repetition at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_repetition_battery(df).collect()}
    # doc 0: 6 tokens, total_chars=6; bigrams: 'a␟b' x3, 'b␟a' x2 ->
    # top2 covers 3*2/6 = 1.0; 5-grams: 'a b a b a','b a b a b' unique
    assert out[0]["total_chars"] == 6
    assert out[0]["top2_char_frac"] == 1.0
    assert out[0]["dup5_char_frac"] == 0.0
    # doc 1: every bigram unique -> top bigram covers 2/6
    assert out[1]["top2_char_frac"] == pytest.approx(2 / 6)
    assert out[1]["dup5_char_frac"] == 0.0 and out[1]["dup6_char_frac"] == 0.0


def test_gopher_repetition_dup_ngram_cap(spark):
    from redshells_spark.text.analysis import gopher_repetition_battery

    # the same 5-gram repeated: dup5 coverage saturates at the 1.0 cap
    df = spark.createDataFrame(
        [(0, "a b c d e " * 4)], "doc_id long, text string"
    )
    r = gopher_repetition_battery(df).collect()[0]
    assert r["dup5_char_frac"] == 1.0
    assert r["top2_char_frac"] > 0
