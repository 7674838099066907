"""Token-entropy signals (text/analysis.py) hand-checked."""

from __future__ import annotations

import math

import pytest

from redshells_spark.text.analysis import token_entropy_signals


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a a a a"),          # single distinct token: H = 0
        (1, "a b c d"),          # uniform: H = ln(4), norm = 1
        (2, "a a b"),            # H = ln(3) - (2 ln 2)/3
        (3, "x"),                # one token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_entropy_values(spark, docs):
    out = {r["doc_id"]: r for r in token_entropy_signals(docs).collect()}
    assert out[0]["entropy"] == 0.0 and out[0]["norm_entropy"] == 0.0
    assert out[1]["entropy"] == pytest.approx(math.log(4))
    assert out[1]["norm_entropy"] == pytest.approx(1.0)
    assert out[2]["entropy"] == pytest.approx(math.log(3) - 2 * math.log(2) / 3)
    assert out[2]["norm_entropy"] == pytest.approx(
        out[2]["entropy"] / math.log(2)
    )
    assert out[3]["entropy"] == 0.0 and out[3]["n_tokens"] == 1


def test_entropy_counts(spark, docs):
    out = {r["doc_id"]: r for r in token_entropy_signals(docs).collect()}
    assert (out[0]["n_tokens"], out[0]["n_distinct"]) == (4, 1)
    assert (out[2]["n_tokens"], out[2]["n_distinct"]) == (3, 2)


def test_cross_source_overlap_counts(spark):
    from redshells_spark.dedup.exact import cross_source_overlap

    rows = [
        (0, "alpha beta", "s1"),
        (1, "Alpha  BETA!", "s2"),  # normalizes to the same fingerprint
        (2, "gamma delta", "s1"),
        (3, "gamma delta", "s3"),
        (4, "unique text", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_overlap(df).collect()
    }
    assert len(out) == 3  # full pair matrix for 3 sources
    assert out[("s1", "s2")]["n_shared"] == 1
    assert out[("s1", "s3")]["n_shared"] == 1
    assert out[("s2", "s3")]["n_shared"] == 0
    r = out[("s1", "s2")]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["jaccard"] == 1 / 3


def test_largest_remainder_allocation_exact(spark):
    from redshells_spark.data.sampling import largest_remainder_allocation

    counts = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 1)], "source string, n long"
    )
    out = {
        r["source"]: (r["floor_share"], r["extra"], r["allocation"])
        for r in largest_remainder_allocation(counts, 10).collect()
    }
    # ideal: a=30/7=4.29, b=4.29, c=10/7=1.43 -> floors 4,4,1 sum 9;
    # the one short unit goes to the largest remainder: c (3/7 > 2/7)
    assert out == {"a": (4, 0, 4), "b": (4, 0, 4), "c": (1, 1, 2)}
    assert sum(v[2] for v in out.values()) == 10


def test_negative_sampling_table_distribution(spark):
    from redshells_spark.data.sampling import negative_sampling_table

    toks = spark.createDataFrame(
        [("a",)] * 16 + [("b",)] * 1, "token string"
    )
    out = {r["token"]: r for r in negative_sampling_table(toks).collect()}
    # 16^0.75 = 8, 1^0.75 = 1 -> p(a) = 8/9, p(b) = 1/9: the 0.75
    # power upweights the tail vs raw frequency (16/17)
    assert out["a"]["prob"] == round(8 / 9, 4)
    assert out["b"]["prob"] == round(1 / 9, 4)
    assert out["a"]["n"] == 16
    # CDF is monotone in token order and ends at 1
    assert out["a"]["cum_prob"] <= out["b"]["cum_prob"] == 1.0
