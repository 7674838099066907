"""k-anonymity / l-diversity audit."""

from __future__ import annotations

import pytest

from redshells_spark.operators.privacy import equivalence_classes, k_anonymity_audit

ROWS = [
    # (zip, age_band, diagnosis)
    ("100", "20s", "flu"),
    ("100", "20s", "flu"),
    ("100", "20s", "cold"),
    ("200", "30s", "flu"),      # class of 1 -> k<2 violation
    ("300", "40s", "cold"),
    ("300", "40s", "cold"),     # k ok but single sensitive value -> l<2
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, "zip string, age string, diag string")


def test_equivalence_classes(spark, df):
    got = {
        (r["zip"], r["age"]): (r["n_rows"], r["n_sensitive"])
        for r in equivalence_classes(df, ["zip", "age"], "diag").collect()
    }
    assert got == {("100", "20s"): (3, 2), ("200", "30s"): (1, 1), ("300", "40s"): (2, 1)}


def test_k_anonymity_audit(spark, df):
    r = k_anonymity_audit(df, ["zip", "age"], k=2, sensitive_col="diag").collect()[0]
    assert r["n_classes"] == 3
    assert r["k_violating_classes"] == 1
    assert r["rows_at_risk"] == 1
    assert abs(r["risk_share"] - round(1 / 6, 6)) < 1e-9
    # ("200","30s") has 1 distinct diag, ("300","40s") has 1 -> 2 l-failures
    assert r["l_violating_classes"] == 2


def test_k_anonymity_all_pass(spark, df):
    r = k_anonymity_audit(df, ["zip", "age"], k=1).collect()[0]
    assert r["k_violating_classes"] == 0 and r["rows_at_risk"] == 0


def test_guards(spark, df):
    with pytest.raises(ValueError, match="quasi_cols"):
        equivalence_classes(df, [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_audit(df, ["zip"], k=0)
