"""Round-7 batch-5: clustering-agreement, calibration, inequality
invariants and identity checks."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


def test_ari_bounds_and_identity(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["adjusted_rand_index"](spark, SF).collect()[0]
    assert -1.0 <= r["ari"] <= 1.0
    # pair-count identities
    assert r["sum_ij"] <= min(r["sum_a"], r["sum_b"])


def test_nmi_bounds_and_entropy_sanity(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["nmi_clusterings"](spark, SF).collect()[0]
    assert 0.0 <= r["nmi"] <= 1.0 + 1e-9
    # MI bounded by each entropy
    assert r["mutual_info"] <= min(r["h_labels"], r["h_buckets"]) + 1e-6
    # 8 buckets / 25 labels: entropies bounded by ln of cardinality
    assert r["h_buckets"] <= math.log(8) + 1e-6


def test_silhouette_bounds_and_coverage(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["centroid_silhouette"](spark, SF).collect()
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_points"] for r in rows) == emb_n
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_spiegelhalter_uncalibrated_scorer_rejects(spark):
    # the LCG scorer is uniform noise vs a ~1/5 base rate: the global
    # calibration test must reject decisively on 1000+ events
    from redshells_spark.queries import QUERIES

    r = QUERIES["spiegelhalter_z"](spark, SF).collect()[0]
    assert r["reject_005"] == 1
    assert abs(r["z"]) > 2


def test_theil_atkinson_nonneg_and_ordering(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["theil_atkinson_inequality"](spark, SF).collect()[0]
    assert r["theil_t"] >= 0.0
    assert 0.0 <= r["atkinson_1"] < 1.0
