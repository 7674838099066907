"""Round-7 batch-8: forecasting / layout / eval invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_holt_recurrence_matches_python(spark):
    from redshells_spark.operators.markov import _round_half_up as rhu
    from redshells_spark.queries import QUERIES

    rows = QUERIES["holt_linear_forecast"](spark, SF).collect()
    assert len(rows) >= 3
    # replay the recurrence from the emitted (t, v) series
    l = float(rows[0]["v"])
    b = float(rows[1]["v"] - rows[0]["v"])
    assert rows[0]["level"] == l and rows[0]["trend"] == b
    for r in rows[1:]:
        l_new = rhu(0.3 * float(r["v"]) + 0.7 * (l + b), 10)
        b = rhu(0.1 * (l_new - l) + 0.9 * b, 10)
        l = l_new
        assert r["level"] == l and r["trend"] == b
        assert r["fcst_next"] == rhu(l + b, 10)


def test_zonemap_date_layout_prunes_key_layout_does_not(spark):
    from redshells_spark.queries import QUERIES

    rows = {r["layout"]: r for r in QUERIES["zonemap_prune_report"](spark, SF).collect()}
    assert set(rows) == {"key_clustered", "date_clustered"}
    for r in rows.values():
        assert 0 < r["avg_scan_fraction_e6"] <= 1_000_000
    # the whole point: clustering on the predicate column prunes
    assert (
        rows["date_clustered"]["avg_scan_fraction_e6"]
        < rows["key_clustered"]["avg_scan_fraction_e6"]
    )
    # key-clustered chunks span the full date range -> almost no pruning
    assert rows["key_clustered"]["avg_scan_fraction_e6"] > 900_000


def test_doc_length_emd_symmetric_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["doc_length_emd_by_source"](spark, SF).collect()
    n_src = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    k = len(set(np.asarray(n_src["source"]).tolist()))
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["emd_e6"] <= 1_000_000


def test_vocab_oov_rate_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["vocab_oov_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_rate_e6"] <= 1_000_000
        assert r["oov_tokens"] <= r["n_tokens"]
        assert r["oov_types"] <= r["oov_tokens"] or r["oov_tokens"] == 0


def test_effect_sizes_consistent(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["effect_size_by_segment"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # |g| < |d| (J correction shrinks toward 0) unless d == 0
        if r["cohen_d"] != 0.0:
            assert abs(r["hedges_g"]) < abs(r["cohen_d"]) + 1e-9
        assert abs(r["cohen_d"]) < 2.0  # segments are near-identical mixes


def test_mcc_scan_best_flag_and_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["mcc_threshold_scan"](spark, SF).collect()
    assert sum(r["is_best"] for r in rows) == 1
    best = max(r["mcc"] for r in rows)
    for r in rows:
        assert -1.0 <= r["mcc"] <= 1.0
        assert r["tp"] + r["fn"] == rows[0]["tp"] + rows[0]["fn"]  # p_total
        if r["is_best"]:
            assert r["mcc"] == best
