"""Metric gates for every rows-only registry query (round-4 mandate).

The 14 queries without a DuckDB oracle (engine RNG / MLlib fits) each
get a threshold-asserted quality check ON THE REGISTRY OUTPUT itself,
so "rows-only" still carries a correctness signal: RMSE/AUC/accuracy
against re-derived labels, norm/sparsity/simplex invariants for
embedding outputs. Thresholds were probed at sf0.001 with the pinned
seeds and set with safety margin; the GCMC RMSE < 0.7 gate mirrors the
reference's own test
(test/contrib/model/test_graph_convolutional_matrix_completion.py:39-48).

Where the synthetic corpus gives a model no real signal (LR on
independent lineitem columns, FM on a near-constant label), the gate is
"no worse than the majority-class baseline" — an honest floor that
still catches broken training/inference plumbing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redshells_spark.queries import get_queries

# measured >=10s in the round-9 duration profile (pytest.ini tiering)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return get_queries()


def _auc(y, s) -> float:
    y = np.asarray(y)
    ranks = pd.Series(np.asarray(s, dtype=float)).rank().values
    npos = int((y == 1).sum())
    assert 0 < npos < len(y)
    return float(
        (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * (len(y) - npos))
    )


# ------------------------------------------------- embedding-table gates


def test_word2vec_vectors_norms(spark, qs):
    rows = qs["word2vec_vectors"](spark, SF).collect()
    assert len(rows) == 31  # full synthetic vocab
    norms = [math.sqrt(sum(x * x for x in r["vector"])) for r in rows]
    assert all(np.isfinite(norms)) and min(norms) > 1e-3
    assert len({len(r["vector"]) for r in rows}) == 1


def test_doc2vec_vectors_l1(spark, qs):
    rows = qs["doc2vec_vectors"](spark, SF).collect()
    assert len(rows) == 50
    assert all(np.isfinite(r["l1_norm"]) and r["l1_norm"] > 0 for r in rows)


def test_fasttext_oov_vectors_cover_oov(spark, qs):
    rows = {r["word"]: r for r in qs["fasttext_oov_vectors"](spark, SF).collect()}
    assert set(rows) == {"spark", "window", "sparkly", "windowing", "quuxzilch"}
    # composed subword vectors must exist for OOV words too
    assert all(r["l1_norm"] > 0 for r in rows.values())
    assert rows["quuxzilch"]["oov"] and not rows["spark"]["oov"]


def test_scdv_doc_vectors_sparse_and_finite(spark, qs):
    rows = qs["scdv_doc_vectors"](spark, SF).collect()
    assert len(rows) == 500
    flat = np.array([x for r in rows for x in r["embedding"]])
    assert np.isfinite(flat).all()
    # SCDV hard-thresholds small entries to exactly 0 — sparsity is the
    # algorithm's signature (Mekala et al. 2017)
    assert (flat == 0.0).mean() > 0.05
    assert np.abs(flat).max() > 0.1


def test_als_item_factors_normalized(spark, qs):
    rows = qs["als_item_factors"](spark, SF).collect()
    assert len(rows) > 100
    vec_col = [c for c in rows[0].asDict() if c not in ("item_id", "id")][0]
    norms = [math.sqrt(sum(x * x for x in r[vec_col])) for r in rows]
    assert max(abs(n - 1.0) for n in norms) < 1e-5  # normalize=True contract


def test_mf_item_similarity_threshold_respected(spark, qs):
    # sf0.01 (the driver's correctness scale): sf0.001's tiny factor
    # matrix yields no pairs above the 0.95 threshold
    rows = qs["mf_item_similarity"](spark, "/root/testdata/sf0.01").collect()
    assert rows, "threshold 0.95 must keep at least some factor-similar pairs"
    sims = [r["similarity"] for r in rows]
    # query filters at 0.95; cosine bounded by 1 (+rounding slack)
    assert min(sims) >= 0.95 - 1e-9 and max(sims) <= 1.0 + 1e-4


def test_lda_doc_topics_simplex(spark, qs):
    rows = qs["lda_doc_topics"](spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:100]:
        td = list(r["topic_distribution"])
        assert len(td) == 4 and min(td) >= 0
        assert abs(sum(td) - 1.0) < 1e-6


# ------------------------------------------------- prediction-quality gates


def test_classifier_predictions_majority_floor(spark, qs):
    out = qs["classifier_predictions"](spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )
    j = out.join(li, ["l_orderkey", "l_linenumber"]).collect()
    y = np.array([r["y"] for r in j])
    p = np.array([r["prediction"] for r in j])
    base = max(y.mean(), 1 - y.mean())
    # features (qty/price/tax) carry no discount signal in the synthetic
    # data — LR must at least recover the majority class (probed: == base)
    assert (y == p).mean() >= base - 0.01


def test_fm_predictions_majority_floor(spark, qs):
    # past flake root-caused: FM summary held session->ObservationManager
    # (now stripped at the fit site) — no retry, regressions must surface
    out = qs["fm_predictions"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    j = out.join(ev, "event_id").collect()
    y = np.array([r["y"] for r in j])
    p = np.array([r["prediction"] for r in j])
    base = max(y.mean(), 1 - y.mean())
    # FM's distributed SGD is partition-order sensitive (treeAggregate
    # float sums), and the synthetic label carries no signal, so the
    # fit hovers at the majority boundary — 5% slack keeps this a
    # plumbing gate, not a modeling-skill assertion (probed: == base)
    assert set(np.unique(p)) <= {0.0, 1.0}
    assert (y == p).mean() >= base - 0.05


def test_pairwise_similarity_predictions_auc(spark, qs):
    out = qs["pairwise_similarity_predictions"](spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("item_id_0"),
            F.col("b.vec_id").alias("item_id_1"),
            F.when(F.col("a.label") == F.col("b.label"), 1).otherwise(0).alias("y"),
        )
    )
    j = out.join(pairs, ["item_id_0", "item_id_1"]).collect()
    a = _auc([r["y"] for r in j], [float(r["prediction"]) for r in j])
    # Hadamard features of same-label neighbors carry real signal
    # (probed: 0.578 with seed 42); 0.52 floor = "better than chance"
    assert a >= 0.52, a


def test_gcmc_predictions_reference_rmse_gate(spark, qs):
    rows = qs["gcmc_predictions"](spark, SF).collect()
    test_rows = [r for r in rows if not r["is_train"]]
    assert len(test_rows) > 50
    rmse = math.sqrt(
        np.mean([(r["rating"] - r["prediction"]) ** 2 for r in test_rows])
    )
    # reference gate: RMSE < 0.7 on held-out ratings
    # (test_graph_convolutional_matrix_completion.py:39-48)
    assert rmse < 0.7, rmse


def test_gcmc_feature_cold_start_finite(spark, qs):
    rows = qs["gcmc_feature_cold_start"](spark, SF).collect()
    assert len(rows) == 3
    vals = [v for r in rows for v in r.asDict().values() if isinstance(v, float)]
    assert vals and all(np.isfinite(v) for v in vals)


def test_feature_aggregation_similarity_range_and_signal(spark, qs):
    rows = qs["feature_aggregation_similarity"](spark, SF).collect()
    assert len(rows) == 400
    sims = np.array([r["similarity"] for r in rows])
    assert np.isfinite(sims).all()
    assert sims.min() >= -1.0 - 1e-4 and sims.max() <= 1.0 + 1e-4
    assert sims.std() > 0.01  # trained model must not collapse to a constant


def test_quality_classifier_scores_auc(spark, qs):
    out = qs["quality_classifier_scores"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    j = out.join(docs, "doc_id").collect()
    probs = [float(r["quality_prob"]) for r in j]
    assert min(probs) >= 0.0 and max(probs) <= 1.0
    a = _auc([r["y"] for r in j], probs)
    # weak-label LR over bag-of-words recovers the en/rest signal
    # (probed: 0.634 at sf0.001's 500-doc corpus); 0.55 floor
    assert a >= 0.55, a


def test_every_rows_only_query_is_metric_gated():
    # completeness pin: if a future round adds a rows-only query, this
    # file must grow a gate for it (or the query must gain an oracle)
    from redshells_spark.queries import get_oracles, get_queries

    rows_only = set(get_queries()) - set(get_oracles())
    gated = {
        "word2vec_vectors",
        "doc2vec_vectors",
        "fasttext_oov_vectors",
        "scdv_doc_vectors",
        "als_item_factors",
        "mf_item_similarity",
        "lda_doc_topics",
        "classifier_predictions",
        "fm_predictions",
        "pairwise_similarity_predictions",
        "gcmc_predictions",
        "gcmc_feature_cold_start",
        "feature_aggregation_similarity",
        "quality_classifier_scores",
        # round-5 session-3: gated in their own test files
        # (knn_graph_nn_descent / graph_ann_search gained exact
        # unrolled-CTE oracles in round 6 and left the rows-only set)
        "compression_ratio_signals",  # property gates, tests/test_compress.py
        # round-6: SGD-trained FastText (numpy RNG) — topic-margin +
        # OOV-composition gates, tests/test_fasttext.py
        "fasttext_sgd_oov",
    }
    assert rows_only == gated, rows_only.symmetric_difference(gated)
