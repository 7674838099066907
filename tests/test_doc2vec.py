"""PV-DBOW Doc2Vec: trained doc vectors must separate topic clusters
(two disjoint word sets → within-cluster cosine ≫ cross-cluster), and
infer_vector must place unseen docs near their topic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.doc2vec import Doc2Vec

TOPIC_A = ["spark", "shuffle", "executor", "partition", "catalyst", "tungsten"]
TOPIC_B = ["violin", "sonata", "orchestra", "tempo", "maestro", "crescendo"]


def _mk_docs(spark, n_per_topic=30, words_per_doc=12, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_per_topic):
        rows.append((i, [str(w) for w in rng.choice(TOPIC_A, words_per_doc)]))
        rows.append((1000 + i, [str(w) for w in rng.choice(TOPIC_B, words_per_doc)]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na and nb else 0.0


@pytest.fixture(scope="module")
def model(spark):
    return Doc2Vec.fit(
        _mk_docs(spark), vector_size=16, min_count=1, epochs=15, seed=42
    )


def test_doc_vectors_separate_topics(model):
    vecs = {r["doc_id"]: np.array(r["vector"]) for _, r in model.doc_vectors.iterrows()}
    a = [v for k, v in vecs.items() if k < 1000]
    b = [v for k, v in vecs.items() if k >= 1000]
    within = np.mean([_cos(a[i], a[j]) for i in range(10) for j in range(i + 1, 10)])
    cross = np.mean([_cos(a[i], b[j]) for i in range(10) for j in range(10)])
    assert within > cross + 0.3, (within, cross)


def test_infer_vector_places_unseen_docs(spark, model):
    unseen = spark.createDataFrame(
        [(9001, TOPIC_A * 2), (9002, TOPIC_B * 2)],
        "doc_id long, tokens array<string>",
    )
    inferred = {r["doc_id"]: np.array(r["vector"]) for r in model.infer_vector(unseen).collect()}
    vecs = {r["doc_id"]: np.array(r["vector"]) for _, r in model.doc_vectors.iterrows()}
    centroid_a = np.mean([v for k, v in vecs.items() if k < 1000], axis=0)
    centroid_b = np.mean([v for k, v in vecs.items() if k >= 1000], axis=0)
    assert _cos(inferred[9001], centroid_a) > _cos(inferred[9001], centroid_b)
    assert _cos(inferred[9002], centroid_b) > _cos(inferred[9002], centroid_a)


def test_fit_is_reproducible(spark):
    m1 = Doc2Vec.fit(_mk_docs(spark), vector_size=8, min_count=1, epochs=3, seed=9)
    m2 = Doc2Vec.fit(_mk_docs(spark), vector_size=8, min_count=1, epochs=3, seed=9)
    v1 = list(m1.doc_vectors["vector"])
    v2 = list(m2.doc_vectors["vector"])
    assert v1 == v2
