"""Hard-negative mining (similarity/negatives.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.negatives import (
    hard_negatives_ann,
    hard_negatives_exact,
)


@pytest.fixture(scope="module")
def emb(spark):
    # label 0 points cluster near +x, label 1 near +y; vec 3 is a
    # label-1 vector sitting close to the label-0 cluster (the hard one)
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.8, 0.3], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_exact_picks_closest_other_label(spark, emb):
    out = {
        r["id"]: (r["neg_id"], r["neg_label"])
        for r in hard_negatives_exact(emb, k=1).collect()
    }
    # for both label-0 anchors the hard negative is vec 3, not vec 2
    assert out[0] == (3, 1) and out[1] == (3, 1)
    # for the label-1 anchors the closest label-0 vector wins
    assert out[3][1] == 0
    assert len(out) == 4


def test_exact_k2_rank_and_tiebreak(spark, emb):
    rows = [
        r
        for r in hard_negatives_exact(emb, k=2).collect()
        if r["id"] == 0
    ]
    sims = [r["similarity"] for r in sorted(rows, key=lambda r: -r["similarity"])]
    assert len(rows) == 2 and sims[0] >= sims[1]
    assert {r["neg_id"] for r in rows} == {2, 3}


def test_exact_refuses_oversize(spark, emb):
    with pytest.raises(ValueError, match="max_rows"):
        hard_negatives_exact(emb, max_rows=2)


def test_ann_path_agrees_on_toy(spark, emb):
    out = hard_negatives_ann(emb, k=1, oversample=4, num_planes=4, dim=2)
    got = {r["id"]: r["neg_id"] for r in out.collect()}
    exact = {
        r["id"]: r["neg_id"] for r in hard_negatives_exact(emb, k=1).collect()
    }
    # LSH recall on 4 vectors with generous oversample: must agree
    assert got == exact
