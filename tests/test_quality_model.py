"""Trainable quality classifier: separable corpora are separated,
scoring is distributed (no Python eval in the plan), filter composes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.text.quality_model import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)
from redshells_spark.text.tokenize import tokenize_on_space

GOOD = [
    "the history of science shows steady progress in understanding nature",
    "economic policy affects employment inflation and long term growth",
    "the novel explores memory loss and the passage of time",
    "researchers published a detailed study of ocean current patterns",
    "the committee reviewed the proposal and suggested several changes",
    "modern medicine relies on evidence from controlled clinical trials",
    "the orchestra performed a new arrangement of the classic symphony",
    "engineers designed the bridge to withstand strong seasonal winds",
]
BAD = [
    "zzz qqq xxx www zzz qqq xxx www zzz qqq",
    "click here buy now click here buy now cheap cheap",
    "aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb",
    "lorem asdf qwer zxcv lorem asdf qwer zxcv poiu",
    "win win win free free free prize prize prize now",
    "xyzzy plugh xyzzy plugh xyzzy plugh xyzzy plugh",
    "buy cheap buy cheap buy cheap buy cheap buy cheap",
    "qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    return tokenize_on_space(df, "text", "tokens", lowercase=True)


def test_classifier_separates_and_scores_distributed(spark, labeled):
    model = train_quality_classifier(labeled, num_features=1 << 12)
    scored = score_quality(model, labeled)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    good_scores = [rows[i] for i in range(len(GOOD))]
    bad_scores = [rows[100 + i] for i in range(len(BAD))]
    assert min(good_scores) > max(bad_scores)
    # scoring plan stays JVM-side (no Python eval operators)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_by_quality(spark, labeled):
    model = train_quality_classifier(labeled, num_features=1 << 12)
    kept = filter_by_quality(model, labeled, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(len(GOOD)))


def test_scores_unseen_docs(spark, labeled):
    model = train_quality_classifier(labeled, num_features=1 << 12)
    new = tokenize_on_space(
        spark.createDataFrame(
            [(1, "the study of language reveals patterns in human thought"),
             (2, "buy buy cheap cheap free prize zzz qqq www")],
            "doc_id long, text string",
        ),
        "text", "tokens", lowercase=True,
    )
    got = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, new).collect()}
    assert got[1] > got[2]
