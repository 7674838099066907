"""DSIR importance resampling (data/dsir.py) and the portable
multimodal decode path (multimodal/binary_ops.py md5chain)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.data.dsir import (
    dsir_log_weights,
    dsir_select_top,
    hashed_ngram_buckets,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # raw corpus is 'bb'-heavy; the target slice is 'aa'-heavy, so a
    # pure-'aa' doc must out-weigh a pure-'bb' doc under any hashing
    rows = [
        (0, "aa aa aa aa", True),
        (1, "aa aa bb cc", True),
        (2, "bb bb bb bb", False),
        (3, "bb bb bb cc", False),
        (4, "aa aa aa cc", False),  # target-like but not in target
        (5, "bb cc bb bb", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_hashed_buckets_count_tokens(spark, corpus):
    feats = hashed_ngram_buckets(corpus, num_buckets=16)
    per_doc = {
        r["doc_id"]: r["total"]
        for r in feats.groupBy("doc_id").agg(F.sum("n").alias("total")).collect()
    }
    assert per_doc == {i: 4 for i in range(6)}
    assert feats.filter((F.col("bucket") < 0) | (F.col("bucket") >= 16)).count() == 0


def test_hashed_buckets_bigrams(spark, corpus):
    feats = hashed_ngram_buckets(corpus, num_buckets=16, ngram=2)
    per_doc = {
        r["doc_id"]: r["total"]
        for r in feats.groupBy("doc_id").agg(F.sum("n").alias("total")).collect()
    }
    assert per_doc == {i: 3 for i in range(6)}  # 4 tokens -> 3 bigrams


def test_dsir_weights_prefer_target_like_docs(spark, corpus):
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            corpus, F.col("is_t"), num_buckets=16
        ).collect()
    }
    assert len(w) == 6
    # target-distribution docs score above raw-typical docs, and the
    # out-of-target but target-LIKE doc 4 also scores high (the whole
    # point of importance weighting: select by content, not membership)
    assert w[0] > w[2] and w[4] > w[2] and w[1] > w[3]


def test_dsir_select_top_deterministic(spark, corpus):
    w = dsir_log_weights(corpus, F.col("is_t"), num_buckets=16)
    kept = {
        r["doc_id"] for r in dsir_select_top(w, 2).filter("keep").collect()
    }
    assert kept == {0, 4}  # the two aa-heavy docs


# ------------------------------------------------ portable decode stub


def test_portable_decode_matches_hand_md5():
    from redshells_spark.multimodal.binary_ops import _portable_decode

    payload = b"hello|world"
    img = _portable_decode(payload, 8, 8)
    want = (
        hashlib.md5(payload + b"|px|0").digest()
        + hashlib.md5(payload + b"|px|1").digest()
        + hashlib.md5(payload + b"|px|2").digest()
        + hashlib.md5(payload + b"|px|3").digest()
    )
    assert img.shape == (8, 8) and img.dtype == np.uint8
    assert bytes(img.ravel().tobytes()) == want[:64]


def test_decode_images_md5chain_features(spark):
    from redshells_spark.multimodal.binary_ops import (
        decode_images,
        extract_image_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"xyz"))],
        "item_id long, payload binary",
    )
    decoded = decode_images(df, height=8, width=8, pixel_source="md5chain")
    feats = {
        r["item_id"]: r["embedding"]
        for r in extract_image_features(decoded, feature_dim=16).collect()
    }
    # hand-compute feature 0 of item 1: mean of first 4 md5 bytes / 255
    b4 = hashlib.md5(b"abc|px|0").digest()[:4]
    assert feats[1][0] == (sum(b4) / 4) / 255
    assert len(feats[1]) == 16 and feats[1] != feats[2]


def test_sample_video_frames_short_payload(spark):
    from redshells_spark.multimodal.binary_ops import sample_video_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"ab"))], "item_id long, payload binary"
    )
    rows = sorted(
        sample_video_frames(df, num_frames=4).collect(),
        key=lambda r: r["frame_idx"],
    )
    # len=2 -> step=1: frames 'a','b', then the documented \x00 fallback
    assert [bytes(r["frame_payload"]) for r in rows] == [
        b"a", b"b", b"\x00", b"\x00",
    ]


def test_pool_frame_features_mean(spark):
    from redshells_spark.multimodal.binary_ops import pool_frame_features

    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (1, [3.0, 5.0]), (2, [2.0, 2.0])],
        "video_id long, embedding array<double>",
    )
    out = {
        (r["video_id"], r["feature_idx"]): r["value"]
        for r in pool_frame_features(df).collect()
    }
    assert out == {(1, 0): 2.0, (1, 1): 4.0, (2, 0): 2.0, (2, 1): 2.0}
