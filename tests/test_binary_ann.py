"""Binary quantization + Hamming retrieval (similarity/binary.py)
against a numpy bit-packing reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.binary import (
    BITS_PER_WORD,
    binary_quantize,
    hamming_topk,
)

DIM = 40  # deliberately not a multiple of 32: exercises the ragged last word


def _ref_words(vec):
    words = [0, 0]
    for i, x in enumerate(vec):
        if x > 0:
            words[i // BITS_PER_WORD] |= 1 << (i % BITS_PER_WORD)
    return words


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(60)]
    # adversarial rows: zeros (no bits), all-positive (all bits)
    vecs.append((100, [0.0] * DIM))
    vecs.append((101, [1.0] * DIM))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    return vecs, df


def test_codes_match_numpy_reference(corpus):
    vecs, df = corpus
    got = {r["vec_id"]: (list(r["words"]), r["n_pos"]) for r in binary_quantize(df, dim=DIM).collect()}
    for vid, v in vecs:
        words = _ref_words(v)
        n_pos = sum(bin(w).count("1") for w in words)
        assert got[vid] == (words, n_pos), vid
    assert got[100] == ([0, 0], 0)
    assert got[101][1] == DIM  # every component positive -> DIM bits set


def test_hamming_topk_matches_brute_force(corpus):
    vecs, df = corpus
    codes = binary_quantize(df, dim=DIM).drop("n_pos")
    queries = codes.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rn"]): (r["vec_id"], r["hamming"])
        for r in hamming_topk(codes, queries, n_words=2, k=3).collect()
    }
    packed = {vid: _ref_words(v) for vid, v in vecs}
    for qid in range(5):
        qw = packed[qid]
        dists = sorted(
            (sum(bin(w ^ u).count("1") for w, u in zip(cw, qw)), vid)
            for vid, cw in packed.items()
        )
        for rank, (d, vid) in enumerate(dists[:3], start=1):
            assert got[(qid, rank)] == (vid, d), (qid, rank)


def test_hamming_approximates_angle(corpus):
    # Charikar bound sanity: normalized Hamming ~ theta/pi, so the
    # nearest non-self neighbor by Hamming should correlate with high
    # cosine. Check the self-match is always rank 1 at distance 0.
    vecs, df = corpus
    codes = binary_quantize(df, dim=DIM).drop("n_pos")
    top = hamming_topk(codes, codes.filter(F.col("vec_id") < 10), n_words=2, k=1)
    for r in top.collect():
        assert r["vec_id"] == r["query_id"] and r["hamming"] == 0
