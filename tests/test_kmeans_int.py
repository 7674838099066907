"""Integer Lloyd's K-means: parity with a numpy reference of the same
integer algorithm, plus convergence/determinism properties."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.kmeans_int import (
    OFFSET,
    SCALE,
    explode_points,
    kmeans_lloyd_exact,
)


def _np_reference(x_int: np.ndarray, cent: np.ndarray, iterations: int):
    """x_int: (n, d) int64; cent: (k, d) int64 — replicate the exact
    integer algorithm: argmin d2 with cid tie-break, (2s+n)//(2n)."""
    for _ in range(iterations):
        d2 = ((x_int[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)  # argmin takes lowest index on ties
        new = []
        for c in range(cent.shape[0]):
            m = x_int[assign == c]
            if len(m):
                s = m.sum(axis=0)
                new.append((2 * s + len(m)) // (2 * len(m)))
        cent = np.array(new, dtype=np.int64)
    d2 = ((x_int[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1), d2.min(axis=1), cent


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    pts = np.vstack(
        [rng.normal(loc, 0.08, size=(30, 6)) for loc in (-0.3, 0.0, 0.35)]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    return pts, df


def test_matches_numpy_reference(spark, data):
    pts_np, df = data
    x_int = np.floor(pts_np.astype(np.float64) * SCALE + 0.5).astype(np.int64) + OFFSET
    # seeds: vectors 0, 30, 60 (one per true cluster)
    cent0 = x_int[[0, 30, 60]]
    ref_assign, ref_d2, ref_cent = _np_reference(x_int, cent0, 2)

    pts = explode_points(df)
    c0 = (
        pts.filter(F.col("vec_id").isin(0, 30, 60))
        .select(
            F.expr("vec_id div 30").alias("cid"), "dim", F.col("x").alias("c")
        )
    )
    assign, cent = kmeans_lloyd_exact(pts, c0, iterations=2)
    got = {r["vec_id"]: (r["cid"], r["d2"]) for r in assign.collect()}
    for i in range(len(x_int)):
        assert got[i] == (int(ref_assign[i]), int(ref_d2[i])), i

    got_cent = {(r["cid"], r["dim"]): r["c"] for r in cent.collect()}
    for c in range(3):
        for d in range(6):
            assert got_cent[(c, d)] == int(ref_cent[c, d])


def test_clusters_recover_ground_truth(spark, data):
    _, df = data
    pts = explode_points(df)
    c0 = pts.filter(F.col("vec_id").isin(0, 30, 60)).select(
        F.expr("vec_id div 30").alias("cid"), "dim", F.col("x").alias("c")
    )
    assign, _ = kmeans_lloyd_exact(pts, c0, iterations=3)
    rows = assign.collect()
    # well-separated blobs: every cluster recovered exactly
    by_cid = {c: {r["vec_id"] // 30 for r in rows if r["cid"] == c} for c in range(3)}
    assert by_cid == {0: {0}, 1: {1}, 2: {2}}


def test_zero_iterations_scores_against_seeds(spark, data):
    _, df = data
    pts = explode_points(df)
    c0 = pts.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("cid"), "dim", F.col("x").alias("c")
    )
    assign, cent = kmeans_lloyd_exact(pts, c0, iterations=0)
    assert assign.count() == 90
    # seed vector is exactly its own centroid
    assert assign.filter(F.col("vec_id") == 0).collect()[0]["d2"] == 0


def test_iteration_guard(spark, data):
    _, df = data
    pts = explode_points(df)
    with pytest.raises(ValueError, match="iterations"):
        kmeans_lloyd_exact(pts, pts.limit(0), iterations=-1)


def test_arrow_assignment_bit_identical_to_relational(spark, data):
    from redshells_spark.ml.kmeans_int import _assign, assign_arrow

    _, df = data
    pts = explode_points(df)
    c0 = pts.filter(F.col("vec_id").isin(0, 30, 60)).select(
        F.expr("vec_id div 30").alias("cid"), "dim", F.col("x").alias("c")
    )
    _, cent = kmeans_lloyd_exact(pts, c0, iterations=2)
    rel = {r["vec_id"]: (r["cid"], r["d2"]) for r in _assign(pts, cent).collect()}
    arw = {r["vec_id"]: (r["cid"], r["d2"]) for r in assign_arrow(df, cent).collect()}
    assert rel == arw
