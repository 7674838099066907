"""Distributed Lloyd's K-means with bit-exact integer arithmetic.

MLlib's KMeans is the production default, but its RNG init and float
reductions make every fit engine-private — the driver can only ever
rows-check it. This variant makes the *algorithm itself* part of the
exact correctness contract (same discipline as pagerank / IVF-PQ):

- components are fixed-point integers: ``floor(x·1e6 + 0.5) + OFFSET``
  — the offset keeps every value non-negative so truncating integer
  division (Spark ``div`` == DuckDB ``//`` on non-negative operands)
  IS floor division, and ``round(s/n)`` becomes the exact
  ``(2s + n) div 2n``;
- distances are int64 sums of squared diffs (≤ 64 dims × (1e6)² ≈
  6.4e13 — comfortably inside int64 *and* exact-double range);
- assignment ties break on (distance, cid); every update is integer,
  so two engines produce identical centroids at every iteration.

Shapes: points live EXPLODED as (vec_id, dim, x) — the sparse-matrix
formulation of Lloyd's. Assignment is one broadcast join of the (tiny)
centroid relation + one map-side-combined aggregate per (vec, cid);
the centroid update is one aggregate per (cid, dim). Lineage is cut
per iteration (``localCheckpoint``), the same superstep pattern as
``operators/graph.py``. At dense-BLAS scale the Arrow batch-matmul
variant (``similarity/ann.py`` shapes) is the faster assignment path;
this formulation is the one an exact cross-engine contract can hold.

Empty clusters die (no members → no update row) — deterministically,
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
OFFSET = 4_000_000  # > max|x|·SCALE for unit-ish embeddings: keeps ints ≥ 0


def explode_points(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, dim, x): fixed-point exploded view of a vector column."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    ).select(
        "vec_id",
        "dim",
        (
            F.floor(F.col("__v").cast("double") * SCALE + F.lit(0.5)).cast("long")
            + OFFSET
        ).alias("x"),
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    d2 = (
        pts.join(F.broadcast(cent), on="dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return d2.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).select(
        "vec_id", "cid", "d2"
    )


def kmeans_lloyd_exact(
    pts: DataFrame, init_centroids: DataFrame, iterations: int
) -> tuple[DataFrame, DataFrame]:
    """→ (assignment, centroids) after ``iterations`` integer Lloyd
    updates from ``init_centroids`` (cid, dim, c). The returned
    assignment is computed against the FINAL centroids and carries the
    exact int64 squared distance (inertia terms)."""
    if iterations < 0:
        raise ValueError("kmeans_lloyd_exact: iterations must be >= 0")
    cent = init_centroids.select("cid", "dim", "c")
    for _ in range(iterations):
        assign = _assign(pts, cent)
        cent = (
            pts.join(assign.select("vec_id", "cid"), on="vec_id")
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid",
                "dim",
                F.expr("(2 * s + n) div (2 * n)").alias("c"),  # exact round(s/n), s,n>0
            )
            .localCheckpoint(eager=True)
        )
    return _assign(pts, cent), cent


def assign_arrow(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense scale path for the assignment step: broadcast the (tiny)
    centroid matrix, one Arrow batch pass over the vectors, numpy
    int64 matmul-free distance argmin — no per-point explode, no
    (vec × centroid) shuffle. Bit-identical to :func:`_assign` on the
    exploded relation (same fixed-point ints, same (d2, cid)
    tie-break; pinned in tests), so the oracle-checked relational
    formulation certifies this one.

    → (vec_id, cid, d2)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    crows = centroids.orderBy("cid", "dim").collect()
    cids = sorted({r["cid"] for r in crows})
    dims = sorted({r["dim"] for r in crows})
    cmat = np.zeros((len(cids), len(dims)), dtype=np.int64)
    cid_index = {c: i for i, c in enumerate(cids)}
    for r in crows:
        cmat[cid_index[r["cid"]], r["dim"]] = r["c"]
    bc = spark.sparkContext.broadcast((np.array(cids, dtype=np.int64), cmat))

    def batches(it):
        cid_arr, cm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf["__x"].to_numpy()).astype(np.int64)
            # (n, k) int64 squared distances — exact, no float path
            d2 = ((x[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            best = d2.argmin(axis=1)  # ties -> lowest index == lowest cid
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cid_arr[best],
                    "d2": d2[np.arange(len(best)), best],
                }
            )

    scaled = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda v: (
                F.floor(v.cast("double") * SCALE + F.lit(0.5)).cast("long") + OFFSET
            ),
        ).alias("__x"),
    )
    return scaled.mapInPandas(batches, "vec_id long, cid long, d2 long")
