"""Product quantization ANN (Jégou, Douze, Schmid, TPAMI 2011).

Completes the ANN tier (brute-force / LSH / IVF in `similarity/ann.py`)
with the compressed-domain scan: vectors are split into M subspaces,
each subvector quantized to one of ``ksub`` codewords, and a query is
answered by Asymmetric Distance Computation — one (M × ksub) distance
table per query, then every corpus vector's approximate distance is M
table lookups + a sum over its M-byte code. At 10^10 vectors this is
the difference between scanning 256-byte floats and scanning 8-byte
codes with no decode.

Determinism contract (what makes an *approximate* index oracle-checkable,
same philosophy as `ann.py:assign_to_centroids`):

- codebooks come from strided corpus vectors, not k-means RNG;
- every float64 reduction is an explicit **left fold in index order**
  (a Python loop over the subspace dims, vectorized across rows), which
  is bit-identical to DuckDB's ``list_reduce`` over ``list_transform``
  — numpy's own ``.sum()`` is pairwise-tree order and would diverge;
- argmin tie-break is lowest codeword id (numpy argmin's first-hit ==
  SQL ``row_number() ORDER BY d2, cid``);
- ADC table entries are scaled to integers with ``floor(x*1e6 + 0.5)``
  (the same expression on both engines — never ``round``, whose
  half-rule differs), so the final per-vector sum is an **integer** sum:
  order-free, exact, hashable.

Scale shape: encode is one Arrow ``mapInPandas`` pass (no shuffle);
the ADC scan is a second Arrow pass with the per-query tables broadcast
(Q × M × ksub int64 — a few KB per query) emitting only per-partition
top-k partials; one narrow window picks the global top-k. The corpus is
never joined, never shuffled wide.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def _subspace_d2(x: np.ndarray, codewords: np.ndarray) -> np.ndarray:
    """Squared L2 from each row of ``x`` (n, dsub) to each codeword
    (ksub, dsub), accumulated dim-by-dim in index order — the left-fold
    order the SQL oracle uses. → (n, ksub) float64."""
    n, dsub = x.shape
    acc = np.zeros((n, codewords.shape[0]), dtype=np.float64)
    for t in range(dsub):
        diff = x[:, t : t + 1] - codewords[None, :, t]
        acc += diff * diff
    return acc


def pq_codebooks(train_vectors: list[list[float]], num_subspaces: int) -> np.ndarray:
    """(M, ksub, dsub) codebook tensor from ``ksub`` training vectors
    (deterministic callers pass strided corpus vectors). Each training
    vector contributes its m-th subvector to subspace m's codebook."""
    cb = np.asarray(train_vectors, dtype=np.float64)
    ksub, dim = cb.shape
    if dim % num_subspaces:
        raise ValueError(f"dim {dim} not divisible by num_subspaces {num_subspaces}")
    dsub = dim // num_subspaces
    return cb.reshape(ksub, num_subspaces, dsub).transpose(1, 0, 2).copy()


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """→ (vec_id, codes array<int>): one Arrow pass, no shuffle."""
    require_columns(vectors, [id_column, vector_column])
    num_subspaces, _, dsub = codebooks.shape
    cb = codebooks  # captured read-only; Spark broadcasts the closure per task

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = _as_matrix(pdf[vector_column])
            codes = np.empty((len(pdf), num_subspaces), dtype=np.int32)
            for m in range(num_subspaces):
                d2 = _subspace_d2(x[:, m * dsub : (m + 1) * dsub], cb[m])
                codes[:, m] = np.argmin(d2, axis=1)  # first hit = lowest cid
            yield pd.DataFrame({id_column: pdf[id_column], "codes": list(codes)})

    return vectors.mapInPandas(encode, schema=f"{id_column} long, codes array<int>")


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    query_id_column: str = "query_id",
    vector_column: str = "embedding",
    id_column: str = "vec_id",
    max_queries: int = 10_000,
) -> DataFrame:
    """ADC top-k: per-query integer distance tables broadcast into one
    Arrow scan over the codes; per-partition partial top-k, then a
    single window for the global cut.

    → (query_id, vec_id, approx_d2_e6, rank) — approx squared-L2 scaled
    by 1e6 as int64, ascending = nearest.
    """
    require_columns(queries, [query_id_column, vector_column])
    num_subspaces, ksub, dsub = codebooks.shape

    rows = queries.select(query_id_column, vector_column).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"pq_adc_topk: query side exceeds max_queries={max_queries}; "
            "shard the queries or raise the cap explicitly"
        )
    if not rows:
        return codes.sparkSession.createDataFrame(
            [], f"{query_id_column} long, {id_column} long, approx_d2_e6 long, rank long"
        )
    qids = np.array([r[query_id_column] for r in rows], dtype=np.int64)
    qvecs = np.stack([np.asarray(r[vector_column], dtype=np.float64) for r in rows])

    # distance tables, scaled to int64 with floor(x*1e6 + 0.5) — the
    # literal expression the oracle uses; integer sums are order-free
    dt = np.empty((len(qids), num_subspaces, ksub), dtype=np.int64)
    for m in range(num_subspaces):
        d2 = _subspace_d2(qvecs[:, m * dsub : (m + 1) * dsub], codebooks[m])
        dt[:, m, :] = np.floor(d2 * 1_000_000.0 + 0.5).astype(np.int64)

    marange = np.arange(num_subspaces)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy())  # (n, M) int
            ids = pdf[id_column].to_numpy()
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qids)):
                dist = dt[qi][marange[None, :], c].sum(axis=1)  # int64 exact
                take = min(k, len(dist))
                # (dist, id) lexicographic — partial cut must break ties
                # exactly like the final window, or a boundary tie could
                # evict the row the oracle keeps
                part = np.lexsort((ids, dist))[:take]
                out_q.append(np.full(take, qids[qi]))
                out_v.append(ids[part])
                out_d.append(dist[part])
            yield pd.DataFrame(
                {
                    query_id_column: np.concatenate(out_q),
                    id_column: np.concatenate(out_v),
                    "approx_d2_e6": np.concatenate(out_d),
                }
            )

    partials = codes.mapInPandas(
        scan, schema=f"{query_id_column} long, {id_column} long, approx_d2_e6 long"
    )
    w = Window.partitionBy(query_id_column).orderBy(
        F.col("approx_d2_e6").asc(), F.col(id_column).asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_column, id_column, "approx_d2_e6", F.col("rank").cast("long").alias("rank"))
    )


def _centroid_d2(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, ncent) squared L2, accumulated dim-by-dim (left-fold order —
    matches `ann.assign_to_centroids`'s aggregate and the SQL oracle)."""
    n, dim = x.shape
    acc = np.zeros((n, centroids.shape[0]), dtype=np.float64)
    for t in range(dim):
        diff = x[:, t : t + 1] - centroids[None, :, t]
        acc += diff * diff
    return acc


def ivfpq_encode(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """IVF-PQ index build: one Arrow pass assigns each vector to its
    nearest coarse centroid and PQ-encodes the RESIDUAL (x − centroid)
    — the Faiss ``IVFx,PQy`` layout. → (vec_id, cid, codes array<int>),
    8+4 bytes per vector instead of 4·dim. No shuffle."""
    num_subspaces, _, dsub = codebooks.shape
    cents = np.asarray(centroids, dtype=np.float64)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = _as_matrix(pdf[vector_column])
            d2 = _centroid_d2(x, cents)
            cid = np.argmin(d2, axis=1)  # first hit = lowest cid on ties
            res = x - cents[cid]
            codes = np.empty((len(pdf), num_subspaces), dtype=np.int32)
            for m in range(num_subspaces):
                sd = _subspace_d2(res[:, m * dsub : (m + 1) * dsub], codebooks[m])
                codes[:, m] = np.argmin(sd, axis=1)
            yield pd.DataFrame(
                {
                    id_column: pdf[id_column],
                    "cid": cid.astype(np.int64),
                    "codes": list(codes),
                }
            )

    return vectors.mapInPandas(
        encode, schema=f"{id_column} long, cid long, codes array<int>"
    )


def ivfpq_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    query_id_column: str = "query_id",
    vector_column: str = "embedding",
    id_column: str = "vec_id",
    max_queries: int = 10_000,
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` nearest cells per query and
    ADC-scan only those cells' codes, with a distance table computed on
    the query's residual AGAINST EACH PROBED CENTROID (residual space
    is per-cell). Integer-scaled tables → order-free exact sums, same
    determinism contract as :func:`pq_adc_topk`.

    → (query_id, vec_id, approx_d2_e6, rank). The scan filters
    ``cid ∈ probed cells`` first, so at scale the inverted-list
    partition pruning does its job before any Python runs.
    """
    num_subspaces, ksub, dsub = codebooks.shape
    cents = np.asarray(centroids, dtype=np.float64)

    rows = queries.select(query_id_column, vector_column).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(f"ivfpq_topk: query side exceeds max_queries={max_queries}")
    if not rows:
        return index.sparkSession.createDataFrame(
            [], f"{query_id_column} long, {id_column} long, approx_d2_e6 long, rank long"
        )
    qids = np.array([r[query_id_column] for r in rows], dtype=np.int64)
    qvecs = np.stack([np.asarray(r[vector_column], dtype=np.float64) for r in rows])

    qd2 = _centroid_d2(qvecs, cents)
    # probe order: (distance, cid) ascending — ties resolved like the
    # oracle's row_number
    probe = np.lexsort((np.tile(np.arange(cents.shape[0]), (len(qids), 1)), qd2), axis=1)[
        :, :nprobe
    ]
    # per (query, probed cell): integer distance table over the query's
    # residual in that cell's frame
    dt: dict[tuple[int, int], np.ndarray] = {}
    for qi in range(len(qids)):
        for cell in probe[qi]:
            res = qvecs[qi] - cents[cell]
            tbl = np.empty((num_subspaces, ksub), dtype=np.int64)
            for m in range(num_subspaces):
                d2 = _subspace_d2(res[None, m * dsub : (m + 1) * dsub], codebooks[m])[0]
                tbl[m] = np.floor(d2 * 1_000_000.0 + 0.5).astype(np.int64)
            dt[(qi, int(cell))] = tbl
    probed_cells = sorted({int(c) for qi in range(len(qids)) for c in probe[qi]})
    marange = np.arange(num_subspaces)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cid = pdf["cid"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy())
            ids = pdf[id_column].to_numpy()
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qids)):
                for cell in probe[qi]:
                    mask = cid == cell
                    if not mask.any():
                        continue
                    c = codes[mask]
                    dist = dt[(qi, int(cell))][marange[None, :], c].sum(axis=1)
                    cut = min(k, len(dist))
                    part = np.lexsort((ids[mask], dist))[:cut]
                    out_q.append(np.full(cut, qids[qi]))
                    out_v.append(ids[mask][part])
                    out_d.append(dist[part])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    query_id_column: np.concatenate(out_q),
                    id_column: np.concatenate(out_v),
                    "approx_d2_e6": np.concatenate(out_d),
                }
            )

    pruned = index.filter(F.col("cid").isin(probed_cells))
    partials = pruned.mapInPandas(
        scan, schema=f"{query_id_column} long, {id_column} long, approx_d2_e6 long"
    )
    w = Window.partitionBy(query_id_column).orderBy(
        F.col("approx_d2_e6").asc(), F.col(id_column).asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_column, id_column, "approx_d2_e6", F.col("rank").cast("long").alias("rank"))
    )
