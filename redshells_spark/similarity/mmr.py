"""Maximal Marginal Relevance (MMR) diversity re-ranking.

Carbonell & Goldstein 1998 ("The use of MMR, diversity-based reranking
for reordering documents and producing summaries", SIGIR '98): given a
relevance-ranked candidate list, greedily pick the item maximizing

    MMR(c) = λ · rel(c) − (1 − λ) · max_{s ∈ selected} sim(c, s)

so the final top-k trades relevance against redundancy — the standard
post-ANN re-rank in retrieval serving (and the "diverse exemplars"
step in few-shot selection pipelines).

Spark-first decomposition:
- candidate sets are small per query BY CONSTRUCTION (the output of a
  top-N ANN stage — :func:`redshells_spark.similarity.ann.
  brute_force_topk` / ``lsh_topk`` / ``ivf_topk``), so the pairwise
  similarity matrix is N² per query, bounded and embarrassingly
  parallel across queries;
- pairwise similarities are computed JVM-side (the same codegen cosine
  the ANN tier uses) and integerized to 1e-4 units, so the greedy loop
  — the one part Spark's relational algebra cannot express — runs on
  EXACT int64 scores inside an Arrow ``applyInPandas`` per query
  group: no float comparison ever decides a pick, which makes the
  selection bit-reproducible across engines and partition orders;
- the greedy loop is O(k·N) per query with numpy int64 ops.

At 100 TB the re-rank cost scales with (queries × N²) independent of
corpus size; the ANN stage in front is what touches the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import cosine_similarity
from redshells_spark.schema import require_columns

_OUT_SCHEMA = "query_id long, vec_id long, rank long, mmr_score_e5 long"


def _greedy_mmr(pdf: pd.DataFrame, k: int, lambda10: int) -> pd.DataFrame:
    """Integer-exact greedy MMR over one query's candidate pairs."""
    ids = np.unique(pdf["a_id"].to_numpy())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    rel = np.zeros(n, dtype=np.int64)
    sim = np.zeros((n, n), dtype=np.int64)
    a = pdf["a_id"].map(idx).to_numpy()
    b = pdf["b_id"].map(idx).to_numpy()
    sim[a, b] = pdf["sim_e4"].to_numpy(dtype=np.int64)
    rel[a] = pdf["rel_e4"].to_numpy(dtype=np.int64)
    lam, mu = int(lambda10), 10 - int(lambda10)
    picked: list[int] = []
    scores: list[int] = []
    remaining = np.ones(n, dtype=bool)
    # max sim to the picked set — None while the set is empty (the
    # first pick has NO diversity term; clamping at 0 would be wrong
    # because the true max over picked can be negative cosine)
    max_sim: np.ndarray | None = None
    for _ in range(min(k, n)):
        mmr = lam * rel if max_sim is None else lam * rel - mu * max_sim
        # argmax with vec_id-ascending tie-break: ids is sorted, and
        # np.argmax returns the first (lowest-index) maximum
        mmr_masked = np.where(remaining, mmr, np.iinfo(np.int64).min)
        best = int(np.argmax(mmr_masked))
        picked.append(best)
        scores.append(int(mmr_masked[best]))
        remaining[best] = False
        col = sim[:, best]
        max_sim = col.copy() if max_sim is None else np.maximum(max_sim, col)
    qid = int(pdf["query_id"].iloc[0])
    return pd.DataFrame(
        {
            "query_id": np.full(len(picked), qid, dtype=np.int64),
            "vec_id": ids[picked].astype(np.int64),
            "rank": np.arange(1, len(picked) + 1, dtype=np.int64),
            "mmr_score_e5": np.asarray(scores, dtype=np.int64),
        }
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lambda10: int = 7,
    query_column: str = "query_id",
    id_column: str = "vec_id",
    rel_e4_column: str = "rel_e4",
    embedding_column: str = "embedding",
) -> DataFrame:
    """→ (query_id, vec_id, rank, mmr_score_e5): the greedy MMR top-k
    per query over ``candidates`` (one row per (query, candidate) with
    an integer 1e-4-unit relevance and the candidate's embedding).

    ``lambda10`` is λ in tenths (7 → λ = 0.7); the reported score is
    ``lambda10·rel_e4 − (10−lambda10)·max_sim_e4`` in 1e-5 units —
    pure int64, so results are engine- and order-independent. Ids must
    be integer-typed (the Arrow contract pins int64)."""
    require_columns(
        candidates, [query_column, id_column, rel_e4_column, embedding_column]
    )
    if not 0 <= int(lambda10) <= 10:
        raise ValueError(f"lambda10 must be in [0, 10], got {lambda10}")
    c = candidates.select(
        F.col(query_column).cast("long").alias("query_id"),
        F.col(id_column).cast("long").alias("a_id"),
        F.col(rel_e4_column).cast("long").alias("rel_e4"),
        F.col(embedding_column).alias("__ea"),
    )
    other = candidates.select(
        F.col(query_column).cast("long").alias("query_id"),
        F.col(id_column).cast("long").alias("b_id"),
        F.col(embedding_column).alias("__eb"),
    )
    # N² candidate pairs per query (the a=b diagonal rides along so
    # singleton groups survive; the greedy loop never consults it
    # because a picked item leaves `remaining`)
    pairs = c.join(other, on="query_id").select(
        "query_id",
        "a_id",
        "b_id",
        "rel_e4",
        F.round(cosine_similarity("__ea", "__eb") * 10000, 0)
        .cast("long")
        .alias("sim_e4"),
    )
    return pairs.groupBy("query_id").applyInPandas(
        lambda pdf: _greedy_mmr(pdf, k, lambda10), schema=_OUT_SCHEMA
    )
