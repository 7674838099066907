"""Distributed PageRank via relational power iteration.

Second iterative-graph operator next to
`dedup/minhash.py:connected_components_dedup` (hash-min + pointer
doubling). PageRank is the classic "iterate a join until convergence"
workload; expressed relationally each step is

    r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} r_t(u) / deg(u)

i.e. ONE join (edges × current ranks, co-partitioned on the source
key) and ONE aggregation (sum per destination) — both standard
shuffles Catalyst/AQE can plan, no driver-side adjacency structures.

Scale shape:

- the edge list is the only large relation; degrees are computed once
  and joined in (at 1000 executors this is the same edges-shuffle
  every distributed PageRank does — Pregel included);
- lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
  iterations, the same guard the connected-components loop needed:
  without it the plan doubles per iteration and the optimizer chokes
  long before the data does;
- callers that need determinism across engines pass ``round_digits``:
  double summation is order-dependent (~1e-17 noise per step), and
  rounding each iterate to 10-12 decimals makes the fixpoint
  bit-reproducible — this is what lets the DuckDB oracle unroll the
  same iterations as CTEs and hash-MATCH (queries.py:pagerank_suppliers).

Dangling nodes: callers should symmetrize the edge list (or otherwise
guarantee every node has out-degree ≥ 1); with dangling nodes the
redistribution term would need a per-iteration global sum — supported
nowhere in the oracle, so the operator asserts instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of a directed edge list: E ∪ Eᵀ, deduplicated.
    Guarantees out-degree ≥ 1 for every node that appears at all."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).dropDuplicates()


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_digits: int | None = 10,
    checkpoint_every: int = 5,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """→ (node, rank) after ``iterations`` synchronous power steps from
    the uniform vector. ``edges`` must be (src, dst) with every node
    having out-degree ≥ 1 (see :func:`symmetrize_edges`; callers that
    just symmetrized can pass ``assume_no_dangling=True`` to skip the
    verification pass)."""
    # materialize the (edge ⋈ degree) relation once — every iteration
    # reuses it, and without the checkpoint Spark would re-run the
    # caller's whole upstream plan (joins, dedups) per iteration
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    wedges = edges.join(deg, on="src").localCheckpoint(eager=True)

    nodes = wedges.select(F.col("src").alias("node")).dropDuplicates()
    if not assume_no_dangling:
        # every dst must also appear as a src
        dangling = (
            wedges.select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(nodes, on="node", how="left_anti")
            .limit(1)
            .count()
        )
        if dangling:
            raise ValueError(
                "pagerank: edge list has dangling nodes (dst never appears as src); "
                "symmetrize_edges() or add self-loops first"
            )

    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        contrib = (
            wedges.join(ranks.withColumnRenamed("node", "src"), on="src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        new_rank = F.lit(base) + F.lit(damping) * F.col("contrib")
        if round_digits is not None:
            new_rank = F.round(new_rank, round_digits)
        # no dangling nodes ⇒ every node receives at least one
        # contribution, so the inner-join result covers all nodes
        ranks = contrib.select(F.col("dst").alias("node"), new_rank.alias("rank"))
        if (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
