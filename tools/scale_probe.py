"""Scale rehearsal: replicate sf0.1 ×N into a disjoint-universe corpus
and measure how the most expensive bench queries grow.

The 100 TB story is argued in SCALE.md; this probe measures it. A
factor-N corpus is built by unioning N key-shifted copies of every
table (``df CROSS JOIN range(N)`` — fully distributed, no driver
data). Each replica is an *isomorphic, disjoint* universe:

- every key column shifts by ``replica * (max_key + 1)`` with
  referential integrity preserved (lineitem↔orders↔customer,
  lineitem↔part/supplier), so the co-purchase graph becomes N disjoint
  copies — N× vertices, N× edges, same topology per copy;
- document text keeps every original token (language-ID and quality
  scores depend on exact stopword hits) but INSERTS a per-replica salt
  token after every 5th token, so cross-replica copies share well
  under half their shingles and are NOT near-duplicates of each other
  — MinHash workload grows ~N×, not quadratically in clone pathology —
  while within-replica exact-dup and near-dup structure is preserved
  (identical texts get identical salts);
- events shift (event_id, user_id): N× keys for per-key gapfill and
  session windows;
- embeddings shift vec_id AND circularly rotate vector dimensions by
  the replica index: every replica keeps the exact intra-replica
  geometry (all inner products / norms / neighbor structure preserved
  under a fixed permutation) while cross-replica vectors stop being
  byte clones — so the ANN probe set (PROBE_QUERIES_ANN) measures a
  10× corpus honestly instead of a 10-way-clone pathology.

Pass/fail: with sub-quadratic scaling, factor-10 wall time should stay
under ~12× the factor-1 time per query (10× data + shuffle log
factors), with zero guard-trips/OOM.

Usage:
  python tools/scale_probe.py build  [factor] [src] [out]
  python tools/scale_probe.py run    [factor] [src] [out] [query ...]
  python tools/scale_probe.py all    [factor] [src] [out]   # build+run

Defaults: factor=10, src=/root/testdata/sf0.1, out=scale_data/sf1.
Emits one JSON line per query with t_1x, t_Nx, ratio; writes nothing
outside the repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# the 8 most expensive r3 bench queries (VERDICT round-3 "Next round" #1)
PROBE_QUERIES = [
    "k_hop_reachability",
    "minhash_near_dedup",
    "pagerank_copurchase",
    "weighted_shortest_paths",
    "association_rules",
    "corpus_chunking_pipeline",
    "llm_corpus_pipeline",
    "time_bucket_gapfill",
]

# ANN tier — meaningful only with the dimension-rotated embeddings
# replicas (see module docstring); run via:
#   python tools/scale_probe.py run 10 <src> <out> ann
PROBE_QUERIES_ANN = [
    "brute_force_topk",
    "lsh_topk",
    "pq_topk",
    "embedding_near_dup",
]

# round-6 tier (VERDICT r5 #4): the all-time heaviest bench chains.
# Split by factor because of a CORPUS artifact, not an operator one:
# the synthetic documents draw from a ~31-token vocabulary, so at the
# registry's Jaccard threshold (0.1) the doc-level near-dup graph is
# already dense at 1x, and replication makes the true near-dup OUTPUT
# (candidate pairs, cluster sizes) grow ~factor² — the same
# output-quadratic artifact documented for token_jaccard_join in
# bench.py. The doc-level near-dup composites therefore probe at
# factor 10 (r6dedup tier, scale_data/sf1), everything else at 100.
# semantic_dedup_sqrtn is probe-only: the registry's semantic_dedup
# pins k=16 centroids for the oracle, which is deliberately NOT the
# scale configuration (fixed k makes the within-cluster term
# quadratic); the probe exercises the operator's centroids=None
# sqrt(N) rule, the contract that holds at 100 TB.
#   python tools/scale_probe.py run 100 /root/testdata/sf0.1 scale_data/sf10 r6
#   python tools/scale_probe.py run 10  /root/testdata/sf0.1 scale_data/sf1  r6dedup
PROBE_QUERIES_R6 = [
    "semantic_dedup_sqrtn",
    "cross_doc_line_dedup",
    "bootstrap_metric_ci",
    "kn_perplexity",
    "video_frame_features",
    "corpus_chunking_pipeline",
    "ranking_eval_metrics",
    "min_k_prob_contamination",
    "hill_tail_index",
    "draft_acceptance_stats",
]

PROBE_QUERIES_R6_DEDUP = [
    "near_dup_canonical_pick",
    "minhash_dedup_eval",
    "llm_corpus_pipeline",
]

# graph-ANN tier — the top-2 bench queries. Factor 10 with the
# dimension-rotated embeddings replicas (same corpus as r6dedup):
# build cost is N·(2k)² per round (linear in N), search is
# O(|Q|·ef·k) per query. Order matters: the build query populates the
# per-(session, sf) graph cache that the search query then reuses, on
# BOTH the 1x and Nx sides — the same index-once/serve-many semantics
# the bench measures.
#   python tools/scale_probe.py run 10 /root/testdata/sf0.1 scale_data/sf1 r6graph
PROBE_QUERIES_R6_GRAPH = [
    "knn_graph_nn_descent",
    "graph_ann_search",
]

# round-7 tier (VERDICT r6 #6): the heavy entries that ran the f10
# correctness differential but not the f100 perf probe, plus the new
# session-2 readout chains. prefix_filter_jaccard probes at factor 10
# (doc-level near-dup: the salted replicas keep cross-replica Jaccard
# ~0.5 < the 0.8 threshold, but candidate OUTPUT still grows with the
# within-replica near-dup density — same corpus-artifact reasoning as
# the r6dedup tier).
#   python tools/scale_probe.py run 100 /root/testdata/sf0.1 scale_data/sf10 r7
#   python tools/scale_probe.py run 10  /root/testdata/sf0.1 scale_data/sf1  r7dedup
PROBE_QUERIES_R7 = [
    "kcenter_coreset",
    "greedy_max_coverage",
    "qini_uplift_curve",
    "attribution_revenue",
    "trimmed_mean_by_type",
    "sprt_conversion_monitor",
    "bm25_wand_topk",
    "eb_shrunk_return_rates",
]

# factor-10 members, each with a reason it cannot run f100:
# - prefix_filter_jaccard / containment_dedup_join: doc-level near-dup
#   output density (the r6dedup corpus-artifact rule). Measured r7:
#   containment OUTPUT grows 343x at factor 10 on this corpus (tiny
#   shingle sets of a 31-token vocabulary are trivially contained in
#   everything) while wall time grows 17.5x — per-output-row cost
#   FALLS; the flag is output-bound, not a plan defect (the
#   token_jaccard_join class);
# - knn_shapley_values: the REGISTRY query derives the validation set
#   proportionally (vec_id % 25), so the probe corpus makes |val|·N
#   quadratic by construction — production pins |val| FIXED, which is
#   the operator's linear contract (ml/valuation.py docstring).
PROBE_QUERIES_R7_DEDUP = [
    "prefix_filter_jaccard",
    "containment_dedup_join",
    "knn_shapley_values",
]


def _semantic_dedup_sqrtn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redshells_spark.dedup.semantic import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, centroids=None, threshold=0.25)


# probe-only callables (operator configurations the oracle-pinned
# registry entries deliberately don't use)
EXTRA_QUERIES = {"semantic_dedup_sqrtn": _semantic_dedup_sqrtn}

# key columns to shift, per table: {table: {column: offset_group}} —
# columns sharing an offset_group shift by the same amount so joins
# stay consistent across tables (fact FK == dim PK per replica).
KEY_GROUPS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_TABLES = ["nation", "region"]

SALT_EVERY = 5  # insert one salt token after every 5th document token


def _offsets(spark: SparkSession, src: str) -> dict[str, int]:
    """offset_group -> (global max key + 1), the per-replica shift."""
    maxes: dict[str, int] = {}
    for table, cols in KEY_GROUPS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        row = df.agg(
            *[F.max(F.col(c)).alias(c) for c in cols]
        ).collect()[0]
        for c, grp in cols.items():
            v = int(row[c] or 0) + 1
            maxes[grp] = max(maxes.get(grp, 0), v)
    return maxes


def _salted_text(text_col, replica_col):
    """Insert token ``xq<replica>p<idx>`` after every SALT_EVERY-th
    token for replicas > 0. Original tokens untouched — stopword /
    language / quality statistics survive; shingle sets diverge."""
    toks = F.split(text_col, " ")
    with_salt = F.flatten(
        F.transform(
            toks,
            lambda t, j: F.when(
                (replica_col > 0) & (j % SALT_EVERY == SALT_EVERY - 1),
                F.array(
                    t,
                    F.concat(
                        F.lit("xq"),
                        replica_col.cast("string"),
                        F.lit("p"),
                        j.cast("string"),
                    ),
                ),
            ).otherwise(F.array(t)),
        )
    )
    return F.when(replica_col == 0, text_col).otherwise(
        F.concat_ws(" ", with_salt)
    )


def build_scaled(
    spark: SparkSession, src: str, out: str, factor: int
) -> None:
    os.makedirs(out, exist_ok=True)
    offs = _offsets(spark, src)
    reps = F.broadcast(spark.range(factor).select(F.col("id").alias("__r")))
    for table in COPY_TABLES:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")
        print(f"# {table}: copied", file=sys.stderr)
    for table, cols in KEY_GROUPS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        rep = df.crossJoin(reps)
        shifted = [
            (
                F.col(c) + F.col("__r") * offs[grp]
                if c in cols
                else F.col(c)
            ).alias(c)
            for c, grp in ((c2, cols.get(c2)) for c2 in df.columns)
        ]
        outdf = rep.select(*shifted, F.col("__r"))
        if table == "documents":
            outdf = outdf.withColumn(
                "text", _salted_text(F.col("text"), F.col("__r"))
            ).withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings":
            # circular dim rotation by replica: a fixed orthonormal
            # permutation per replica — intra-replica inner products,
            # norms and neighbor structure are EXACTLY preserved, but
            # cross-replica vectors are no longer clones
            outdf = outdf.withColumn(
                "embedding",
                F.expr(
                    "transform(sequence(1, size(embedding)), "
                    "j -> element_at(embedding, "
                    "cast((j - 1 + __r) % size(embedding) as int) + 1))"
                ),
            )
        outdf.drop("__r").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"# {table}: {n} rows at factor {factor}", file=sys.stderr)


def run_probe(
    spark: SparkSession,
    src: str,
    out: str,
    factor: int,
    names: list[str],
    repeats: int | None = None,
) -> list[dict]:
    if repeats is None:
        # ratio measurements at factor >= 100 don't need median-of-3
        # precision; a single run per side keeps the probe tractable
        repeats = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "1"))
    from redshells_spark.queries import get_queries

    queries = dict(get_queries())
    queries.update(EXTRA_QUERIES)
    results = []
    for name in names:
        rec: dict = {"query": name, "factor": factor}
        for label, d in (("t_1x", src), ("t_Nx", out)):
            runs, n = [], 0
            try:
                for _ in range(repeats):
                    t0 = time.time()
                    n = queries[name](spark, d).count()
                    runs.append(time.time() - t0)
                rec[label] = round(sorted(runs)[len(runs) // 2], 3)
                rec[f"rows_{label}"] = n
            except Exception as e:  # noqa: BLE001 — guard-trips must be visible, not fatal
                rec[label] = None
                rec[f"err_{label}"] = f"{type(e).__name__}: {e}"[:300]
        if rec.get("t_1x") and rec.get("t_Nx"):
            rec["ratio"] = round(rec["t_Nx"] / rec["t_1x"], 2)
            rec["subquadratic"] = rec["ratio"] <= 1.2 * factor
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_data",
        "sf1",
    )
    names = sys.argv[5:] or PROBE_QUERIES
    if names == ["ann"]:
        names = PROBE_QUERIES_ANN
    if names == ["r6"]:
        names = PROBE_QUERIES_R6
    if names == ["r6dedup"]:
        names = PROBE_QUERIES_R6_DEDUP
    if names == ["r6graph"]:
        names = PROBE_QUERIES_R6_GRAPH
    if names == ["r7"]:
        names = PROBE_QUERIES_R7
    if names == ["r7dedup"]:
        names = PROBE_QUERIES_R7_DEDUP

    from redshells_spark import get_spark_session

    spark = get_spark_session("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("build", "all"):
        build_scaled(spark, src, out, factor)
    if mode in ("run", "all"):
        results = run_probe(spark, src, out, factor, names)
        bad = [
            r
            for r in results
            if r.get("ratio") is None or not r.get("subquadratic")
        ]
        print(
            json.dumps(
                {
                    "probe": "scale",
                    "factor": factor,
                    "n_queries": len(results),
                    "n_flagged": len(bad),
                    "flagged": [r["query"] for r in bad],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
