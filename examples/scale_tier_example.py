"""Scale-tier walkthrough: the operators a 100 TB pipeline leans on.

Runs against the synthetic testdata at sf0.001 by default:

    python examples/scale_tier_example.py [sf_dir]

Demonstrates, end to end on one SparkSession:
  1. bloom runtime semi-join (fact filtered in the scan, no join)
  2. heavy hitters with exactness certificate
  3. KMV distinct sketches
  4. time-bucket gap-fill + interpolation
  5. PageRank over the purchase graph
  6. PQ ANN over embeddings
  7. Z-order clustered write + profile of the result
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import example_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from redshells_spark.data.profile import profile_columns
    from redshells_spark.operators.bloom import bloom_semi_join
    from redshells_spark.operators.gapfill import time_bucket_gapfill
    from redshells_spark.operators.graph import pagerank, symmetrize_edges
    from redshells_spark.operators.heavy_hitters import top_k_frequent
    from redshells_spark.operators.layout import write_zordered
    from redshells_spark.operators.sketches import kmv_distinct
    from redshells_spark.similarity.pq import pq_adc_topk, pq_codebooks, pq_encode

    spark = example_session("scale-tier-example")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # 1. runtime filter: big side never joins, never shuffles
    hot = orders.filter(F.col("o_totalprice") > 300000)
    filtered = bloom_semi_join(li, hot.select("o_orderkey"), "l_orderkey", "o_orderkey", exact=True)
    print(f"bloom semi-join: {filtered.count()} of {li.count()} lineitems survive")

    # 2. exact heavy hitters without shuffling the vocabulary
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    top = top_k_frequent(toks, "token", k=10)
    print("top tokens:", [(r["token"], r["cnt"]) for r in top.collect()][:5], "…")

    # 3. KMV distinct sketch vs exact
    sk = kmv_distinct(events, ["event_type"], "user_id", k=64)
    print("KMV distinct users/event_type:", sorted((r["event_type"], round(r["kmv_estimate"], 1)) for r in sk.collect()))

    # 4. gap-fill the hourly per-user value series
    filled = time_bucket_gapfill(events, "user_id", "value", bucket_seconds=3600)
    n_gap = filled.filter(F.col("is_gap") == 1).count()
    print(f"gapfill: {filled.count()} buckets, {n_gap} interpolated")

    # 5. PageRank over customer–supplier purchases
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .dropDuplicates()
    )
    pr = pagerank(symmetrize_edges(e0), iterations=3, assume_no_dangling=True)
    top_nodes = pr.orderBy(F.col("rank").desc()).limit(3).collect()
    print("pagerank top:", [(r["node"], round(r["rank"], 5)) for r in top_nodes])

    # 6. PQ ANN: compressed-domain top-k
    train = emb.filter(F.col("vec_id") % 50 == 0).orderBy("vec_id").limit(16)
    cbs = pq_codebooks(
        [[float(x) for x in r["embedding"]] for r in train.select("embedding").collect()],
        num_subspaces=8,
    )
    codes = pq_encode(emb, cbs)
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    ann = pq_adc_topk(queries, codes, cbs, k=3)
    print(f"PQ ADC top-k: {ann.count()} results for 5 queries")

    # 7. z-order the events table and profile the written result
    with tempfile.TemporaryDirectory() as tmp:
        write_zordered(
            events.select("event_id", "user_id", "value"), f"{tmp}/z", ["event_id", "user_id"], num_files=4
        )
        prof = profile_columns(spark.read.parquet(f"{tmp}/z"), ["user_id", "value"])
        for r in prof.collect():
            print(
                f"profile {r['column']}: n={r['n_rows']} nulls={r['n_nulls']} "
                f"distinct={r['n_distinct']}"
            )

    spark.stop()


if __name__ == "__main__":
    main()
