"""Quality gates for the NN-descent k-NN graph (rows-only query)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from redshells_spark.queries import get_queries

# measured >=10s in the round-9 duration profile (pytest.ini tiering)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact(spark):
    from redshells_spark.similarity.ann import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return (
        brute_force_topk(
            emb.select(F.col("vec_id").alias("query_id"), "embedding"), emb, k=10
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .cache()
    )


def test_registry_query_recall_gate(spark, exact):
    from redshells_spark.similarity.knn_graph import knn_graph_recall

    g = get_queries()["knn_graph_nn_descent"](spark, SF)
    # measured 0.8613 at 3 rounds on the near-random synthetic
    # embeddings (the hard case — no cluster structure); margin below
    assert knn_graph_recall(g, exact, k=10) >= 0.80


def test_graph_shape(spark):
    g = get_queries()["knn_graph_nn_descent"](spark, SF).cache()
    n = g.select("src").distinct().count()
    assert n == 500  # every node has a neighborhood
    per = g.groupBy("src").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per[0] == per[1] == 10  # exactly k neighbors each
    assert g.filter(F.col("src") == F.col("dst")).count() == 0


def test_recall_improves_with_rounds(spark, exact):
    from redshells_spark.similarity.knn_graph import (
        knn_graph_nn_descent,
        knn_graph_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r1 = knn_graph_recall(knn_graph_nn_descent(emb, k=10, iterations=1), exact)
    r3 = knn_graph_recall(knn_graph_nn_descent(emb, k=10, iterations=3), exact)
    assert r3 > r1 + 0.1


def test_degenerate_small_corpus_is_exact(spark):
    from redshells_spark.similarity.knn_graph import knn_graph_nn_descent

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 8)
    g = knn_graph_nn_descent(emb, k=10, iterations=2)
    rows = g.collect()
    # 8 nodes, k >= n-1: the exact all-pairs graph
    assert len(rows) == 8 * 7


def test_graph_ann_search_recall_gate(spark, exact):
    """The registry beam-search query: recall vs brute force on the
    20-query slice (measured 0.98 at rounds=4, ef=40)."""
    got = get_queries()["graph_ann_search"](spark, SF).cache()
    qids = [r["query_id"] for r in got.select("query_id").distinct().collect()]
    truth = exact.filter(F.col("query_id").isin(qids))
    # exact fixture excludes self-hits; the search may legitimately
    # return the query itself at rank 1 — compare on the common k
    hits = got.join(truth.select("query_id", "vec_id"), ["query_id", "vec_id"]).count()
    assert hits / truth.count() >= 0.85


def test_graph_search_shapes(spark):
    got = get_queries()["graph_ann_search"](spark, SF).cache()
    per = got.groupBy("query_id").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per[0] == per[1] == 10


def test_incremental_insert_recall(spark, exact):
    """Build on 90% of the corpus, insert the held-out 10%: searches
    from the inserted nodes must find their true neighbors."""
    from redshells_spark.similarity.knn_graph import (
        graph_search_topk,
        knn_graph_insert,
        knn_graph_nn_descent,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    g0 = knn_graph_nn_descent(old, k=10, iterations=3)
    g1 = knn_graph_insert(g0, old, new, k=10, ef=20, rounds=3).cache()
    # every node (old + new) keeps exactly k neighbors
    per = g1.groupBy("src").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per[0] == per[1] == 10
    assert g1.select("src").distinct().count() == 500
    # search the UPDATED graph from the inserted vectors
    qv = new.select(F.col("vec_id").alias("query_id"), "embedding")
    got = graph_search_topk(g1, emb, qv, k=10, ef=40, rounds=4)
    truth = exact.join(qv.select("query_id"), "query_id")
    hits = got.join(truth.select("query_id", "vec_id"), ["query_id", "vec_id"]).count()
    assert hits / truth.count() >= 0.8


def test_insert_refuses_oversized_batch(spark):
    from redshells_spark.similarity.knn_graph import (
        knn_graph_insert,
        knn_graph_nn_descent,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    g = knn_graph_nn_descent(emb.limit(100), k=5, iterations=1)
    with pytest.raises(ValueError):
        knn_graph_insert(g, emb.limit(100), emb, max_batch_brute=10)


def test_graph_task_parity(spark, tmp_path):
    """The param-hash parquet target must serve EXACTLY the graph a
    fresh build produces: a second run() hits the target (load path)
    and the loaded rows equal a direct knn_graph_nn_descent build —
    the fresh-session graph_ann_search contract."""
    from redshells_spark.similarity.knn_graph import knn_graph_nn_descent
    from redshells_spark.task import task

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    def _build(spark, _inputs):
        return knn_graph_nn_descent(emb, k=10, iterations=2, seed=7)

    t = task(
        "knn_graph_index_test",
        _build,
        params={"k": 10, "iterations": 2, "seed": 7},
        cache_root=str(tmp_path),
    )
    built = t.run(spark)  # builds + writes
    assert t.complete()
    loaded = t.run(spark)  # second run must load, not rebuild
    direct = knn_graph_nn_descent(emb, k=10, iterations=2, seed=7)
    key = lambda r: (r["src"], r["rank"])
    as_rows = lambda df: sorted(
        ((r["src"], r["dst"], round(r["score"], 9), r["rank"]) for r in df.collect())
    )
    assert as_rows(loaded) == as_rows(direct) == as_rows(built)
