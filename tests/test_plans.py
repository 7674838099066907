"""Physical-plan assertions: the scale properties we rely on must be
visible in explain output — filters at the scan, pruned schemas,
broadcast joins for small sides, partial window top-k, no Python in
JVM-only paths."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf01(sf_dir):
    return sf_dir


def test_filter_and_projection_pushdown(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["filter_by_column"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,25.0)" in plan
    # only the 4 projected columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>" in plan


def test_join_strategy_broadcast(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["top_revenue_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # both sides broadcastable here
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_semi_join_pushdown(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["semi_join_isin"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,40)" in plan


def test_per_group_topk_partial_window(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["per_group_topk"](spark, sf_dir))
    # rank pruning happens BEFORE the exchange (map-side WindowGroupLimit)
    assert plan.count("WindowGroupLimit") >= 2


def test_no_python_udf_in_relational_paths(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    for name in ("pricing_summary", "tfidf", "minhash_signatures", "exact_dedup"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_dedup_shuffles_hash_not_payload(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["exact_dedup"](spark, sf_dir))
    # one exchange keyed on the md5 fingerprint
    assert "hashpartitioning(fingerprint" in plan


def test_binary_metadata_stays_jvm_side(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["binary_metadata"](spark, sf_dir))
    # metadata derivation (length/md5) must never leave codegen
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["decontaminate"](spark, sf_dir))
    # the benchmark shingle set and the contaminated-id set are both
    # broadcast; the corpus is never shuffled for the containment checks
    assert "BroadcastHashJoin" in plan
    assert plan.count("LeftAnti") >= 1


def test_stratified_sample_prunes_before_exchange(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["stratified_sample"](spark, sf_dir))
    # per-group quota rows are pruned map-side before the window shuffle
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan


def test_pack_sequences_single_shard_exchange(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["pack_sequences"](spark, sf_dir))
    # the packing cumsum shuffles once on the shard column, never globally
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_stream_dedup_single_exchange_on_fingerprint(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["stream_dedup_fingerprints"](spark, sf_dir))
    # one hash exchange keyed on the fingerprint, partial agg before it
    # (each physical node prints twice in formatted output: tree + detail)
    assert plan.count("hashpartitioning(") == 1
    assert "hashpartitioning(fingerprint" in plan
    assert "SinglePartition" not in plan


def test_bloom_probe_is_scan_only_no_join(spark, sf_dir):
    # the runtime-filter probe must be a pure filter over the fact scan:
    # no Join operator, no Exchange — rows die inside the scan stage
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["bloom_filter_probe"](spark, sf_dir))
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_pq_encode_no_shuffle(spark, sf_dir):
    # PQ encode is one Arrow pass over the corpus — no Exchange between
    # the scan and the Python evaluator
    import numpy as np
    from pyspark.sql import functions as F

    from redshells_spark.similarity.pq import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.limit(4).select("embedding").collect()
    cbs = pq_codebooks([[float(x) for x in r["embedding"]] for r in rows], num_subspaces=8)
    plan = _plan(pq_encode(emb, cbs))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_gapfill_no_cartesian_and_single_grid_join(spark, sf_dir):
    from redshells_spark.operators.gapfill import time_bucket_gapfill

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(time_bucket_gapfill(ev, "user_id", "value", bucket_seconds=3600))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_recount_broadcasts_candidates(spark, sf_dir):
    # the recount's semi-join must broadcast the (bounded) candidate
    # set, never shuffle the token stream for the join
    from pyspark.sql import functions as F

    from redshells_spark.operators.heavy_hitters import top_k_frequent

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    )
    # build the same plan shape the operator uses (pre-collect stage)
    out = top_k_frequent(toks, "token", k=5)
    assert out.count() <= 5  # materialized exact answer


def test_zorder_key_pure_codegen(spark, sf_dir):
    from redshells_spark.operators.layout import with_zorder_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    plan = _plan(with_zorder_key(ev, ["event_id", "user_id"], bits=8))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan  # key derivation shuffles nothing


def test_chunk_documents_no_shuffle(spark, sf_dir):
    # chunking is a pure generator: sequence+explode, zero Exchange
    from redshells_spark.text.chunking import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(chunk_documents(docs, chunk_tokens=32, stride=24))
    assert "Exchange" not in plan


def test_cdc_merge_anti_join_broadcasts_delta(spark, sf_dir):
    # the base side must see a broadcast LeftAnti, never a shuffle of base
    from pyspark.sql import functions as F

    from redshells_spark.operators.cdc import apply_changes

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select("user_id", "event_id", "value").dropDuplicates(["user_id"])
    changes = ev.limit(100).select(
        "user_id", "event_id", "value",
        F.col("event_id").alias("version"), F.lit("U").alias("op"),
    )
    plan = _plan(apply_changes(base, changes, ["user_id"], "version"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_partitions_by_entity_key_only(spark, sf_dir):
    # every Exchange hashes on user_id — no SinglePartition anywhere
    from pyspark.sql import functions as F

    from redshells_spark.operators.scd import scd2_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select("user_id", "event_type", F.col("event_id").alias("eid"))
    plan = _plan(scd2_intervals(base, "user_id", "event_type", "eid"))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_interval_sweep_partitions_by_group(spark, sf_dir):
    from pyspark.sql import functions as F

    from redshells_spark.operators.intervals import max_concurrency

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        "event_type",
        F.col("event_id").alias("s"),
        (F.col("event_id") + 100).alias("e"),
    )
    plan = _plan(max_concurrency(iv, "s", "e", ["event_type"]))
    assert "SinglePartition" not in plan


def test_bpe_corpus_application_broadcasts_word_table(spark, sf_dir):
    # subtoken counting joins exploded corpus tokens against the
    # (small) trained word table via broadcast — corpus never shuffles
    # for the join, only for the per-doc aggregate
    from redshells_spark.text.bpe import subtoken_count_per_doc, to_symbols

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seg = docs.selectExpr("explode(split(text, ' ')) AS word").distinct().select(
        "word", to_symbols("word").alias("sym")
    )
    plan = _plan(subtoken_count_per_doc(docs, seg))
    assert "BroadcastHashJoin" in plan


def test_dynamic_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    # write events partitioned by event_type, join against a filtered
    # tiny dimension on the partition column: Spark must inject a
    # dynamicpruning subquery so only the matching partitions are read
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    part_dir = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(part_dir)

    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("purchase", 3.0), ("scroll", 4.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") < 2.5)  # selective build side

    joined = fact.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower()

    got = {r["event_type"]: r["n"] for r in joined.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_semantic_dedup_plan_no_cartesian(spark, sf_dir):
    # the within-cluster pair join must be an equi-join on cid — never
    # a cartesian/BNLJ over the corpus — and vector norms are computed
    # in the projection, not re-derived per pair
    from redshells_spark.dedup.semantic import semantic_dedup_pairs
    from redshells_spark.similarity.ann import ivf_seed_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_seed_centroids(emb, 8)
    plan = _plan(semantic_dedup_pairs(emb, cents, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan  # whole pipeline stays JVM-side


def test_cross_doc_line_dedup_plan_partial_agg(spark, sf_dir):
    # unit-hash counting must partial-aggregate map-side (HashAggregate
    # pairs) and stay free of Python; join back is an equi-join
    from redshells_spark.dedup.lines import block_units, cross_doc_unit_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cross_doc_unit_dedup(block_units(docs)))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_bpe_encode_plan_broadcast_joins(spark, sf_dir):
    # both the segmented-word table and the vocab are broadcast: the
    # corpus side never shuffles for the joins
    from redshells_spark.text.bpe import (
        bpe_encode,
        bpe_vocab,
        learn_bpe_merges,
        word_freq_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, seg = learn_bpe_merges(word_freq_table(docs), 4)
    plan = _plan(bpe_encode(docs, seg, bpe_vocab(seg)))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "PythonUDF" not in plan


def test_binary_quantize_is_one_codegen_projection(spark, sf_dir):
    # 1-bit quantization must be a single whole-stage-codegen projection
    # over the scan: no Exchange, no BatchEvalPython, no interpreted
    # higher-order functions (the flat IF-term formulation)
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["binary_quantize_embeddings"](spark, sf_dir))
    assert "Exchange" not in plan
    # formatted explain marks codegen stages with a leading '*'
    assert "* Project" in plan and "* ColumnarToRow" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hamming_topk_broadcasts_queries_and_group_limits(spark, sf_dir):
    # the corpus must stream once against BROADCAST query codes, and the
    # per-query top-k must group-limit BEFORE the exchange so only
    # k * |queries| rows shuffle — the 100 TB coarse-ANN contract
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["hamming_topk"](spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "SortMergeJoin" not in plan


def test_quality_stratified_mix_pushes_gate_to_scan(spark, sf_dir):
    # the Gopher gate must evaluate AT the scan (Filter directly over
    # FileScan reading only text+source), and the mixing window must
    # run on the tiny per-source relation, not the corpus
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["quality_stratified_mix"](spark, sf_dir))
    assert "ReadSchema: struct<text:string,source:string>" in plan
    assert "BatchEvalPython" not in plan
