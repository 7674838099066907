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
