"""Unit tests for write-path sharding, curriculum schedules, near-dup
canonicalization, leakage-safe splits, and the Poisson bootstrap."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ------------------------------------------------------- distributed_rank


def test_distributed_rank_matches_global_window(spark):
    from redshells_spark.data.sharding import distributed_rank

    df = spark.range(0, 997).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("w")
    )
    got = distributed_rank(df, [F.col("w").desc(), F.col("id").asc()], "rk")
    rows = {r["id"]: r["rk"] for r in got.collect()}
    expected = sorted(
        ((r["id"], r["w"]) for r in df.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    for rank, (i, _) in enumerate(expected):
        assert rows[i] == rank


def test_distributed_rank_partitioned(spark):
    from redshells_spark.data.sharding import distributed_rank

    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).alias("g"), ((F.col("id") * 7) % 53).alias("w")
    )
    got = distributed_rank(
        df, [F.col("w").asc(), F.col("id").asc()], "rk", partition_cols=["g"]
    )
    out = got.collect()
    # each group has a dense 0..n-1 rank
    by_g: dict[int, list] = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, rows in by_g.items():
        ranks = sorted(r["rk"] for r in rows)
        assert ranks == list(range(len(rows)))
        ordered = sorted(rows, key=lambda r: (r["w"], r["id"]))
        for rank, r in enumerate(ordered):
            assert r["rk"] == rank


# --------------------------------------------------- token_balanced_shards


def test_token_balanced_shards_balance_and_serpentine(spark):
    from redshells_spark.data.sharding import token_balanced_shards

    df = spark.range(0, 640).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 13) % 997 + 1).alias("w")
    )
    out = token_balanced_shards(df, "w", 8).collect()
    totals: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in out:
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["w"]
        counts[r["shard"]] = counts.get(r["shard"], 0) + 1
    assert set(totals) == set(range(8))
    assert all(c == 80 for c in counts.values())  # 640 / 8
    # serpentine LPT: max/min shard-weight imbalance bounded tightly
    assert max(totals.values()) / min(totals.values()) < 1.02
    # the two heaviest rows land on different shards
    top2 = sorted(out, key=lambda r: (-r["w"], r["doc_id"]))[:2]
    assert top2[0]["shard"] != top2[1]["shard"]


def test_token_balanced_shards_rejects_bad_n(spark):
    from redshells_spark.data.sharding import token_balanced_shards

    df = spark.range(3).select(F.col("id").alias("doc_id"), F.lit(1).alias("w"))
    with pytest.raises(ValueError):
        token_balanced_shards(df, "w", 0)


# ------------------------------------------------------ curriculum_schedule


def test_curriculum_schedule_epoch0_sorted_and_reshuffled(spark):
    from redshells_spark.data.sharding import curriculum_schedule

    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 31) % 777).alias("diff")
    )
    out = curriculum_schedule(df, "diff", n_epochs=3, seed=7).collect()
    assert len(out) == 600
    by_epoch: dict[int, list] = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], []).append(r)
    # epoch 0: position order == difficulty order (easy -> hard)
    e0 = sorted(by_epoch[0], key=lambda r: r["position"])
    diffs = [r["diff"] for r in e0]
    assert diffs == sorted(diffs)
    # epochs 1 and 2 are distinct permutations (reshuffled)
    p1 = [r["doc_id"] for r in sorted(by_epoch[1], key=lambda r: r["position"])]
    p2 = [r["doc_id"] for r in sorted(by_epoch[2], key=lambda r: r["position"])]
    assert sorted(p1) == sorted(p2) == list(range(200))
    assert p1 != p2
    # every epoch is a dense 0..n-1 position range
    for rows in by_epoch.values():
        assert sorted(r["position"] for r in rows) == list(range(200))


# ------------------------------------------------- canonical pick / split


def _labeled(spark):
    from redshells_spark.dedup.canonical import attach_components

    docs = spark.createDataFrame(
        [(i, 10 + i % 5) for i in range(10)], ["doc_id", "w"]
    )
    comps = spark.createDataFrame(
        [(1, 1), (3, 1), (6, 1), (4, 4), (8, 4)], ["doc_id", "keep_id"]
    )
    return attach_components(docs, comps, "doc_id", "keep_id")


def test_canonical_pick_keep_longest(spark):
    from redshells_spark.dedup.canonical import canonical_pick

    out = {r["doc_id"]: r for r in canonical_pick(_labeled(spark), "w").collect()}
    # component 1 = {1, 3, 6}: weights 11, 13, 11 -> canonical 3
    for d in (1, 3, 6):
        assert out[d]["component"] == 1
        assert out[d]["canonical_id"] == 3
    assert out[3]["is_canonical"] == 1 and out[1]["is_canonical"] == 0
    # component 4 = {4, 8}: weights 14, 13 -> canonical 4
    assert out[4]["canonical_id"] == 4 and out[8]["canonical_id"] == 4
    # singleton is its own canonical
    assert out[0]["component"] == 0 and out[0]["is_canonical"] == 1


def test_component_split_no_leakage(spark):
    from redshells_spark.dedup.canonical import component_split

    out = component_split(_labeled(spark), 80, 10, seed=11).collect()
    split_by_comp: dict[int, set] = {}
    for r in out:
        split_by_comp.setdefault(r["component"], set()).add(r["split"])
    # every component lands wholly inside ONE split
    assert all(len(s) == 1 for s in split_by_comp.values())


def test_component_split_shares(spark):
    from redshells_spark.dedup.canonical import component_split

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component")
    )
    got = {
        r["split"]: r["n"]
        for r in component_split(docs, 80, 10, seed=11)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert 0.7 < got["train"] / 2000 < 0.9
    assert 0.05 < got["val"] / 2000 < 0.15
    assert 0.05 < got["test"] / 2000 < 0.15


# ------------------------------------------------------- Poisson bootstrap


def test_poisson_thresholds_cdf_shape():
    from redshells_spark.ml.bootstrap import poisson1_thresholds

    ts = poisson1_thresholds()
    assert len(ts) == 8
    assert ts == sorted(ts)  # monotone CDF
    assert all(len(t) == 4 for t in ts)
    # P(w=0) = e^-1 ~ 0.3679 (16-bit quantized)
    assert abs(int(ts[0], 16) / 2**16 - 0.36788) < 2e-5 + 2**-16


def test_poisson_bootstrap_ci_covers_mean(spark):
    from redshells_spark.ml.bootstrap import poisson_bootstrap_mean_ci

    df = spark.range(0, 4000).select(
        F.col("id"), ((F.col("id") % 100) / 10.0 + 5.0).alias("v")
    )
    row = poisson_bootstrap_mean_ci(df, "v", "id", n_replicas=100, seed=3).collect()[0]
    assert row["n_replicas"] == 100
    assert row["ci_lo"] <= row["point_mean"] <= row["ci_hi"]
    # true mean 9.95; the CI half-width should be ~ sd/sqrt(n) ~ 0.045
    assert abs(row["point_mean"] - 9.95) < 0.01
    assert 0.0 < row["ci_hi"] - row["ci_lo"] < 0.5


def test_poisson_bootstrap_deterministic(spark):
    from redshells_spark.ml.bootstrap import poisson_bootstrap_mean_ci

    df = spark.range(0, 500).select(F.col("id"), (F.col("id") % 7).cast("double").alias("v"))
    a = poisson_bootstrap_mean_ci(df, "v", "id", n_replicas=50, seed=3).collect()[0]
    b = poisson_bootstrap_mean_ci(
        df.repartition(13), "v", "id", n_replicas=50, seed=3
    ).collect()[0]
    assert a == b  # partitioning-independent
