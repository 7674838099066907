"""Property-based tests (hypothesis) — beyond the reference's test
surface (SURVEY §5: reference has none): operator semantics checked
against pandas ground truth on generated inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SMALL_FRAMES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # value
        st.integers(min_value=0, max_value=50),  # order
    ),
    min_size=1,
    max_size=40,
)

HSETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=SMALL_FRAMES)
@HSETTINGS
def test_extract_column_as_dict_matches_pandas_first(spark, rows):
    from redshells_spark.data.frame_ops import extract_column_as_dict

    df = spark.createDataFrame(rows, "k int, v int, ord int")
    got = {
        r["k"]: r["v"]
        for r in extract_column_as_dict(df, "k", "v", order_by=["ord", "v"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v", "ord"]).sort_values(["ord", "v"], kind="stable")
    want = pdf.groupby("k")["v"].first().to_dict()
    assert got == want


@given(rows=SMALL_FRAMES)
@HSETTINGS
def test_group_count_filter_matches_pandas(spark, rows):
    from redshells_spark.data.frame_ops import filter_by_column  # noqa: F401
    from redshells_spark.operators.aggregates import group_count_filter

    df = spark.createDataFrame(rows, "k int, v int, ord int")
    got = sorted(tuple(r) for r in group_count_filter(df, "k", 2, 10).collect())
    pdf = pd.DataFrame(rows, columns=["k", "v", "ord"])
    counts = pdf.groupby("k")["k"].transform("count")
    want = sorted(map(tuple, pdf[(counts >= 2) & (counts <= 10)].itertuples(index=False)))
    assert got == want


@given(rows=SMALL_FRAMES, k=st.integers(min_value=1, max_value=5))
@HSETTINGS
def test_per_group_topk_matches_pandas(spark, rows, k):
    from redshells_spark.operators.topk import per_group_topk

    df = spark.createDataFrame(rows, "k int, v int, ord int")
    got = sorted(
        (r["k"], r["v"], r["ord"])
        for r in per_group_topk(df, "k", "v", k, tie_break=["ord"]).collect()
    )
    pdf = pd.DataFrame(rows, columns=["k", "v", "ord"])
    want = sorted(
        map(
            tuple,
            pdf.sort_values(["v", "ord"], ascending=[False, True], kind="stable")
            .groupby("k")
            .head(k)
            .itertuples(index=False),
        )
    )
    # multiset compare: ties beyond (v, ord) may pick different rows
    assert sorted((a, b) for a, b, _ in got) == sorted((a, b) for a, b, _ in want)


@given(
    tokens=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=8),
        min_size=1,
        max_size=15,
    )
)
@HSETTINGS
def test_jaccard_bounds_and_symmetry(spark, tokens):
    from redshells_spark.dedup.ngram import jaccard

    rows = [(t, list(reversed(t))) for t in tokens]
    df = spark.createDataFrame(rows, "x array<string>, y array<string>")
    vals = [r["j"] for r in df.select(jaccard("x", "y").alias("j")).collect()]
    for v, t in zip(vals, tokens):
        assert 0.0 <= v <= 1.0
        if t:  # same distinct set in both directions → jaccard 1
            assert v == pytest.approx(1.0)


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@HSETTINGS
def test_portable_hash_str_deterministic(spark, seed):
    import duckdb

    from redshells_spark.schema import portable_hash_str, portable_hash_str_sql

    df = spark.range(20).selectExpr("cast(id as string) as s")
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash_str("s", seed).alias("h")).collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT CAST(r AS VARCHAR), {portable_hash_str_sql('r', seed)} FROM range(20) t(r)"
        ).fetchall()
    )
    assert got == want  # bit-identical across engines for any seed


EMB_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1000),  # id (dedup below)
        st.lists(
            st.floats(min_value=-2, max_value=2, allow_nan=False, width=32),
            min_size=3, max_size=3,
        ),
    ),
    min_size=2,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(rows=EMB_ROWS, block_size=st.integers(min_value=1, max_value=10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_blocked_pairwise_equals_cross_join_property(spark, rows, block_size):
    """For any embedding set and block size, the block-pair equi-join
    must emit exactly the id0<id1 pairs of the cartesian product with
    the same dot products."""
    from redshells_spark.operators.joins import blocked_pairwise_similarity

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<double>"
    )
    got = {
        (r["id0"], r["id1"]): r["similarity"]
        for r in blocked_pairwise_similarity(df, block_size=block_size).collect()
    }
    ids = {i: v for i, v in rows}
    want = {
        (a, b): sum(x * y for x, y in zip(ids[a], ids[b]))
        for a in ids for b in ids if a < b
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=1_000_000),
)
@HSETTINGS
def test_largest_remainder_allocation_properties(spark, counts, budget):
    from redshells_spark.data.sampling import largest_remainder_allocation

    df = spark.createDataFrame(
        [(f"g{i}", c) for i, c in enumerate(counts)], "source string, n long"
    )
    rows = largest_remainder_allocation(df, budget, count_column="n").collect()
    total = sum(c for c in counts)
    # exactness: allocations sum to the budget, every group within 1 of
    # its ideal share, floor/extra decomposition consistent
    assert sum(r["allocation"] for r in rows) == budget
    for r in rows:
        ideal = budget * dict((f"g{i}", c) for i, c in enumerate(counts))[r["source"]] / total
        assert r["allocation"] in (r["floor_share"], r["floor_share"] + 1)
        assert abs(r["allocation"] - ideal) < 1.0 + 1e-9


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@HSETTINGS
def test_token_entropy_bounds(spark, docs):
    import math

    from redshells_spark.text.analysis import token_entropy_signals

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    for r in token_entropy_signals(df).collect():
        n, nd = r["n_tokens"], r["n_distinct"]
        assert 0.0 <= r["entropy"] <= math.log(n) + 1e-9
        assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-9
        if nd == 1:
            assert r["entropy"] == 0.0 and r["norm_entropy"] == 0.0


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=10),
        min_size=2,
        max_size=6,
    ),
    terms=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3, unique=True),
)
@HSETTINGS
@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_bm25_matches_pure_python(spark, docs, terms):
    import math

    from redshells_spark.text.bm25 import bm25_topk

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, tuple(terms), k=len(docs)).collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs) / n
    want = {}
    for i, toks in enumerate(docs):
        s = 0.0
        for term in terms:
            tf = toks.count(term)
            if not tf:
                continue
            dfreq = sum(1 for t in docs if term in t)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(toks) / avgdl))
        if s:
            want[i] = round(s, 4)
    assert got == want


@given(
    caps=st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 500)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=3000),
    epochs=st.integers(min_value=1, max_value=4),
)
@HSETTINGS
@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_unimax_allocation_invariants(spark, caps, budget, epochs):
    """Water-fill invariants on generated group sizes: every group's
    allocation is within [0, cap]; capped groups get exactly cap;
    allocations sum to min(budget, total capacity)."""
    from redshells_spark.data.sampling import unimax_allocation

    df = spark.createDataFrame(
        [(str(g), t) for g, t in caps], "g string, toks long"
    )
    rows = unimax_allocation(df, "g", "toks", budget=budget, epoch_cap=epochs).collect()
    total_cap = sum(t * epochs for _, t in caps)
    assert all(0 <= r["allocation"] <= r["cap"] for r in rows)
    assert all(
        r["allocation"] == r["cap"] for r in rows if r["capped"] == 1
    )
    assert sum(r["allocation"] for r in rows) == min(budget, total_cap)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200), st.integers(-50, 50)),
        min_size=2, max_size=30, unique_by=lambda t: t[1],
    ),
    margin=st.integers(min_value=1, max_value=40),
)
@HSETTINGS
@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_preference_pairs_invariants(spark, rows, margin):
    """Every emitted pair respects the margin gate, orders chosen
    over rejected, never pairs an item with itself, and emits at most
    max_pairs per group."""
    from redshells_spark.data.preference import preference_pairs

    df = spark.createDataFrame(rows, "grp long, item long, score long")
    out = preference_pairs(df, "grp", "item", "score", int(margin), 2).collect()
    per_group: dict[int, int] = {}
    for r in out:
        assert r["chosen_item"] != r["rejected_item"]
        assert r["chosen_score"] - r["rejected_score"] == r["margin"] >= margin
        per_group[r["grp"]] = per_group.get(r["grp"], 0) + 1
    assert all(v <= 2 for v in per_group.values())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.booleans()),
        min_size=4, max_size=60,
    ),
)
@HSETTINGS
@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_ks_two_sample_invariants(spark, rows):
    """0 <= D <= 1; swapping the sample labels leaves D unchanged
    (the statistic is symmetric); D = 0 when both samples are
    identical multisets."""
    from pyspark.sql import functions as F
    from redshells_spark.operators.drift import ks_two_sample

    # ensure both samples non-empty
    rows = rows + [(1, True), (1, False)]
    df = spark.createDataFrame(
        [(float(v), int(b)) for v, b in rows], "value double, is1 long"
    )
    r = ks_two_sample(df, "value", "is1", scale=1).collect()[0]
    assert 0.0 <= r["d_stat"] <= 1.0
    swapped = ks_two_sample(
        df.select("value", (F.lit(1) - F.col("is1")).alias("is1")),
        "value", "is1", scale=1,
    ).collect()[0]
    assert swapped["d_num"] == r["d_num"]
    assert (swapped["n1"], swapped["n2"]) == (r["n2"], r["n1"])
    # identical samples -> D = 0
    both = spark.createDataFrame(
        [(float(v), f) for v, _ in rows for f in (0, 1)], "value double, is1 long"
    )
    assert ks_two_sample(both, "value", "is1", scale=1).collect()[0]["d_num"] == 0
