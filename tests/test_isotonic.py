"""Exact isotonic fit: parity with a pure-Python PAV reference,
monotonicity, level guard."""

from __future__ import annotations

import pytest

from redshells_spark.ml.isotonic_exact import NANO, isotonic_fit_exact


def _pav(levels):
    """Classic pool-adjacent-violators on [(n, pos)] in score order."""
    blocks = [[n, pos] for n, pos in levels]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand back to one value per level
    expanded = []
    it = iter(levels)
    for n_blk, pos_blk in blocks:
        consumed = 0
        while consumed < n_blk:
            n, _ = next(it)
            consumed += n
            expanded.append(pos_blk / n_blk)
    return expanded


LEVELS = [  # (score, n, pos) — has violators to pool
    (1, 10, 1),
    (2, 10, 5),
    (3, 10, 3),  # violator: 0.3 < 0.5
    (4, 10, 4),  # still below the 2-3 pool mean
    (5, 10, 9),
]


@pytest.fixture()
def df(spark):
    rows = []
    for s, n, pos in LEVELS:
        rows += [(s, 1)] * pos + [(s, 0)] * (n - pos)
    return spark.createDataFrame(rows, "score long, y long")


def test_matches_pav_reference(spark, df):
    got = {
        r["score"]: r["iso_e9"]
        for r in isotonic_fit_exact(df, "score", "y").collect()
    }
    ref = _pav([(n, pos) for _, n, pos in LEVELS])
    for (s, _, _), want in zip(LEVELS, ref):
        assert abs(got[s] - round(want * NANO)) <= 1, (s, got[s], want)


def test_monotone_nondecreasing(spark, df):
    rows = sorted(
        isotonic_fit_exact(df, "score", "y").collect(), key=lambda r: r["score"]
    )
    vals = [r["iso_e9"] for r in rows]
    assert vals == sorted(vals)
    # pooled block 2..4: (5+3+4)/30
    assert vals[1] == vals[2] == vals[3] == round((5 + 3 + 4) / 30 * NANO)


def test_already_monotone_unchanged(spark):
    rows = [(1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {r["score"]: r["iso_e9"] for r in isotonic_fit_exact(df, "score", "y").collect()}
    assert got == {1: 0, 2: round(NANO / 2), 3: NANO}


def test_level_guard(spark):
    df = spark.createDataFrame([(i, 0) for i in range(50)], "score long, y long")
    with pytest.raises(ValueError, match="distinct score levels"):
        isotonic_fit_exact(df, "score", "y", max_levels=10)


def test_matches_pav_reference_many_levels(spark):
    # regression companion to the O(k^3)->O(k^2) suffix-min rewrite:
    # a k=120 level table (would be ~1.7M triples under the old
    # triangle join) still matches pure-Python PAV exactly.
    levels = []
    for s in range(120):
        n = 3 + (s * 7) % 5
        pos = (s * 2654435761 + 17) % (n + 1)
        levels.append((s, n, pos))
    rows = []
    for s, n, pos in levels:
        rows += [(s, 1)] * pos + [(s, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "score long, y long")
    got = {r["score"]: r["iso_e9"] for r in isotonic_fit_exact(df, "score", "y").collect()}
    ref = _pav([(n, pos) for _, n, pos in levels])
    assert len(got) == 120
    for (s, _, _), want in zip(levels, ref):
        assert abs(got[s] - round(want * NANO)) <= 1, (s, got[s], want)
