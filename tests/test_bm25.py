"""BM25 (text/bm25.py) against a hand-computed reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshells_spark.text.bm25 import bm25_batch_scores, bm25_topk

DOCS = [
    (0, "spark join spark window"),
    (1, "join the table"),
    (2, "window window window window window join"),
    (3, "no matching terms here at all"),
]


def _ref_scores(terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        s = 0.0
        for term in terms:
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
        if s:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_topk_matches_reference(spark, corpus):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, ("spark", "join", "window"), k=10).collect()
    }
    want = {d: round(s, 4) for d, s in _ref_scores(("spark", "join", "window")).items()}
    assert got == want
    assert 3 not in got  # docs with no query term don't appear


def test_bm25_topk_limit_and_tiebreak(spark, corpus):
    rows = bm25_topk(corpus, ("join",), k=2).collect()
    assert len(rows) == 2
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_batch_matches_single(spark, corpus):
    queries = spark.createDataFrame(
        [("q0", "spark"), ("q0", "join"), ("q0", "window"), ("q1", "join")],
        "query_id string, term string",
    )
    batch = bm25_batch_scores(corpus, queries)
    got_q0 = {
        r["doc_id"]: round(r["score"], 4)
        for r in batch.filter(F.col("query_id") == "q0").collect()
    }
    single = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, ("spark", "join", "window"), k=10).collect()
    }
    assert got_q0 == single
    got_q1 = {
        r["doc_id"]: round(r["score"], 4)
        for r in batch.filter(F.col("query_id") == "q1").collect()
    }
    assert got_q1 == {d: round(s, 4) for d, s in _ref_scores(("join",)).items()}


def test_bm25_topk_uppercase_query_terms_match(spark, corpus):
    # ADVICE r4: the documented contract is lowercase whole-token
    # matching — uppercase query terms must score identically to
    # lowercase ones, not silently match nothing.
    lo = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, ("spark", "JOIN"), k=10).collect()}
    want = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, ("spark", "join"), k=10).collect()}
    assert lo == want and len(lo) > 0


def test_bm25_topk_backslash_and_quote_terms_safe(spark, corpus):
    # ADVICE r8: terms embed in stack() string literals — backslashes
    # must be escaped (Spark interprets literal escapes: 'a\b' would
    # parse as 'a'+backspace, a trailing backslash swallows the quote)
    # and quotes doubled. None of these terms occur in the corpus, so
    # the result must be EMPTY rows, never a ParseException.
    from redshells_spark.text.bm25 import bm25_topk, bm25_wand_topk

    weird = ("a\\b", "tail\\", "it's", "spark")
    got = bm25_topk(corpus, weird, k=10).collect()
    want = bm25_topk(corpus, ("spark",), k=10).collect()
    assert {r["doc_id"]: r["score"] for r in got} == {
        r["doc_id"]: r["score"] for r in want
    }
    got_w = bm25_wand_topk(corpus, weird, k=10).collect()
    assert {r["doc_id"]: r["score"] for r in got_w} == {
        r["doc_id"]: r["score"] for r in want
    }


def test_bm25_topk_empty_query_terms(spark, corpus):
    # ADVICE r8: stack(0, ...) is a ParseException — empty query terms
    # must return an empty (id, score) frame like the old isin() path.
    from redshells_spark.text.bm25 import bm25_topk, bm25_wand_topk

    out = bm25_topk(corpus, (), k=10)
    assert out.columns == ["doc_id", "score"] and out.count() == 0
    out_w = bm25_wand_topk(corpus, (), k=10)
    assert out_w.columns == ["doc_id", "score"] and out_w.count() == 0
