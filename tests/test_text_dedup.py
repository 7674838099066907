from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshells_spark.dedup.exact import exact_dedup
from redshells_spark.dedup.minhash import (
    connected_components_dedup,
    doc_shingles,
    minhash_lsh_candidates,
    minhash_near_dedup,
    minhash_signatures,
)
from redshells_spark.dedup.ngram import jaccard, ngram_jaccard_pairs, word_ngrams
from redshells_spark.dedup.simhash import simhash_near_dup_pairs, simhash_signatures
from redshells_spark.text.analysis import detect_language, fingerprint, quality_score, token_count
from redshells_spark.text.dictionary import train_dictionary
from redshells_spark.text.tfidf import tfidf_scores, tfidf_top_tokens
from redshells_spark.text.tokenize import tokenize_on_space


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different text about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return tokenize_on_space(df, "text", "tokens", lowercase=True)


def test_tokenize_drops_empty(spark):
    df = spark.createDataFrame([(1, "a  b ")], "doc_id int, text string")
    assert tokenize_on_space(df).head()["tokens"] == ["a", "b"]


def test_train_dictionary_bounds(corpus):
    v = train_dictionary(corpus, no_below=2, no_above=0.9, keep_n=100)
    vocab = {r["token"]: r["doc_freq"] for r in v.collect()}
    # tokens in ≥2 docs and ≤ 0.9·5 docs: the/quick/... appear in 3 docs
    assert vocab["quick"] == 3
    assert "spark" not in vocab  # df=1 < no_below
    # ids dense from 0, ordered by (doc_freq desc, token asc)
    ids = sorted(r["token_id"] for r in v.collect())
    assert ids == list(range(len(ids)))


def test_tfidf_empty_doc_empty_result(corpus):
    v = train_dictionary(corpus, no_below=1, no_above=1.0, keep_n=None)
    scores = tfidf_scores(corpus, v, normalize=False)
    assert scores.filter(F.col("doc_id") == 4).count() == 0  # reference: empty doc → []


def test_tfidf_values(spark):
    docs = tokenize_on_space(
        spark.createDataFrame([(0, "a a b"), (1, "a c")], "doc_id long, text string")
    )
    scores = tfidf_scores(docs, None, normalize=False)
    got = {(r["doc_id"], r["token"]): r["tfidf"] for r in scores.collect()}
    # idf(a)=log2(2/2)=0 → filtered out; idf(b)=idf(c)=log2(2)=1
    assert set(got) == {(0, "b"), (1, "c")}
    assert got[(0, "b")] == pytest.approx(1.0)


def test_tfidf_top_tokens_keep_rule(spark):
    docs = tokenize_on_space(
        spark.createDataFrame(
            [(0, "a b c d e f g h i j unique")], "doc_id long, text string"
        ).union(spark.createDataFrame([(1, "a b")], "doc_id long, text string"))
    )
    scores = tfidf_scores(docs, None, normalize=False)
    top = tfidf_top_tokens(scores, keep_top_rate=0.2)
    # doc 0 has 9 scored tokens (a,b shared → idf 0 dropped): k = ceil(9*0.2)+1 = 3
    assert top.filter(F.col("doc_id") == 0).count() == 3


def test_exact_dedup(corpus):
    plain = corpus.select("doc_id", "text")
    out = exact_dedup(plain, normalized=False)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [0, 1, 2, 4]  # doc 3 deduped onto 0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world")], "doc_id int, text string"
    )
    fps = [r["fingerprint"] for r in fingerprint(df).collect()]
    assert fps[0] == fps[1]


def test_minhash_identical_docs_identical_sigs(corpus):
    v = train_dictionary(corpus, no_below=1, no_above=1.0, keep_n=None)
    sh = doc_shingles(corpus, v)
    sig = minhash_signatures(sh, num_hashes=8)
    s0 = {r["j"]: r["minhash"] for r in sig.filter(F.col("doc_id") == 0).collect()}
    s3 = {r["j"]: r["minhash"] for r in sig.filter(F.col("doc_id") == 3).collect()}
    assert s0 == s3 and len(s0) == 8


def test_minhash_near_dedup_finds_near_dups(corpus):
    v = train_dictionary(corpus, no_below=1, no_above=1.0, keep_n=None)
    pairs = minhash_near_dedup(corpus, v, num_hashes=8, bands=4, rows_per_band=2, threshold=0.5)
    got = {(r["doc_id_0"], r["doc_id_1"]) for r in pairs.collect()}
    assert (0, 3) in got  # exact dup pair must survive
    assert all(p[0] < p[1] for p in got)


def test_connected_components(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "doc_id_0 long, doc_id_1 long")
    cc = {r["doc_id"]: r["keep_id"] for r in connected_components_dedup(pairs).collect()}
    assert cc[2] == 1 and cc[3] == 1 and cc[9] == 7


def test_word_ngrams_and_jaccard(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["a", "b", "d"])], "x array<string>, y array<string>")
    row = df.select(
        word_ngrams("x", 2).alias("gx"), jaccard("x", "y").alias("j")
    ).head()
    assert row["gx"] == ["a␟b", "b␟c"]
    assert row["j"] == pytest.approx(2 / 4)


def test_simhash_properties(corpus):
    sig = simhash_signatures(corpus)
    sigs = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert sigs[0] == sigs[3]  # identical docs → identical signature
    pairs = simhash_near_dup_pairs(sig, max_hamming=3)
    got = {(r["doc_id_0"], r["doc_id_1"]): r["hamming"] for r in pairs.collect()}
    assert got.get((0, 3)) == 0


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a hat and the bat in the vat of fat"),
            (2, "der hund ist nicht mit der katze und das haus"),
        ],
        "doc_id int, text string",
    )
    q = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert q[1] == pytest.approx(1.0)
    langs = {r["doc_id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert langs == {1: "en", 2: "de"}


def test_token_count(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id int, text string")
    row = token_count(df).head()
    assert (row["n_tokens"], row["n_words"]) == (3, 2)


def test_tfidf_empty_doc_yields_no_rows(spark):
    """Reference Tfidf.apply([]) == [] (test/model/test_tfidf.py:16-20):
    relationally, an empty-token doc contributes no score rows and
    poisons nothing else."""
    from redshells_spark.text.tfidf import tfidf_scores

    docs = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["b", "c"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    out = tfidf_scores(docs, normalize=True)
    assert out.filter(F.col("doc_id") == 3).count() == 0
    assert out.filter(F.col("doc_id") != 3).count() > 0


def test_incremental_dedup_against_corpus_index(spark, sf_dir):
    """Delta-ingestion near-dedup: a new batch containing a near-copy
    of a corpus doc gets flagged against the persisted index; novel
    docs pass. Corpus text is never re-read — only the band index and
    stored signatures."""
    from redshells_spark.dedup.minhash import (
        doc_shingles,
        minhash_band_index,
        minhash_dedup_against_index,
        minhash_signatures_wide,
    )
    from redshells_spark.text.dictionary import train_dictionary
    from redshells_spark.text.tokenize import tokenize_on_space

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    toks = tokenize_on_space(docs, "text", "tokens", lowercase=True)
    vocab = train_dictionary(toks, "doc_id", "tokens", no_below=5, no_above=0.9, keep_n=100)
    corpus_wide = minhash_signatures_wide(doc_shingles(toks, vocab), num_hashes=16)
    index = minhash_band_index(corpus_wide, bands=4, rows_per_band=4)

    # new batch: doc 9001 = near-copy of corpus doc (same text, one
    # token appended); doc 9002 = unrelated junk tokens
    base = docs.limit(1).collect()[0]
    from pyspark.sql import functions as F2

    new_docs = spark.createDataFrame(
        [(9001, base["text"] + " extra"), (9002, "zzz qqq xxx yyy www vvv uuu ttt sss rrr")],
        "doc_id long, text string",
    )
    new_toks = tokenize_on_space(new_docs, "text", "tokens", lowercase=True)
    new_wide = minhash_signatures_wide(doc_shingles(new_toks, vocab), num_hashes=16)

    flagged = minhash_dedup_against_index(
        new_wide, index, corpus_wide, threshold=0.5
    ).collect()
    flagged_new = {r["new_doc_id"] for r in flagged}
    assert 9001 in flagged_new
    assert 9002 not in flagged_new
    hit = [r for r in flagged if r["new_doc_id"] == 9001 and r["corpus_doc_id"] == base["doc_id"]]
    assert hit and hit[0]["est_jaccard"] >= 0.5


def test_signature_jaccard_estimator_identical_docs(spark):
    from redshells_spark.dedup.minhash import minhash_jaccard_estimate, minhash_signatures_wide

    sh = spark.createDataFrame(
        [(d, s) for d in (1, 2) for s in (10, 20, 30, 40)], "doc_id long, shingle long"
    )
    wide = minhash_signatures_wide(sh, num_hashes=16)
    pairs = spark.createDataFrame([(1, 2)], "doc_id_0 long, doc_id_1 long")
    out = minhash_jaccard_estimate(pairs, wide, wide, num_hashes=16).collect()
    assert out[0]["est_jaccard"] == 1.0  # identical shingle sets


def test_clean_text_rules(spark):
    from redshells_spark.text.analysis import clean_text

    df = spark.createDataFrame(
        [(1, "<p>Hello&nbsp;  <b>World</b></p>\x07\n\n  spaced\tout ")],
        "doc_id long, text string",
    )
    out = clean_text(df, lowercase=True).head()["clean_text"]
    assert out == "hello&nbsp; world spaced out"
    # opting out of html stripping keeps tags
    kept = clean_text(df, strip_html=False).head()["clean_text"]
    assert "<p>" in kept


def test_redact_pii(spark):
    from redshells_spark.text.analysis import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@example.co.uk or visit https://x.io/p?q=1 from 10.0.0.1 ok")],
        "doc_id long, text string",
    )
    out = redact_pii(df).head()["redacted_text"]
    assert out == "mail <EMAIL> or visit <URL> from <IP> ok"


def test_repetition_signals(spark):
    from redshells_spark.text.analysis import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # one bigram repeated 3x
            (2, "all words fully distinct here"),
            (3, ""),                            # empty → zeros
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["top_bigram_frac"] == pytest.approx(1.0)   # 3/3 same bigram
    assert out[1]["repeated_token_frac"] == pytest.approx(0.75)
    assert out[2]["top_bigram_frac"] == pytest.approx(0.25)  # 1/4 each
    assert out[2]["repeated_token_frac"] == pytest.approx(0.0)
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["repeated_token_frac"] == 0.0


# ------------------------------------------------------- semantic dedup


def _sem_fixture(spark):
    # cluster 0 around e1, cluster 1 around e2; ids 1,2 are dups (cos=1),
    # 3 is their chain-neighbor, 10 is isolated
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),      # exact dup of 1 -> dropped
        (3, [0.9, 0.43589, 0.0, 0.0]),  # cos(1,3)=0.9 -> dropped at t=0.85
        (10, [0.0, 1.0, 0.0, 0.0]),     # other cluster, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    return df, cents


def test_semantic_dedup_lowest_id_survives(spark):
    from redshells_spark.dedup.semantic import semantic_dedup

    df, cents = _sem_fixture(spark)
    kept = {r["vec_id"]: r["cid"] for r in semantic_dedup(df, cents, threshold=0.85).collect()}
    assert kept == {1: 0, 10: 1}


def test_semantic_dedup_pairs_within_cluster_only(spark):
    from redshells_spark.dedup.semantic import semantic_dedup_pairs

    df, cents = _sem_fixture(spark)
    pairs = semantic_dedup_pairs(df, cents, threshold=0.0).collect()
    # the cross-cluster (1,10) pair must never be scored
    assert all({p["id0"], p["id1"]} <= {1, 2, 3} for p in pairs)
    assert {(p["id0"], p["id1"]) for p in pairs} == {(1, 2), (1, 3), (2, 3)}


def test_semantic_dedup_cluster_cap_guard(spark):
    import pytest as _pytest

    from redshells_spark.dedup.semantic import semantic_dedup

    df, cents = _sem_fixture(spark)
    with _pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup(df, cents, threshold=0.9, max_cluster_size=2)


# ------------------------------------------- cross-doc line/unit dedup


def test_split_units_newlines(spark):
    from redshells_spark.dedup.lines import split_units

    docs = spark.createDataFrame(
        [(1, "header\nbody one\n\nfooter"), (2, "header\nbody two\nfooter")],
        "doc_id long, text string",
    )
    units = {(r["doc_id"], r["pos"]): r["unit"] for r in split_units(docs, sep="\n").collect()}
    assert units[(1, 0)] == "header" and units[(1, 3)] == "footer"
    assert (1, 2) not in units  # empty line dropped, positions preserved


def test_block_units_partial_tail(spark):
    from redshells_spark.dedup.lines import block_units

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    units = {r["pos"]: r["unit"] for r in block_units(docs, block_tokens=2).collect()}
    assert units == {0: "a b", 1: "c d", 2: "e"}


def test_cross_doc_unit_dedup_keep_first_global(spark):
    from redshells_spark.dedup.lines import cross_doc_unit_dedup, split_units

    docs = spark.createDataFrame(
        [
            (1, "header\nunique one\nfooter"),
            (2, "header\nunique two\nfooter"),
            (3, "header\nheader\nunique three"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in cross_doc_unit_dedup(
            split_units(docs, sep="\n"), joiner="\n"
        ).collect()
    }
    # doc 1 holds the first occurrence of header AND footer
    assert out[1]["n_dropped"] == 0
    assert out[1]["text"] == "header\nunique one\nfooter"
    # doc 2 loses both boilerplate units
    assert out[2]["n_dropped"] == 2 and out[2]["text"] == "unique two"
    # doc 3: both header copies dropped (first is in doc 1)
    assert out[3]["n_dropped"] == 2 and out[3]["text"] == "unique three"
    assert all(r["n_units"] == 3 for r in out.values())


def test_cross_doc_unit_dedup_fully_dropped_doc_empty_text(spark):
    from redshells_spark.dedup.lines import cross_doc_unit_dedup, split_units

    docs = spark.createDataFrame(
        [(1, "dup"), (2, "dup")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in cross_doc_unit_dedup(split_units(docs)).collect()}
    assert out[1]["text"] == "dup" and out[2]["text"] == ""
    assert out[2]["n_dropped"] == 1
