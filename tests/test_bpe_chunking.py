"""BPE merge learning, document chunking, within-doc dedup, SCD2
intervals, compaction planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.layout import plan_compaction
from redshells_spark.operators.scd import scd2_intervals
from redshells_spark.text.bpe import (
    learn_bpe_merges,
    segment_expr,
    subtoken_count_per_doc,
    word_freq_table,
)
from redshells_spark.text.chunking import chunk_documents, dedup_within_doc


# ------------------------------------------------------------------ BPE


def _reference_bpe(word_freqs: dict[str, int], num_merges: int, min_count: int = 2):
    """Pure-Python greedy BPE (Sennrich et al. 2016 algorithm 1)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        pairs = {p: c for p, c in pairs.items() if c >= min_count}
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((rank, a, b, a + b, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, vocab


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest newest newest newest"),
    (2, "newer newer newer wider wider wider new new"),
]


def test_bpe_matches_reference_implementation(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = word_freq_table(docs)
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    ref_merges, ref_vocab = _reference_bpe(freqs, 6)

    merges, seg = learn_bpe_merges(wf, 6)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges.orderBy("rank").collect()
    ]
    assert got == ref_merges

    got_vocab = {
        tuple(r["sym"][1:-1].split("][")): r["freq"]
        for r in seg.collect()
    }
    assert got_vocab == ref_vocab


def test_bpe_segment_expr_matches_trained_table(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = word_freq_table(docs)
    merges, seg = learn_bpe_merges(wf, 6)
    ml = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    joined = wf.select("word", segment_expr("word", ml).alias("sym2")).join(seg, "word")
    assert joined.filter(F.col("sym") != F.col("sym2")).count() == 0


def test_bpe_greedy_overlap_semantics(spark):
    # "aaaa" + merge (a,a): greedy left-to-right gives [aa][aa]; "aaa" gives [aa][a]
    docs = spark.createDataFrame([(0, "aaaa aaaa aaa")], "doc_id long, text string")
    merges, seg = learn_bpe_merges(word_freq_table(docs), 1)
    m = merges.collect()[0]
    assert (m["left"], m["right"], m["merged"]) == ("a", "a", "aa")
    got = {r["word"]: r["sym"] for r in seg.collect()}
    assert got == {"aaaa": "[aa][aa]", "aaa": "[aa][a]"}


def test_bpe_stops_below_min_count(spark):
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    merges, _ = learn_bpe_merges(word_freq_table(docs), 5, min_pair_count=2)
    assert merges.count() == 0  # every pair occurs once


def test_word_freq_refuses_brackets(spark):
    docs = spark.createDataFrame([(0, "ok [bad] ok")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bracket"):
        word_freq_table(docs)


def test_subtoken_counts(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = word_freq_table(docs)
    _, seg = learn_bpe_merges(wf, 4)
    out = {r["doc_id"]: (r["n_tokens"], r["n_subtokens"]) for r in
           subtoken_count_per_doc(docs, seg).collect()}
    # token counts are exact; subtokens strictly fewer than chars, >= tokens
    assert out[0][0] == 5 and 5 <= out[0][1] < 15
    assert out[1][0] == 8 and 8 <= out[1][1] < 46


# ------------------------------------------------------------- chunking


def test_chunk_tiling_exact(spark):
    docs = spark.createDataFrame([(0, " ".join(str(i) for i in range(10)))],
                                 "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=5, stride=5).orderBy("chunk_id").collect()
    assert [r["chunk_text"] for r in rows] == ["0 1 2 3 4", "5 6 7 8 9"]
    assert [r["chunk_start"] for r in rows] == [0, 5]


def test_chunk_overlap_covers_all_tokens(spark):
    docs = spark.createDataFrame([(0, " ".join(str(i) for i in range(11)))],
                                 "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=4, stride=3).orderBy("chunk_id").collect()
    assert [r["chunk_start"] for r in rows] == [0, 3, 6, 9]
    assert rows[-1]["n_chunk_tokens"] == 2  # final partial chunk kept
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(11))


def test_chunk_param_guard(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0, stride=1)


def test_dedup_within_doc_tokens(spark):
    docs = spark.createDataFrame([(0, "a b a c b a")], "doc_id long, text string")
    r = dedup_within_doc(docs).collect()[0]
    assert r["text"] == "a b c" and r["n_units"] == 6 and r["n_removed"] == 3


def test_dedup_within_doc_lines(spark):
    docs = spark.createDataFrame(
        [(0, "first line\nsecond line\nfirst line\nthird line")],
        "doc_id long, text string",
    )
    r = dedup_within_doc(docs, unit_sep="\n").collect()[0]
    assert r["text"] == "first line\nsecond line\nthird line"
    assert r["n_units"] == 4 and r["n_removed"] == 1


def test_dedup_keeps_first_occurrence_order(spark):
    docs = spark.createDataFrame([(0, "z y z x y w")], "doc_id long, text string")
    assert dedup_within_doc(docs).collect()[0]["text"] == "z y x w"


# ----------------------------------------------------------------- SCD2


def test_scd2_islands(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a"), (2, 5, "x")],
        "u long, t long, s string",
    )
    rows = scd2_intervals(ev, "u", "s", "t").orderBy("u", "valid_from").collect()
    got = [(r["u"], r["s"], r["valid_from"], r["valid_to"], r["n_events"]) for r in rows]
    assert got == [
        (1, "a", 10, 30, 2),
        (1, "b", 30, 40, 1),
        (1, "a", 40, None, 1),
        (2, "x", 5, None, 1),
    ]


def test_scd2_tie_break_determinism(spark):
    # two events at the same timestamp: event id breaks the tie
    ev = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 101, "b"), (1, 20, 102, "b")],
        "u long, t long, eid long, s string",
    )
    rows = scd2_intervals(ev, "u", "s", "t", tie_break="eid").orderBy("valid_from", "s").collect()
    assert [(r["s"], r["n_events"]) for r in rows] == [("a", 1), ("b", 2)]


# ----------------------------------------------------------- compaction


def test_compaction_bins_near_target(spark):
    files = spark.createDataFrame([(f"f{i:02d}", 30) for i in range(10)],
                                  "path string, bytes long")
    rows = plan_compaction(files, 100).orderBy("bin").collect()
    assert [(r["bin"], r["n_files"], r["total_bytes"]) for r in rows] == [
        (0, 4, 120), (1, 3, 90), (2, 3, 90)]
    assert rows[0]["first_path"] == "f00" and rows[-1]["last_path"] == "f09"


def test_compaction_oversized_file_own_bin(spark):
    files = spark.createDataFrame(
        [("a", 10), ("b", 500), ("c", 10)], "path string, bytes long"
    )
    rows = plan_compaction(files, 100).orderBy("bin").collect()
    # b overflows bin 0; c starts a fresh bin at prefix 510
    assert [(r["bin"], r["n_files"]) for r in rows] == [(0, 2), (5, 1)]


def test_compaction_target_guard(spark):
    files = spark.createDataFrame([("a", 1)], "path string, bytes long")
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(files, 0)


def test_bpe_symbols_with_quotes_and_backslashes(spark):
    # regression: merge application must be column-literal replace, not
    # f-string-into-F.expr — "don't" (quote) crashed with ParseException
    # and a backslash symbol was silently consumed as an escape.
    corpus = [
        (0, "don't don't don't can't can't"),
        (1, "a\\b a\\b a\\b don't can't"),
    ]
    wf = {"don't": 4, "can't": 3, "a\\b": 3}
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges_df, seg = learn_bpe_merges(word_freq_table(docs), 6)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    want, vocab = _reference_bpe(wf, 6)
    assert got == want
    got_seg = {r["word"]: r["sym"] for r in seg.collect()}
    want_seg = {"".join(s): "".join(f"[{t}]" for t in s) for s, _ in vocab.items()}
    assert got_seg == want_seg


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_bpe_batched_equals_sequential(spark, sf_dir):
    # exact batched selection (_select_exact_batch) must reproduce the
    # strict argmax loop bit-for-bit — merge table AND segmentations —
    # while issuing ~batch_target x fewer Spark jobs.
    import time

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = word_freq_table(docs).localCheckpoint(eager=True)
    t0 = time.time()
    m_seq, seg_seq = learn_bpe_merges(wf, 60, batch_target=1)
    seq_rows = [tuple(r) for r in m_seq.orderBy("rank").collect()]
    t_seq = time.time() - t0
    t0 = time.time()
    m_bat, seg_bat = learn_bpe_merges(wf, 60, batch_target=8)
    bat_rows = [tuple(r) for r in m_bat.orderBy("rank").collect()]
    t_bat = time.time() - t0
    assert bat_rows == seq_rows and len(seq_rows) > 10
    seq_seg = {r["word"]: r["sym"] for r in seg_seq.collect()}
    bat_seg = {r["word"]: r["sym"] for r in seg_bat.collect()}
    assert seq_seg == bat_seg
    # not asserted (timing is noisy), but visible in -s runs
    print(f"sequential {t_seq:.1f}s vs batched {t_bat:.1f}s for {len(seq_rows)} merges")


def test_bpe_batch_reference_parity_quoted_corpus(spark):
    # batched selection with the tie/minted-symbol stop conditions still
    # matches the pure-Python reference on a tie-heavy corpus
    corpus = [(0, "ab ab ab abc abc bc bc bc ca ca ca")] * 3
    wf = {"ab": 9, "abc": 6, "bc": 9, "ca": 9}
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(corpus)], "doc_id long, text string"
    )
    merges_df, _ = learn_bpe_merges(word_freq_table(docs), 10, batch_target=4)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    want, _ = _reference_bpe(wf, 10)
    assert got == want


def test_bpe_encode_roundtrip_reconstructs_words(spark):
    # decoding the id sequence must reconstruct every original word:
    # ids -> subtokens concatenated in sub_pos order == source token
    from pyspark.sql import functions as F

    from redshells_spark.text.bpe import bpe_encode, bpe_vocab, learn_bpe_merges

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    _, seg = learn_bpe_merges(word_freq_table(docs), 6)
    vocab = bpe_vocab(seg)
    enc = bpe_encode(docs, seg, vocab)
    # vocab ids are dense 0..n-1 and unique
    vrows = vocab.collect()
    assert sorted(r["token_id"] for r in vrows) == list(range(len(vrows)))
    decoded = (
        enc.join(vocab.select("token_id", "subtoken"), "token_id")
        .groupBy("doc_id", "pos")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub_pos", "subtoken"))),
                    lambda s: s["subtoken"],
                ),
            ).alias("word")
        )
    )
    orig = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).filter(F.col("word") != "")
    mismatch = decoded.join(orig, ["doc_id", "pos"], "full").filter(
        (decoded["word"] != orig["word"])
        | decoded["word"].isNull()
        | orig["word"].isNull()
    )
    assert mismatch.count() == 0
