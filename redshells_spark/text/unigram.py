"""Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model).

The unigram model scores a segmentation of a word as the sum of its
pieces' log-probabilities and tokenizes with the Viterbi best path.
This module provides the pipeline Spark-first:

- :func:`seed_piece_table` — candidate pieces = every substring of the
  distinct-word relation up to ``max_piece_len`` chars, count-weighted
  by corpus word frequency; all single characters are kept
  unconditionally (the fallback alphabet that guarantees every word
  segments), plus the top-``keep_top`` multi-char candidates. Log
  probabilities are fixed-point integers (floor(ln(count)·1e6) −
  floor(ln(total)·1e6)) so every downstream comparison is exact int64.
- :func:`viterbi_segment_words` — the Viterbi DP entirely in Catalyst
  expressions: one projection column per DP position (bounded by
  ``max_word_len``), the piece table embedded as a literal map
  (vocab-bounded by construction, same boundary as BPE's merge list),
  and the backtrace as an ``F.aggregate`` fold. No Python UDF anywhere
  — segmenting the distinct-word relation is one codegen stage.
- :func:`unigram_encode` — corpus application: exploded corpus tokens
  broadcast-join the segmented word table (distinct words ≪ corpus),
  exactly like :func:`redshells_spark.text.bpe.bpe_encode` — encoding
  100 TB is one scan plus one broadcast join.
- :func:`hard_em_round` — one hard-EM re-estimation (re-count pieces
  from the current Viterbi segmentations, renormalize): Kudo's EM with
  Viterbi counts instead of forward-backward expectations, the
  deterministic variant. Iterate as desired; corpus likelihood is
  monotone under hard EM on the training words (unit-tested).

Ties in the DP argmax break toward the LONGER last piece (score desc,
piece-length desc) — deterministic and engine-independent because
scores are exact int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

# sentinel for "no segmentation through this prefix": small enough to
# never win, large enough that max_word_len stacked penalties cannot
# underflow int64
_NEG = -(10**15)


def seed_piece_table(
    words: DataFrame,
    max_piece_len: int = 4,
    keep_top: int = 200,
    word_column: str = "word",
    freq_column: str = "freq",
) -> DataFrame:
    """→ (piece, n_uses, logp_e6) candidate piece table.

    ``n_uses`` counts every occurrence of the piece as a substring of
    the corpus words, weighted by word frequency. Single-character
    pieces are all retained (segmentation fallback); multi-character
    candidates keep the top ``keep_top`` by (count desc, piece asc).
    ``logp_e6`` = floor(ln(n_uses)·1e6) − floor(ln(total)·1e6), an
    exact int64 surrogate for the unigram log-probability."""
    require_columns(words, [word_column, freq_column])
    base = words.select(
        F.col(word_column).alias("__w"), F.col(freq_column).alias("__f")
    )
    starts = base.select(
        "__w",
        "__f",
        F.explode(F.sequence(F.lit(1), F.length("__w"))).alias("__s"),
    )
    lens = starts.select(
        "__w",
        "__f",
        "__s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(int(max_piece_len)),
                    F.length("__w") - F.col("__s") + 1,
                ),
            )
        ).alias("__l"),
    )
    counts = (
        lens.select(
            F.col("__w").substr(F.col("__s"), F.col("__l")).alias("piece"),
            "__f",
        )
        .groupBy("piece")
        .agg(F.sum("__f").cast("long").alias("n_uses"))
    )
    singles = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("n_uses").desc(), F.col("piece").asc())
        .limit(int(keep_top))
    )
    kept = singles.unionByName(multi)
    total = kept.groupBy().agg(F.sum("n_uses").alias("__total"))
    return kept.join(F.broadcast(total)).select(
        "piece",
        "n_uses",
        (
            F.floor(F.log("n_uses") * 1_000_000)
            - F.floor(F.log("__total") * 1_000_000)
        )
        .cast("long")
        .alias("logp_e6"),
    )


def _piece_map(pieces: DataFrame) -> F.Column:
    """The piece table as a literal map column (piece → logp_e6).
    Bounded collect: the table is keep_top + |alphabet| rows by
    construction — the same vocab-bounded boundary BPE's merge list
    crosses."""
    rows = pieces.select("piece", "logp_e6").collect()
    if not rows:
        raise ValueError("empty piece table")
    flat: list[F.Column] = []
    for r in rows:
        flat.append(F.lit(r["piece"]))
        flat.append(F.lit(int(r["logp_e6"])))
    return F.create_map(*flat)


def viterbi_segment_words(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_column: str = "word",
) -> DataFrame:
    """→ (word, pieces:array<string>, n_pieces, score_e6): the Viterbi
    best segmentation of every distinct word under the piece table.

    DP over prefix lengths j = 1..len(word): one projection column per
    j (``withColumn`` keeps the expression tree linear — chaining raw
    expressions would blow up 4^j), candidates are the ≤
    ``max_piece_len`` last-piece lengths, scores exact int64. Words
    longer than ``max_word_len`` are refused loudly — raise the cap
    for real corpora (cost is linear in it)."""
    require_columns(words, [word_column])
    L = int(max_piece_len)
    N = int(max_word_len)
    logp = _piece_map(pieces)
    # loud refusal beats silent truncation: segmenting a truncated word
    # would emit pieces that don't reconstruct the input. The guard
    # lives inside __len (used by every DP column) so Catalyst cannot
    # prune it away.
    df = words.select(F.col(word_column).alias("word")).withColumn(
        "__len",
        F.when(
            F.length("word") > N,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"viterbi_segment_words: word longer than max_word_len={N}: "
                    ),
                    F.col("word"),
                )
            ).cast("int"),
        ).otherwise(F.length("word")),
    )
    # forward DP as ONE runtime fold: chained per-stage projections
    # would let CollapseProject inline dp_{j-1..j-L} into dp_j and blow
    # the expression tree up 4^N; a higher-order aggregate keeps the
    # recurrence symbolic (the lambda is *evaluated* N times per row,
    # never expanded at compile time)
    invalid = F.lit(-(10**17))  # worse than any N-stacked _NEG path

    def _fwd_step(acc, j):
        cands = []
        for l in range(1, L + 1):
            piece = F.col("word").substr(j - l + 1, F.lit(l))
            score = F.when(
                j >= l,
                F.element_at(acc["scores"], j - l + 1)
                + F.coalesce(F.try_element_at(logp, piece), F.lit(_NEG)),
            ).otherwise(invalid)
            cands.append(F.struct(score.alias("s"), F.lit(l).alias("l")))
        # array_max on (score, l) structs: lexicographic max — ties on
        # score break toward the longer last piece. Exact int64 only.
        best = F.array_max(F.array(*cands))
        return F.struct(
            F.concat(acc["scores"], F.array(best["s"])).alias("scores"),
            F.concat(acc["bps"], F.array(best["l"])).alias("bps"),
        )

    fwd0 = F.struct(
        F.array(F.lit(0).cast("long")).alias("scores"),
        F.array(F.lit(0)).alias("bps"),
    )
    df = df.withColumn(
        "__fwd",
        F.aggregate(F.sequence(F.lit(1), F.lit(N)), fwd0, _fwd_step),
    )
    dps = F.col("__fwd")["scores"]
    bps = F.col("__fwd")["bps"]
    # backtrace: fold j from len(word) down, popping bp[j] chars a step
    acc0 = F.struct(
        F.col("__len").alias("j"),
        F.array().cast("array<string>").alias("parts"),
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(N)),
        acc0,
        lambda acc, _: F.when(
            acc["j"] > 0,
            F.struct(
                (acc["j"] - F.element_at(bps, acc["j"] + 1)).alias("j"),
                F.concat(
                    acc["parts"],
                    F.array(
                        F.col("word").substr(
                            acc["j"] - F.element_at(bps, acc["j"] + 1) + 1,
                            F.element_at(bps, acc["j"] + 1),
                        )
                    ),
                ).alias("parts"),
            ),
        ).otherwise(acc),
    )
    return (
        df.withColumn("__walk", walk)
        .select(
            "word",
            F.reverse(F.col("__walk")["parts"]).alias("pieces"),
            F.size(F.col("__walk")["parts"]).cast("long").alias("n_pieces"),
            F.element_at(dps, F.col("__len") + 1).alias("score_e6"),
        )
    )


def hard_em_round(
    words: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_column: str = "word",
    freq_column: str = "freq",
) -> DataFrame:
    """→ a re-estimated (piece, n_uses, logp_e6) table: one hard-EM
    round — count pieces over the current Viterbi segmentations
    (frequency-weighted), keeping the piece set fixed and assigning
    count 0 → drop for pieces no segmentation uses (except single
    chars, which always survive as the fallback alphabet)."""
    seg = viterbi_segment_words(
        words, pieces, max_piece_len, max_word_len, word_column
    )
    used = (
        seg.join(
            words.select(
                F.col(word_column).alias("word"),
                F.col(freq_column).alias("__f"),
            ),
            on="word",
        )
        .select(F.explode("pieces").alias("piece"), "__f")
        .groupBy("piece")
        .agg(F.sum("__f").cast("long").alias("n_uses"))
    )
    # fallback alphabet survives at count >= 1 even when unused
    kept = (
        pieces.select("piece")
        .join(used, on="piece", how="left")
        .select(
            "piece",
            F.when(
                F.length("piece") == 1,
                F.greatest(F.coalesce("n_uses", F.lit(0)), F.lit(1)),
            )
            .otherwise(F.coalesce("n_uses", F.lit(0)))
            .cast("long")
            .alias("n_uses"),
        )
        .filter(F.col("n_uses") > 0)
    )
    total = kept.groupBy().agg(F.sum("n_uses").alias("__total"))
    return kept.join(F.broadcast(total)).select(
        "piece",
        "n_uses",
        (
            F.floor(F.log("n_uses") * 1_000_000)
            - F.floor(F.log("__total") * 1_000_000)
        )
        .cast("long")
        .alias("logp_e6"),
    )


def unigram_encode(
    docs: DataFrame,
    segmented_words: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, pos, sub_pos, piece): every document encoded with the
    trained segmentation — exploded corpus tokens broadcast-join the
    distinct-word table, positions from posexplode (no global sort)."""
    seg = F.broadcast(segmented_words.select("word", "pieces"))
    toks = docs.select(
        F.col(id_column).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_column)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    return (
        toks.join(seg, on="word")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.posexplode("pieces").alias("sub_pos", "piece"),
        )
        .select(
            "doc_id", "pos", F.col("sub_pos").cast("long").alias("sub_pos"), "piece"
        )
    )
