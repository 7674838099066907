"""Distributed byte-pair-encoding (BPE) merge learning and application.

Beyond-reference LLM-pipeline operator (the reference repo has no
tokenizer training; behavioral spec is Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"): learn the
``num_merges`` highest-frequency adjacent symbol pairs over a corpus,
then segment words with the learned merge table.

Scale design
------------
BPE training runs on the **word-frequency table**, not the corpus:
one corpus-wide ``groupBy(token)`` collapses 100 TB of text into a
distinct-word relation (millions of rows at web scale — small next to
the corpus, far too big to require a driver), and every merge
iteration is then one pair-count aggregation + one column rewrite
over that relation. Per iteration the driver receives exactly ONE row
(the arg-max pair); the word table itself is never collected. Lineage
is cut with ``localCheckpoint`` each iteration, so plan size stays
constant in the number of merges (same fix as the pagerank /
k-hop-BFS supersteps in ``operators/graph.py``).

The bracketed-symbol representation
-----------------------------------
A word's symbol sequence is ONE string with every symbol wrapped in
brackets: ``the → [t][h][e]``.  Applying merge ``(a, b) → ab`` is then
plain non-overlapping left-to-right ``replace("[a][b]", "[ab]")`` —
which IS greedy BPE application (``[a][a][a]`` + merge (a,a) →
``[aa][a]``), because the wrapped form shares no boundary characters
between adjacent matches (a space-separated form would: the trailing
space of one match is the leading space of the next, and sequential
``replace`` misses the second occurrence).  Both Spark and DuckDB
implement ``replace`` with identical semantics, so the entire training
loop — pair counting, arg-max, merge application — is expressible in
both engines and the learned merge table hash-MATCHes an unrolled-CTE
oracle (see ``queries.py:bpe_merge_table``).

Symbols never contain ``[`` or ``]`` themselves as long as the input
tokens don't; ``word_freq_table`` refuses bracket-bearing tokens
loudly rather than silently corrupting the representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# pair-key separator: unit separator, never appears in text tokens
SEP = "\x1f"


def word_freq_table(
    docs: DataFrame, text_col: str = "text", token_sep: str = " "
) -> DataFrame:
    """→ (word, freq) over whitespace-tokenized ``text_col``.

    The ONLY corpus-wide pass in BPE training (map-side partial
    counts, one shuffle of distinct words). Empty tokens are dropped;
    tokens containing ``[``/``]`` are refused because they would break
    the bracketed-symbol representation.
    """
    words = (
        docs.select(F.explode(F.split(F.col(text_col), token_sep)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    bad = words.filter(F.col("word").contains("[") | F.col("word").contains("]"))
    if bad.limit(1).count() > 0:
        raise ValueError(
            "word_freq_table: tokens containing '[' or ']' break the bracketed "
            "BPE symbol representation; clean or re-map them first"
        )
    return words


def to_symbols(word_col: str = "word"):
    """Column expr: word → bracketed char-symbol string (``the → [t][h][e]``)."""
    return F.regexp_replace(F.col(word_col), "(.)", "[$1]")


def symbols_to_array(sym_col: str = "sym"):
    """Column expr: bracketed symbol string → array of symbols."""
    inner = F.expr(f"substring({sym_col}, 2, length({sym_col}) - 2)")
    return F.split(inner, "\\]\\[")


def pair_counts(words: DataFrame, sym_col: str = "sym", freq_col: str = "freq") -> DataFrame:
    """→ (left, right, c): frequency-weighted counts of adjacent symbol
    pairs across the word table. One explode + one groupBy — the
    per-iteration cost of BPE training."""
    arr = symbols_to_array(sym_col)
    pairs = F.expr(
        "transform(sequence(1, size(__arr) - 1), "
        f"i -> concat(element_at(__arr, i), '{SEP}', element_at(__arr, i + 1)))"
    )
    return (
        words.withColumn("__arr", arr)
        .filter(F.size("__arr") >= 2)
        .select(F.explode(pairs).alias("pair"), F.col(freq_col))
        .groupBy("pair")
        .agg(F.sum(freq_col).alias("c"))
        .select(
            F.split("pair", SEP)[0].alias("left"),
            F.split("pair", SEP)[1].alias("right"),
            "c",
        )
    )


def _select_exact_batch(
    top: list, m: int, slice_complete: bool, tail_count: int
) -> list[tuple[str, str, int]]:
    """Longest prefix of the count-sorted pair list that sequential BPE
    is GUARANTEED to merge in exactly this order — the exact batched
    variant of the argmax loop.

    Why a prefix of disjoint pairs is sequential-equivalent:
    applying merge (a,b)→ab only changes counts of pairs that touch an
    occurrence of a·b — pairs with right=a or left=b (decrease) and
    new pairs (x,ab)/(ab,y) (created, each with count ≤ count(x,a) /
    count(b,y) ≤ the count of ANY pair sharing a symbol with (a,b)).
    If the next accepted pair shares no symbol with any earlier
    selection, its own count is invariant, and every pair that could
    have overtaken it either (i) has count > c_i — impossible, such a
    pair would sit earlier in the sorted prefix and be selected,
    contradicting disjointness — or (ii) ties at c_i, which the
    tie-scan below rules out conservatively.

    Stop conditions (any → batch ends before row i):
    - row i shares a symbol with an earlier selection (prefix rule —
      skipped-then-accepted pairs can diverge from sequential);
    - some later row with count == c_i is adjacent to a selected
      symbol (right ∈ selected lefts or left ∈ selected rights): a
      new pair born from an earlier merge could tie c_i and win the
      (left, right) tie-break unpredictably;
    - row i's symbol string-equals the CONCATENATION of an earlier
      selection (the earlier merge mints new tokens of that very
      symbol, so row i's true count at its sequential turn exceeds
      the pre-batch count we would record);
    - the tie group of c_i may extend beyond the collected slice
      (c_i == tail_count and the slice was truncated).
    """
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    sel_lefts: set[str] = set()
    sel_rights: set[str] = set()
    minted: set[str] = set()
    for i, row in enumerate(top):
        if len(sel) >= m:
            break
        left, right, c = row["left"], row["right"], int(row["c"])
        if sel:
            if left in used or right in used:
                break
            if left in minted or right in minted:
                break
            if not slice_complete and c == tail_count:
                break
            tie_clash = any(
                int(r2["c"]) == c
                and (r2["right"] in sel_lefts or r2["left"] in sel_rights)
                for r2 in top[i + 1 :]
            )
            if tie_clash:
                break
        sel.append((left, right, c))
        used.update((left, right))
        sel_lefts.add(left)
        sel_rights.add(right)
        minted.add(left + right)
    return sel


def learn_bpe_merges(
    words: DataFrame,
    num_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
    batch_target: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges over a (word, freq) table.

    Returns ``(merges, segmented_words)``:

    - merges: (rank, left, right, merged, pair_count) — rank 1 is the
      most frequent pair; deterministic tie-break (count desc, left
      asc, right asc), so the table is bit-reproducible.
    - segmented_words: (word, freq, sym) — final bracketed
      segmentation of every corpus word under the learned merges.

    Scale note — merges per Spark job: a strict argmax loop costs one
    pair-count job PER merge, so a 32k-merge vocab is 32k sequential
    jobs — driver latency, not data volume, bounds training. Instead,
    each round collects the top ``4·batch_target`` pairs (one bounded
    driver pull) and applies the longest PROVABLY-sequential-
    equivalent prefix in one shot (:func:`_select_exact_batch` —
    symbol-disjoint, tie-safe), cutting jobs by ~batch_target× while
    keeping the learned table bit-identical to the sequential
    algorithm (and to the unrolled-CTE oracle). ``batch_target=1``
    recovers the pure argmax loop.

    The word table is checkpointed once up front (so no later
    iteration replays the corpus-wide groupBy) and then after every
    batch: between checkpoints the lineage grows by one string
    ``replace`` per applied merge — trivial to replay.
    """
    if batch_target < 1:
        raise ValueError("learn_bpe_merges: batch_target must be >= 1")
    spark = words.sparkSession
    cur = words.select("word", "freq", to_symbols("word").alias("sym")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, str, int]] = []
    since_ckpt = 0
    while len(merges) < num_merges:
        slice_n = max(4 * batch_target, 16)
        top = (
            pair_counts(cur)
            .filter(F.col("c") >= min_pair_count)
            .orderBy(F.col("c").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(slice_n)
            .collect()
        )
        if not top:
            break
        batch = _select_exact_batch(
            top,
            m=min(batch_target, num_merges - len(merges)),
            slice_complete=len(top) < slice_n,
            tail_count=int(top[-1]["c"]),
        )
        for left, right, c in batch:
            merged = left + right
            merges.append((len(merges) + 1, left, right, merged, c))
            # Column-literal replace (NOT f-string-into-F.expr): symbols
            # containing quotes/backslashes ("don't", "a\\b") would break
            # or silently no-op an interpolated SQL string literal.
            cur = cur.withColumn(
                "sym",
                F.replace(
                    F.col("sym"), F.lit(f"[{left}][{right}]"), F.lit(f"[{merged}]")
                ),
            )
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            cur = cur.localCheckpoint(eager=True)
            since_ckpt = 0
    merges_df = spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_count long"
    )
    return merges_df, cur


def segment_expr(word_col: str, merges: list[tuple[str, str]]):
    """Column expr applying an already-learned merge list to raw words:
    chars → brackets, then one ``replace`` per merge, nested in rank
    order. Pure whole-stage-codegen string ops — this is the *corpus
    application* path, usable on 100 TB of tokens without touching the
    training relation (broadcast-free: merges are literals in the
    expression tree)."""
    expr = to_symbols(word_col)
    for left, right in merges:
        expr = F.replace(expr, F.lit(f"[{left}][{right}]"), F.lit(f"[{left}{right}]"))
    return expr


def subtoken_count_per_doc(
    docs: DataFrame,
    segmented_words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens, n_subtokens): corpus-wide BPE token stats
    by broadcast-joining exploded tokens against the trained word
    table (distinct words ≪ corpus)."""
    seg = segmented_words.select(
        "word", F.size(symbols_to_array("sym")).alias("n_sub")
    )
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(F.broadcast(seg), on="word", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("n_sub"), F.lit(0))).alias("n_subtokens"),
        )
    )


def bpe_vocab(segmented_words: DataFrame, freq_col: str = "freq") -> DataFrame:
    """→ (token_id, subtoken, n_uses): the subtoken vocabulary of a
    trained segmentation, ids dense from 0 in (corpus-use desc,
    subtoken asc) order — the deterministic id assignment an encoder
    and an oracle can both re-derive. The global row_number runs over
    the VOCABULARY (≤ base chars + num_merges entries), never the
    corpus."""
    subs = (
        segmented_words.select(
            F.explode(symbols_to_array("sym")).alias("subtoken"), F.col(freq_col)
        )
        .groupBy("subtoken")
        .agg(F.sum(freq_col).alias("n_uses"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_uses").desc(), F.col("subtoken").asc())
    return subs.select(
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
        "subtoken",
        F.col("n_uses").cast("long").alias("n_uses"),
    )


def bpe_encode(
    docs: DataFrame,
    segmented_words: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, pos, sub_pos, token_id): every document encoded to
    its BPE token-id sequence — the *production* step after training
    (``learn_bpe_merges``) and id assignment (``bpe_vocab``).

    Scale shape: exploded corpus tokens broadcast-join the segmented
    word table (distinct words ≪ corpus) and the vocabulary (≤ chars +
    merges rows); positions come from posexplode, so no global sort —
    encoding 100 TB is one scan plus two broadcast joins inside
    whole-stage codegen."""
    seg = segmented_words.select(
        "word", symbols_to_array("sym").alias("__subs")
    )
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        toks.join(F.broadcast(seg), "word")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.posexplode("__subs").alias("sub_pos", "subtoken"),
        )
        .join(F.broadcast(vocab.select("token_id", "subtoken")), "subtoken")
        .select(
            "doc_id",
            "pos",
            F.col("sub_pos").cast("long").alias("sub_pos"),
            "token_id",
        )
    )
