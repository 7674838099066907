"""Round-5 session-4 additions: generation-eval metrics (corpus BLEU,
ROUGE-N, chrF, distinct-n), inter-annotator agreement (majority vote,
Fleiss/Cohen kappa, Krippendorff alpha), and preference-data
construction (DPO pairs, best-of-n, win-rate matrix).

Registered after r5c_ops; the package __init__ surfaces these at the
head of _FRONT so they land inside the driver's 50-query window.

Candidate/reference pairs for the text metrics are derived
deterministically from ``documents``: reference = the doc's tokens,
candidate = the same tokens with every 7th replaced by 'the' and
every 11th dropped — a synthetic "noisy MT output" whose overlap
statistics exercise clipping, precision<1, and a brevity gap, while
staying a pure function of the corpus (both engines derive it with
identical index arithmetic; Spark lambdas index from 0, DuckDB's from
1, hence the (i+1) vs i offsets below).
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403


# ------------------------------------------------------------------ helpers

# DuckDB side of the pair derivation (1-based lambda indices)
_PAIRS_SQL = """
    base AS (
        SELECT doc_id, source, lang,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS ref
        FROM documents),
    pairs AS (
        SELECT doc_id, source, lang, ref,
               list_filter(
                 list_transform(ref,
                   (t, i) -> CASE WHEN i % 7 = 3 THEN 'the' ELSE t END),
                 (t, i) -> i % 11 <> 5) AS cand
        FROM base)
"""

# Spark side (0-based lambda indices -> i+1)
_CAND_EXPR = (
    "filter(transform(tokens, (t, i) -> "
    "CASE WHEN (i+1) % 7 = 3 THEN 'the' ELSE t END), "
    "(t, i) -> (i+1) % 11 != 5)"
)


def _pairs_df(spark, sf_dir):
    # repartition BEFORE the n-gram explosion: the source is one small
    # parquet file (a single input split), and without this the entire
    # multi-order gram explode — the heavy leg, ~300 gram rows per doc
    # per side — runs in one task. Shuffling the compact doc rows is
    # ~1% of the exploded volume; at production scale the input is
    # already many splits and Catalyst elides nothing here it needs.
    toks = _tokens(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return toks.select(
        "doc_id",
        "source",
        "lang",
        F.col("tokens").alias("ref"),
        F.expr(_CAND_EXPR).alias("cand"),
    )


def _word_grams_sql(col: str, n: int, extra_cols: str = "") -> str:
    """Inner SELECT producing (doc_id[, extra], ngram) word n-grams of
    a list column from the ``pairs`` CTE."""
    return (
        f"SELECT doc_id{extra_cols}, unnest(list_transform("
        f"generate_series(1, len({col})-{n}+1), "
        f"i -> array_to_string({col}[i:i+{n}-1], ' '))) AS ngram FROM pairs"
    )


def _char_grams_sql(col: str, n: int, extra_cols: str = "") -> str:
    return (
        f"SELECT doc_id{extra_cols}, unnest(list_transform("
        f"generate_series(1, length({col})-{n}+1), "
        f"i -> substr({col}, i, {n}))) AS ngram FROM ch"
    )


def _bleu_oracle() -> str:
    parts = [f"WITH {_PAIRS_SQL},"]
    parts.append(
        "lens AS (SELECT CAST(sum(len(cand)) AS BIGINT) AS cand_len,"
        " CAST(sum(len(ref)) AS BIGINT) AS ref_len FROM pairs),"
    )
    ss = []
    for n in range(1, 5):
        parts.append(
            f"cg{n} AS (SELECT doc_id, ngram, CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_word_grams_sql('cand', n)}) GROUP BY 1, 2),"
        )
        parts.append(
            f"rg{n} AS (SELECT doc_id, ngram, CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_word_grams_sql('ref', n)}) GROUP BY 1, 2),"
        )
        parts.append(
            f"s{n} AS (SELECT CAST({n} AS BIGINT) AS n,"
            f" CAST(coalesce((SELECT sum(least(c.cnt, r.cnt)) FROM cg{n} c"
            f" JOIN rg{n} r ON c.doc_id = r.doc_id AND c.ngram = r.ngram), 0)"
            f" AS BIGINT) AS clipped,"
            f" CAST((SELECT sum(cnt) FROM cg{n}) AS BIGINT) AS total),"
        )
        ss.append(f"SELECT * FROM s{n}")
    union = " UNION ALL ".join(ss)
    parts.append(f"u AS ({union})")
    parts.append(
        "SELECT n, clipped, total,"
        " CAST(clipped AS DOUBLE) / total AS precision_n, cand_len, ref_len"
        " FROM u CROSS JOIN lens"
    )
    return "\n".join(parts)


@q("corpus_bleu", _bleu_oracle())
def _corpus_bleu(spark, sf_dir):
    """Corpus BLEU sufficient statistics (text/geneval.py
    bleu_corpus_stats): modified n-gram precisions for n=1..4 over
    (candidate, reference) token pairs, plus corpus lengths for the
    brevity penalty. n-grams are per-row array transforms (codegen,
    zero shuffle); the clip is one co-partitioned join per order; the
    final exp/log combine stays out of the relation so every exported
    value is exact-int or a single IEEE division."""
    from redshells_spark.text.geneval import bleu_corpus_stats

    pairs = _pairs_df(spark, sf_dir)
    return bleu_corpus_stats(pairs, "doc_id", "cand", "ref", max_n=4)


def _rouge_oracle() -> str:
    parts = [f"WITH {_PAIRS_SQL},"]
    gs = []
    for n in (1, 2):
        parts.append(
            f"cg{n} AS (SELECT doc_id, source, ngram,"
            f" CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_word_grams_sql('cand', n, ', source')}) GROUP BY 1, 2, 3),"
        )
        parts.append(
            f"rg{n} AS (SELECT doc_id, source, ngram,"
            f" CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_word_grams_sql('ref', n, ', source')}) GROUP BY 1, 2, 3),"
        )
        parts.append(
            f"cl{n} AS (SELECT c.source, CAST(sum(least(c.cnt, r.cnt)) AS BIGINT)"
            f" AS clipped FROM cg{n} c JOIN rg{n} r"
            f" ON c.doc_id = r.doc_id AND c.ngram = r.ngram GROUP BY 1),"
        )
        parts.append(
            f"ct{n} AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS cand_total"
            f" FROM cg{n} GROUP BY 1),"
        )
        parts.append(
            f"rt{n} AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ref_total"
            f" FROM rg{n} GROUP BY 1),"
        )
        parts.append(
            f"g{n} AS (SELECT ct{n}.source, CAST({n} AS BIGINT) AS n,"
            f" CAST(coalesce(cl{n}.clipped, 0) AS BIGINT) AS clipped,"
            f" cand_total, ref_total"
            f" FROM ct{n} JOIN rt{n} USING (source)"
            f" LEFT JOIN cl{n} USING (source)),"
        )
        gs.append(f"SELECT * FROM g{n}")
    parts.append(f"u AS ({' UNION ALL '.join(gs)})")
    parts.append(
        "SELECT source, n, clipped, cand_total, ref_total,"
        " CAST(clipped AS DOUBLE) / cand_total AS rouge_p,"
        " CAST(clipped AS DOUBLE) / ref_total AS rouge_r,"
        " CASE WHEN clipped = 0 THEN 0.0 ELSE"
        " 2 * (CAST(clipped AS DOUBLE) / cand_total)"
        " * (CAST(clipped AS DOUBLE) / ref_total)"
        " / ((CAST(clipped AS DOUBLE) / cand_total)"
        " + (CAST(clipped AS DOUBLE) / ref_total)) END AS rouge_f1"
        " FROM u"
    )
    return "\n".join(parts)


@q("rouge_by_source", _rouge_oracle())
def _rouge_by_source(spark, sf_dir):
    """ROUGE-1/2 per source (text/geneval.py rouge_n_stats): clipped
    overlap + precision/recall/F1 of the synthetic candidate against
    its reference, grouped by corpus source — the per-slice summary a
    distillation pipeline tracks. Counting joins only; each ratio is
    one exact-long IEEE division, F1 a fixed tree over the two."""
    from redshells_spark.text.geneval import rouge_n_stats

    pairs = _pairs_df(spark, sf_dir)
    return rouge_n_stats(
        pairs, "doc_id", "cand", "ref", orders=(1, 2), group_cols=("source",)
    )


def _chrf_oracle() -> str:
    parts = [f"WITH {_PAIRS_SQL},"]
    parts.append(
        "ch AS (SELECT doc_id, lang, array_to_string(cand, '') AS cs,"
        " array_to_string(ref, '') AS rs FROM pairs),"
    )
    gs = []
    for n in (1, 2, 3):
        parts.append(
            f"ccg{n} AS (SELECT doc_id, lang, ngram,"
            f" CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_char_grams_sql('cs', n, ', lang')}) GROUP BY 1, 2, 3),"
        )
        parts.append(
            f"crg{n} AS (SELECT doc_id, lang, ngram,"
            f" CAST(count(*) AS BIGINT) AS cnt"
            f" FROM ({_char_grams_sql('rs', n, ', lang')}) GROUP BY 1, 2, 3),"
        )
        parts.append(
            f"ccl{n} AS (SELECT c.lang, CAST(sum(least(c.cnt, r.cnt)) AS BIGINT)"
            f" AS clipped FROM ccg{n} c JOIN crg{n} r"
            f" ON c.doc_id = r.doc_id AND c.ngram = r.ngram GROUP BY 1),"
        )
        parts.append(
            f"cct{n} AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS cand_total"
            f" FROM ccg{n} GROUP BY 1),"
        )
        parts.append(
            f"crt{n} AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS ref_total"
            f" FROM crg{n} GROUP BY 1),"
        )
        parts.append(
            f"cgr{n} AS (SELECT cct{n}.lang, CAST({n} AS BIGINT) AS n,"
            f" CAST(coalesce(ccl{n}.clipped, 0) AS BIGINT) AS clipped,"
            f" cand_total, ref_total"
            f" FROM cct{n} JOIN crt{n} USING (lang)"
            f" LEFT JOIN ccl{n} USING (lang)),"
        )
        gs.append(f"SELECT * FROM cgr{n}")
    parts.append(f"u AS ({' UNION ALL '.join(gs)})")
    parts.append(
        "SELECT lang, n, clipped, cand_total, ref_total,"
        " CAST(clipped AS DOUBLE) / cand_total AS chrf_p,"
        " CAST(clipped AS DOUBLE) / ref_total AS chrf_r,"
        " CASE WHEN clipped = 0 THEN 0.0 ELSE"
        " 5.0 * (CAST(clipped AS DOUBLE) / cand_total)"
        " * (CAST(clipped AS DOUBLE) / ref_total)"
        " / (4.0 * (CAST(clipped AS DOUBLE) / cand_total)"
        " + (CAST(clipped AS DOUBLE) / ref_total)) END AS chrf_fbeta"
        " FROM u"
    )
    return "\n".join(parts)


@q("chrf_by_lang", _chrf_oracle())
def _chrf_by_lang(spark, sf_dir):
    """chrF2 per language (text/geneval.py chrf_stats): character
    1-3-gram precision/recall/F_beta=2 of candidate vs reference —
    the tokenizer-free MT metric, robust for morphology-rich langs.
    Spaces are removed before gram extraction (the chrF convention);
    tokens carry none, so both engines see identical strings."""
    from redshells_spark.text.geneval import chrf_stats

    pairs = _pairs_df(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.concat_ws("", F.col("cand")).alias("cs"),
        F.concat_ws("", F.col("ref")).alias("rs"),
    )
    return chrf_stats(
        pairs, "doc_id", "cs", "rs", orders=(1, 2, 3), beta=2.0,
        group_cols=("lang",),
    )


def _distinct_n_oracle() -> str:
    parts = [f"WITH {_PAIRS_SQL},"]
    ss = []
    for n in (1, 2):
        parts.append(
            f"dg{n} AS (SELECT source, ngram"
            f" FROM ({_word_grams_sql('ref', n, ', source')})),"
        )
        parts.append(
            f"ds{n} AS (SELECT source, CAST({n} AS BIGINT) AS n,"
            f" CAST(count(DISTINCT ngram) AS BIGINT) AS distinct_ngrams,"
            f" CAST(count(*) AS BIGINT) AS total_ngrams FROM dg{n} GROUP BY 1),"
        )
        ss.append(f"SELECT * FROM ds{n}")
    parts.append(f"u AS ({' UNION ALL '.join(ss)})")
    parts.append(
        "SELECT source, n, distinct_ngrams, total_ngrams,"
        " CAST(distinct_ngrams AS DOUBLE) / total_ngrams AS distinct_ratio"
        " FROM u"
    )
    return "\n".join(parts)


@q("distinct_ngram_diversity", _distinct_n_oracle())
def _distinct_ngram_diversity(spark, sf_dir):
    """distinct-1/distinct-2 generation-diversity ratios per source
    (text/geneval.py distinct_n_diversity) — low distinct-2 flags
    templated/degenerate text on a corpus card. Two map-combined
    aggregates per order over per-row gram transforms."""
    from redshells_spark.text.geneval import distinct_n_diversity

    toks = _tokens(spark, sf_dir)
    return distinct_n_diversity(
        toks, "tokens", group_cols=("source",), orders=(1, 2)
    )


@q(
    "majority_vote_labels",
    """WITH c AS (
         SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS votes
         FROM events GROUP BY 1, 2),
       t AS (SELECT user_id, CAST(sum(votes) AS BIGINT) AS total_votes
             FROM c GROUP BY 1),
       r AS (SELECT user_id, event_type, votes,
                    row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY votes DESC, event_type ASC) AS rk
             FROM c)
       SELECT r.user_id, r.event_type, r.votes, t.total_votes,
              CAST(r.votes AS DOUBLE) / t.total_votes AS agreement
       FROM r JOIN t USING (user_id) WHERE rk = 1""",
)
def _majority_vote_labels(spark, sf_dir):
    """Label aggregation by majority vote (ml/agreement.py
    majority_vote): each user's events vote for an event_type; the
    winner (count desc, label asc ties) ships with its agreement
    ratio — the confidence a downstream label filter thresholds on.
    One combinable count + one per-item window."""
    from redshells_spark.ml.agreement import majority_vote

    ev = _t(spark, sf_dir, "events")
    return majority_vote(ev.select("user_id", "event_type"), "user_id", "event_type")


_RATINGS_SQL = """
    seq AS (
        SELECT user_id, event_type,
               row_number() OVER (
                 PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rk
        FROM events)
"""


def _fleiss_oracle(n: int) -> str:
    return f"""WITH {_RATINGS_SQL},
       r AS (SELECT user_id, event_type FROM seq WHERE rk <= {n}),
       ni AS (SELECT user_id FROM r GROUP BY 1 HAVING count(*) = {n}),
       nij AS (SELECT r.user_id, r.event_type, CAST(count(*) AS BIGINT) AS nij
               FROM r JOIN ni USING (user_id) GROUP BY 1, 2),
       a AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_items,
                    CAST(sum(nij * nij) AS BIGINT) AS sum_nij_sq
             FROM nij),
       cj AS (SELECT event_type, CAST(sum(nij) AS BIGINT) AS cj
              FROM nij GROUP BY 1),
       b AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS sum_cj_sq FROM cj)
       SELECT n_items, CAST({n} AS BIGINT) AS n_per_item,
              sum_nij_sq, sum_cj_sq,
              CAST(sum_nij_sq - n_items * {n} AS DOUBLE)
                / CAST(n_items * {n} * ({n} - 1) AS DOUBLE) AS p_o,
              CAST(sum_cj_sq AS DOUBLE)
                / CAST(n_items * {n} * (n_items * {n}) AS DOUBLE) AS p_e,
              ((CAST(sum_nij_sq - n_items * {n} AS DOUBLE)
                / CAST(n_items * {n} * ({n} - 1) AS DOUBLE))
               - (CAST(sum_cj_sq AS DOUBLE)
                / CAST(n_items * {n} * (n_items * {n}) AS DOUBLE)))
              / (1.0 - (CAST(sum_cj_sq AS DOUBLE)
                / CAST(n_items * {n} * (n_items * {n}) AS DOUBLE))) AS kappa
       FROM a CROSS JOIN b"""


@q("fleiss_kappa_ratings", _fleiss_oracle(5))
def _fleiss_kappa_ratings(spark, sf_dir):
    """Fleiss' kappa over each user's first 5 events treated as 5
    ratings of the item "user" (ml/agreement.py fleiss_kappa) — the
    multi-rater chance-corrected agreement a labeling pipeline gates
    on before trusting labels. Numerators are exact int64 sums;
    p_o/p_e/kappa are a fixed IEEE tree over them, so the single
    output row is bit-identical across engines and partitionings."""
    from redshells_spark.ml.agreement import fleiss_kappa

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_us(ev, "ts").asc(), F.col("event_id").asc()
    )
    first5 = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("user_id", "event_type")
    )
    return fleiss_kappa(first5, "user_id", "event_type", 5)


@q(
    "cohen_kappa_positions",
    f"""WITH {_RATINGS_SQL},
       r AS (SELECT user_id, rk, event_type FROM seq WHERE rk <= 3),
       j AS (SELECT a.user_id, a.rk AS ann_a, b.rk AS ann_b,
                    a.event_type AS la, b.event_type AS lb
             FROM r a JOIN r b
             ON a.user_id = b.user_id AND a.rk < b.rk),
       agg AS (SELECT ann_a, ann_b,
                      CAST(count(*) AS BIGINT) AS n_items,
                      CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_agree
               FROM j GROUP BY 1, 2),
       ma AS (SELECT ann_a, ann_b, la, CAST(count(*) AS BIGINT) AS ca
              FROM j GROUP BY 1, 2, 3),
       mb AS (SELECT ann_a, ann_b, lb, CAST(count(*) AS BIGINT) AS cb
              FROM j GROUP BY 1, 2, 3),
       pe AS (SELECT ma.ann_a, ma.ann_b,
                     CAST(sum(ma.ca * mb.cb) AS BIGINT) AS pe_num
              FROM ma JOIN mb
              ON ma.ann_a = mb.ann_a AND ma.ann_b = mb.ann_b
                 AND ma.la = mb.lb
              GROUP BY 1, 2)
       SELECT CAST(agg.ann_a AS BIGINT) AS ann_a,
              CAST(agg.ann_b AS BIGINT) AS ann_b,
              n_items, n_agree, pe_num,
              CAST(n_agree AS DOUBLE) / n_items AS p_o,
              CAST(pe_num AS DOUBLE) / CAST(n_items * n_items AS DOUBLE) AS p_e,
              ((CAST(n_agree AS DOUBLE) / n_items)
               - (CAST(pe_num AS DOUBLE) / CAST(n_items * n_items AS DOUBLE)))
              / (1.0 - (CAST(pe_num AS DOUBLE)
                        / CAST(n_items * n_items AS DOUBLE))) AS kappa
       FROM agg JOIN pe ON agg.ann_a = pe.ann_a AND agg.ann_b = pe.ann_b""",
)
def _cohen_kappa_positions(spark, sf_dir):
    """Cohen's kappa between each pair of "annotators" = a user's
    1st/2nd/3rd event positions (ml/agreement.py cohen_kappa_pairs) —
    the two-rater agreement statistic, here measuring behavioral
    self-consistency over time. Pair grid quadratic in annotators
    only; items flow through one co-partitioned self-join."""
    from redshells_spark.ml.agreement import cohen_kappa_pairs

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_us(ev, "ts").asc(), F.col("event_id").asc()
    )
    seq = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "rk", "event_type")
    )
    out = cohen_kappa_pairs(seq, "user_id", "rk", "event_type")
    return out.select(
        F.col("ann_a").cast("long").alias("ann_a"),
        F.col("ann_b").cast("long").alias("ann_b"),
        "n_items",
        "n_agree",
        "pe_num",
        "p_o",
        "p_e",
        "kappa",
    )


def _kripp_oracle(n: int) -> str:
    return f"""WITH {_RATINGS_SQL},
       r AS (SELECT user_id, event_type FROM seq WHERE rk <= {n}),
       ni AS (SELECT user_id FROM r GROUP BY 1 HAVING count(*) = {n}),
       nij AS (SELECT r.user_id, r.event_type, CAST(count(*) AS BIGINT) AS nij
               FROM r JOIN ni USING (user_id) GROUP BY 1, 2),
       a AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_items,
                    CAST(sum(nij * nij) AS BIGINT) AS sum_nij_sq
             FROM nij),
       cj AS (SELECT event_type, CAST(sum(nij) AS BIGINT) AS cj
              FROM nij GROUP BY 1),
       b AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS sum_cj_sq FROM cj)
       SELECT n_items, CAST({n} AS BIGINT) AS n_per_item,
              CAST(n_items * {n} * {n} - sum_nij_sq AS BIGINT) AS do_num,
              CAST(n_items * {n} * (n_items * {n}) - sum_cj_sq AS BIGINT)
                AS de_num,
              CAST(n_items * {n} * {n} - sum_nij_sq AS DOUBLE)
                / CAST(n_items * {n} * ({n} - 1) AS DOUBLE) AS d_o,
              CAST(n_items * {n} * (n_items * {n}) - sum_cj_sq AS DOUBLE)
                / CAST(n_items * {n} * (n_items * {n} - 1) AS DOUBLE) AS d_e,
              1.0 - (CAST(n_items * {n} * {n} - sum_nij_sq AS DOUBLE)
                / CAST(n_items * {n} * ({n} - 1) AS DOUBLE))
              / (CAST(n_items * {n} * (n_items * {n}) - sum_cj_sq AS DOUBLE)
                / CAST(n_items * {n} * (n_items * {n} - 1) AS DOUBLE)) AS alpha
       FROM a CROSS JOIN b"""


@q("krippendorff_alpha", _kripp_oracle(4))
def _krippendorff_alpha(spark, sf_dir):
    """Krippendorff's alpha (nominal) over each user's first 4 events
    as 4 ratings (ml/agreement.py krippendorff_alpha_nominal) —
    Fleiss with the small-sample Nn−1 expected-disagreement
    correction. Same exact-int + fixed-tree export discipline."""
    from redshells_spark.ml.agreement import krippendorff_alpha_nominal

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_us(ev, "ts").asc(), F.col("event_id").asc()
    )
    first4 = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .select("user_id", "event_type")
    )
    return krippendorff_alpha_nominal(first4, "user_id", "event_type", 4)


@q(
    "dpo_preference_pairs",
    """WITH b AS (
         SELECT o_custkey, o_orderkey,
                CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS price_c
         FROM orders),
       top AS (SELECT o_custkey, o_orderkey, price_c,
                      row_number() OVER (
                        PARTITION BY o_custkey
                        ORDER BY price_c DESC, o_orderkey ASC) AS pr
               FROM b),
       bot AS (SELECT o_custkey, o_orderkey, price_c,
                      row_number() OVER (
                        PARTITION BY o_custkey
                        ORDER BY price_c ASC, o_orderkey DESC) AS pr
               FROM b)
       SELECT t.o_custkey AS custkey,
              t.o_orderkey AS chosen_item,
              t.price_c AS chosen_score,
              bt.o_orderkey AS rejected_item,
              bt.price_c AS rejected_score,
              CAST(t.price_c - bt.price_c AS BIGINT) AS margin,
              CAST(t.pr AS BIGINT) AS pair_rank
       FROM top t JOIN bot bt
         ON t.o_custkey = bt.o_custkey AND t.pr = bt.pr
       WHERE t.pr <= 2 AND t.o_orderkey <> bt.o_orderkey
         AND t.price_c - bt.price_c >= 50000""",
)
def _dpo_preference_pairs(spark, sf_dir):
    """DPO (chosen, rejected) pair construction (data/preference.py
    preference_pairs): per customer, pair the i-th highest-priced
    order with the i-th lowest for i<=2, keeping pairs whose margin
    is >= $500 in exact cents — the margin-gated preference-pair
    builder behind DPO/RLHF datasets. Two WindowGroupLimit windows +
    one co-partitioned join; scores compare as exact int64 cents."""
    from redshells_spark.data.preference import preference_pairs

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        money_units(F.col("o_totalprice")).alias("price_c"),
    )
    return preference_pairs(
        o, "custkey", "o_orderkey", "price_c",
        min_margin=50000, max_pairs_per_group=2,
    )


@q(
    "best_of_n_responses",
    """WITH b AS (
         SELECT user_id, event_id,
                CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS score_c
         FROM events WHERE event_type = 'purchase'),
       r AS (SELECT user_id, event_id, score_c,
                    row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY score_c DESC, event_id ASC) AS rk
             FROM b),
       n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_candidates
             FROM b GROUP BY 1),
       best AS (SELECT user_id, event_id AS best_item, score_c AS best_score
                FROM r WHERE rk = 1),
       second AS (SELECT user_id, score_c AS second_score FROM r WHERE rk = 2)
       SELECT best.user_id, best_item, best_score, second_score,
              CAST(best_score - second_score AS BIGINT) AS margin,
              n_candidates
       FROM best LEFT JOIN second USING (user_id) JOIN n USING (user_id)""",
)
def _best_of_n_responses(spark, sf_dir):
    """Best-of-n / rejection-sampling selection (data/preference.py
    best_of_n): per user, the top-valued purchase, the runner-up
    score, and the exact-cents win margin — the selection step of a
    reward-ranked pipeline. One window partitioned by the group key,
    no global sort."""
    from redshells_spark.data.preference import best_of_n

    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        money_units(F.col("value")).alias("score_c"),
    )
    return best_of_n(b, "user_id", "event_id", "score_c")



def _event_seq_pairs(spark, sf_dir):
    """Consecutive same-user event pairs of different types — the
    shared match-log base of model_win_rate_matrix,
    judge_position_bias, and winrate_bootstrap_ci (and, in SQL form,
    _BT_MATCHES_CTE_LOCAL / bradley_terry_ratings). Columns:
    event_id, event_type, value, prev_type, prev_value."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_us(ev, "ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
    ).filter(
        F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type"))
    )


_BT_MATCHES_CTE_LOCAL = """matches AS (
    SELECT CASE WHEN prev_value >= value THEN prev_type ELSE event_type END AS winner,
           CASE WHEN prev_value >= value THEN event_type ELSE prev_type END AS loser
    FROM (
      SELECT user_id, event_type, value,
             lag(event_type) OVER w AS prev_type,
             lag(value) OVER w AS prev_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
    WHERE prev_type IS NOT NULL AND prev_type <> event_type)"""


@q(
    "model_win_rate_matrix",
    f"""WITH {_BT_MATCHES_CTE_LOCAL},
       m AS (SELECT least(winner, loser) AS model_a,
                    greatest(winner, loser) AS model_b,
                    CASE WHEN winner < loser THEN 1 ELSE 0 END AS a_won
             FROM matches),
       s AS (SELECT model_a, model_b,
                    CAST(count(*) AS BIGINT) AS games,
                    CAST(sum(a_won) AS BIGINT) AS wins_a
             FROM m GROUP BY 1, 2),
       w AS (SELECT model_a, model_b, games, wins_a,
                    CAST(wins_a AS DOUBLE) / games AS p,
                    CAST(1.96 AS DOUBLE) AS z
             FROM s)
       SELECT model_a, model_b, games, wins_a, p AS win_rate_a,
              (p + z * z / (2 * games)
               - z * sqrt(p * (1 - p) / games
                          + z * z / (4 * games * games)))
                / (1 + z * z / games) AS wilson_lo,
              (p + z * z / (2 * games)
               + z * sqrt(p * (1 - p) / games
                          + z * z / (4 * games * games)))
                / (1 + z * z / games) AS wilson_hi
       FROM w""",
)
def _model_win_rate_matrix(spark, sf_dir):
    """Pairwise win-rate matrix with Wilson bounds (data/preference.py
    win_rate_matrix) over the SAME match log Bradley-Terry rates
    globally (queries/r5c_ops.py) — the leaderboard cell statistic.
    One map-combined aggregate; the interval is the identical fixed
    IEEE tree as ctr_wilson_bounds, so full-precision export is
    bit-exact."""
    from redshells_spark.data.preference import win_rate_matrix

    matches = _event_seq_pairs(spark, sf_dir).select(
        F.when(F.col("prev_value") >= F.col("value"), F.col("prev_type"))
        .otherwise(F.col("event_type"))
        .alias("winner"),
        F.when(F.col("prev_value") >= F.col("value"), F.col("event_type"))
        .otherwise(F.col("prev_type"))
        .alias("loser"),
    )
    return win_rate_matrix(matches, "winner", "loser", z=1.96)


@q(
    "expected_calibration_error",
    """WITH tr AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                  count(*)::BIGINT AS n_q,
                  sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS pos_q
           FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
       te AS (SELECT CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                     CAST(floor(tr.pos_q::DOUBLE * 1000000000 / tr.n_q + 0.5)
                          AS BIGINT) AS score_e9
              FROM lineitem l JOIN tr ON tr.q = CAST(l.l_quantity AS BIGINT)
              WHERE l.l_orderkey % 2 = 1),
       g AS (SELECT least(score_e9 // 10000000, 99) AS bin,
                    count(*)::BIGINT AS n,
                    sum(y)::BIGINT AS n_pos,
                    sum(score_e9)::BIGINT AS sum_score_e9
             FROM te GROUP BY 1),
       gb AS (SELECT bin, n, n_pos, sum_score_e9,
                     CAST(abs(1000000000 * n_pos - sum_score_e9) AS BIGINT)
                       AS gap_e9
              FROM g),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                      CAST(sum(gap_e9) AS BIGINT) AS gap_total,
                      CAST(max((2 * gap_e9 + 1000 * n) // (2000 * n)) AS BIGINT)
                        AS mce_e6
               FROM gb)
       SELECT CAST(bin AS BIGINT) AS bin, n, n_pos, sum_score_e9,
              (2 * n_pos * 1000000 + n) // (2 * n) AS acc_e6,
              (2 * (sum_score_e9 // 1000) + n) // (2 * n) AS conf_e6,
              (2 * gap_e9 + 1000 * n) // (2000 * n) AS gap_e6,
              (2 * gap_total + 1000 * n_total) // (2000 * n_total) AS ece_e6,
              mce_e6
       FROM gb CROSS JOIN tot""",
)
def _expected_calibration_error(spark, sf_dir):
    """Expected / maximum calibration error over the same empirical
    per-quantity scorer as calibration_lift_table, in ENTIRELY exact
    integer arithmetic: per fixed-width confidence bin, the gap
    |accuracy - confidence| folds to |1e9*hits - sum(score_e9)| — an
    exact int64 numerator — so ECE = sum(gaps)/(1e9*N) needs no float
    aggregation anywhere (the usual ECE implementation averages
    doubles per bin; this one is bit-stable under any partition
    order, and at 1e12-row eval sets the numerators move to
    decimal(38,0) loudly, never silently). Reliability-diagram bins
    export alongside the two scalars."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    tr = (
        li.filter(F.col("l_orderkey") % 2 == 0)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_q"), F.sum("y").alias("pos_q"))
    )
    te = (
        li.filter(F.col("l_orderkey") % 2 == 1)
        .join(F.broadcast(tr), on="q")
        .select(
            "y",
            F.floor(
                F.col("pos_q").cast("double") * 1_000_000_000 / F.col("n_q")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("score_e9"),
        )
    )
    g = (
        te.groupBy(
            F.least(F.expr("score_e9 div 10000000"), F.lit(99))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("score_e9").cast("long").alias("sum_score_e9"),
        )
        .withColumn(
            "gap_e9",
            F.abs(F.lit(1_000_000_000) * F.col("n_pos") - F.col("sum_score_e9"))
            .cast("long"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("gap_e9").cast("long").alias("gap_total"),
        F.max(F.expr("(2 * gap_e9 + 1000 * n) div (2000 * n)"))
        .cast("long")
        .alias("mce_e6"),
    )
    return g.crossJoin(F.broadcast(tot)).select(  # 1-row aggregate join
        "bin",
        "n",
        "n_pos",
        "sum_score_e9",
        F.expr("(2 * n_pos * 1000000 + n) div (2 * n)").alias("acc_e6"),
        F.expr("(2 * (sum_score_e9 div 1000) + n) div (2 * n)").alias("conf_e6"),
        F.expr("(2 * gap_e9 + 1000 * n) div (2000 * n)").alias("gap_e6"),
        F.expr("(2 * gap_total + 1000 * n_total) div (2000 * n_total)").alias(
            "ece_e6"
        ),
        "mce_e6",
    )


def _bucket_ladder_sql(bounds: tuple[int, ...]) -> str:
    expr = "0"
    for b in sorted(bounds, reverse=True):
        expr = f"CASE WHEN n_tokens <= {b} THEN {b} ELSE {expr} END"
    return f"CAST({expr} AS BIGINT)"


@q(
    "length_bucketed_batches",
    f"""WITH ntok AS (
         SELECT doc_id,
                CAST(len(list_filter(string_split(lower(text), ' '),
                                     t -> t <> '')) AS BIGINT) AS n_tokens
         FROM documents),
       bk AS (SELECT doc_id, n_tokens,
                     {_bucket_ladder_sql((16, 32, 64, 128, 256, 512, 1024))}
                       AS bucket
              FROM ntok),
       rk AS (SELECT bucket, doc_id, n_tokens,
                     row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY n_tokens DESC, doc_id ASC) AS r
              FROM bk),
       bt AS (SELECT bucket, (r - 1) // 8 AS batch_id, n_tokens FROM rk)
       SELECT bucket, CAST(batch_id AS BIGINT) AS batch_id,
              CAST(count(*) AS BIGINT) AS n_seqs,
              CAST(max(n_tokens) AS BIGINT) AS max_len,
              CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              CAST(count(*) * bucket - sum(n_tokens) AS BIGINT) AS pad_to_bucket,
              CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
                AS pad_to_max
       FROM bt GROUP BY bucket, batch_id""",
)
def _length_bucketed_batches(spark, sf_dir):
    """Length-bucketed batch planning (text/packing.py
    length_bucketed_batches): sequences bucket to the smallest
    power-of-two bound >= their token count, batches of 8 cut inside
    each bucket by length-descending order, exact int64 padding waste
    reported per batch both to the bucket bound (static shapes) and
    to the batch max (dynamic shapes) — the serving/training
    dynamic-batching layout. Fixed CASE ladder, per-bucket windows,
    zero floats."""
    from redshells_spark.text.packing import length_bucketed_batches

    toks = _tokens(spark, sf_dir)
    docs = toks.select(
        "doc_id", F.size("tokens").cast("long").alias("n_tokens")
    )
    return length_bucketed_batches(
        docs, "doc_id", "n_tokens", batch_size=8,
        bucket_bounds=(16, 32, 64, 128, 256, 512, 1024),
    )


@q(
    "judge_position_bias",
    f"""WITH pos AS (
        SELECT prev_type AS first_item, event_type AS second_item,
               CASE WHEN prev_value >= value THEN 1 ELSE 0 END AS first_won
        FROM (
          SELECT user_id, event_type, value,
                 lag(event_type) OVER w AS prev_type,
                 lag(value) OVER w AS prev_value
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        WHERE prev_type IS NOT NULL AND prev_type <> event_type),
       per AS (SELECT first_item, second_item,
                      CAST(count(*) AS BIGINT) AS games,
                      CAST(sum(first_won) AS BIGINT) AS first_wins
               FROM pos GROUP BY 1, 2),
       allr AS (SELECT '__all__' AS first_item, '__all__' AS second_item,
                       CAST(sum(games) AS BIGINT) AS games,
                       CAST(sum(first_wins) AS BIGINT) AS first_wins
                FROM per),
       u AS (SELECT * FROM per UNION ALL SELECT * FROM allr),
       w AS (SELECT first_item, second_item, games, first_wins,
                    CAST(first_wins AS DOUBLE) / games AS p,
                    CAST(1.96 AS DOUBLE) AS z
             FROM u)
       SELECT first_item, second_item, games, first_wins,
              p AS first_win_rate,
              (p + z * z / (2 * games)
               - z * sqrt(p * (1 - p) / games
                          + z * z / (4 * games * games)))
                / (1 + z * z / games) AS wilson_lo,
              (p + z * z / (2 * games)
               + z * sqrt(p * (1 - p) / games
                          + z * z / (4 * games * games)))
                / (1 + z * z / games) AS wilson_hi
       FROM w""",
)
def _judge_position_bias(spark, sf_dir):
    """Position-bias audit over the SAME sequential match log the
    Bradley-Terry / win-rate queries consume: how often the
    FIRST-presented item wins, per ordered pair and overall
    ('__all__' row) with Wilson bounds — the standard sanity check on
    pairwise LLM-judge data, where a first-position rate far from 1/2
    (beyond its interval) flags presentation bias contaminating the
    preference labels. Ties count for the first position, mirroring
    the match derivation. One window + label-bounded aggregates."""
    pos = _event_seq_pairs(spark, sf_dir).select(
        F.col("prev_type").alias("first_item"),
        F.col("event_type").alias("second_item"),
        (F.col("prev_value") >= F.col("value")).cast("int").alias("first_won"),
    )
    per = pos.groupBy("first_item", "second_item").agg(
        F.count(F.lit(1)).cast("long").alias("games"),
        F.sum("first_won").cast("long").alias("first_wins"),
    )
    allr = per.agg(
        F.sum("games").cast("long").alias("games"),
        F.sum("first_wins").cast("long").alias("first_wins"),
    ).select(
        F.lit("__all__").alias("first_item"),
        F.lit("__all__").alias("second_item"),
        "games",
        "first_wins",
    )
    u = per.unionByName(allr)
    p = F.col("first_wins").cast("double") / F.col("games")
    z = F.lit(1.96)
    n = F.col("games")
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (F.lit(1) - p) / n + z * z / (4 * n * n))
    denom = F.lit(1) + z * z / n
    return u.select(
        "first_item",
        "second_item",
        "games",
        "first_wins",
        p.alias("first_win_rate"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
    )


@q(
    "ngram_novelty_curve",
    """WITH toks AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                    t -> t <> '') AS t
         FROM documents),
       g AS (SELECT DISTINCT doc_id,
                    unnest(list_transform(generate_series(1, len(t)-2),
                           i -> array_to_string(t[i:i+2], ' '))) AS ngram
             FROM toks),
       fs AS (SELECT ngram, CAST(min(doc_id) AS BIGINT) AS first_doc
              FROM g GROUP BY 1),
       per AS (SELECT g.doc_id,
                      CAST(count(*) AS BIGINT) AS total_grams,
                      CAST(sum(CASE WHEN fs.first_doc = g.doc_id
                                    THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams
               FROM g JOIN fs USING (ngram) GROUP BY 1),
       nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
       SELECT CAST(per.doc_id * 20 // nd.n_docs AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs_in_bucket,
              CAST(sum(novel_grams) AS BIGINT) AS novel_grams,
              CAST(sum(total_grams) AS BIGINT) AS total_grams,
              CAST(sum(novel_grams) AS DOUBLE) / sum(total_grams)
                AS novelty_rate
       FROM per CROSS JOIN nd
       GROUP BY 1""",
)
def _ngram_novelty_curve(spark, sf_dir):
    """Corpus novelty profile (Lee et al. 2022's memorization lens):
    for each 5%-of-corpus bucket in doc_id order, the fraction of a
    doc's distinct word trigrams whose FIRST corpus occurrence is that
    doc — the declining curve that quantifies how much of a growing
    corpus is new text vs repetition, i.e. the marginal value of more
    data before/after dedup. min-per-gram + one co-partitioned join
    back; nothing quadratic, no windows."""
    toks = _tokens(spark, sf_dir)
    g = (
        toks.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("tokens") >= 3,
                    F.expr(
                        "transform(sequence(1, size(tokens)-2), "
                        "i -> concat_ws(' ', slice(tokens, i, 3)))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("ngram"),
        )
        .dropDuplicates(["doc_id", "ngram"])
    )
    fs = g.groupBy("ngram").agg(F.min("doc_id").cast("long").alias("first_doc"))
    per = (
        g.join(fs, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("long")
            .alias("novel_grams"),
        )
    )
    nd = toks.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        per.crossJoin(F.broadcast(nd))  # 1-row aggregate join
        .groupBy(
            F.expr("doc_id * 20 div n_docs").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_in_bucket"),
            F.sum("novel_grams").cast("long").alias("novel_grams"),
            F.sum("total_grams").cast("long").alias("total_grams"),
        )
        .select(
            "bucket",
            "n_docs_in_bucket",
            "novel_grams",
            "total_grams",
            (F.col("novel_grams").cast("double") / F.col("total_grams")).alias(
                "novelty_rate"
            ),
        )
    )


@q(
    "unimax_allocation",
    """WITH c AS (
         SELECT lang, CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                               t -> t <> ''))) AS BIGINT)
                        AS tokens_available
         FROM documents GROUP BY 1),
       caps AS (SELECT lang, tokens_available,
                       CAST(tokens_available * 3 AS BIGINT) AS cap,
                       row_number() OVER (
                         ORDER BY tokens_available * 3 ASC, lang ASC) AS j,
                       CAST(count(*) OVER () AS BIGINT) AS l
                FROM c),
       pf AS (SELECT *, CAST(coalesce(sum(cap) OVER (
                          ORDER BY j ASC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS prefix
              FROM caps),
       fl AS (SELECT *, CASE WHEN cap * (l - j + 1) <= 80000 - prefix
                             THEN 1 ELSE 0 END AS capped
              FROM pf),
       rem AS (SELECT CAST(80000 - coalesce(sum(CASE WHEN capped = 1
                                                     THEN cap END), 0)
                        AS BIGINT) AS r,
                      CAST(coalesce(sum(1 - capped), 0) AS BIGINT) AS m
               FROM fl),
       shared AS (SELECT fl.*, rem.r, rem.m,
                         CASE WHEN fl.capped = 0
                              THEN row_number() OVER (
                                     PARTITION BY fl.capped
                                     ORDER BY fl.cap DESC, fl.lang ASC)
                              END AS uncapped_rank
                  FROM fl CROSS JOIN rem)
       SELECT lang, tokens_available, cap,
              CAST(CASE WHEN capped = 1 THEN cap
                        ELSE r // m + CASE WHEN uncapped_rank <= r % m
                                           THEN 1 ELSE 0 END
                   END AS BIGINT) AS allocation,
              CAST(capped AS BIGINT) AS capped
       FROM shared""",
)
def _unimax_allocation(spark, sf_dir):
    """UniMax language sampling (Chung et al. 2023): allocate a token
    budget (80k here) across languages by water-filling — every
    language gets at most ``epoch_cap``=3 passes over its data, the
    freed budget spreads UNIFORMLY over the rest — the multilingual
    mixing rule that beats temperature sampling on tail languages.

    Closed relational form: languages sorted by capacity ascending; a
    language is budget-capped iff cap_j*(L-j+1) <= B - prefix_{j-1}
    (its cap fits the uniform share at its turn — a window prefix
    sum, no iteration); survivors split the remainder by exact
    integer division with largest-remainder top-up (deterministic
    cap-desc order). All exact int64: allocations sum to B whenever
    total capacity >= B. Language-cardinality-bounded relation; the
    only corpus-scale work is the one map-combined token count."""
    from redshells_spark.data.sampling import unimax_allocation

    toks = _tokens(spark, sf_dir)
    c = toks.groupBy("lang").agg(
        F.sum(F.size("tokens")).cast("long").alias("tokens_available")
    )
    return unimax_allocation(
        c, "lang", "tokens_available", budget=80000, epoch_cap=3
    )


@q(
    "fim_transform",
    """WITH t AS (
         SELECT doc_id,
                list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
         FROM documents),
       cuts AS (SELECT doc_id, tk,
                       CAST(len(tk) AS BIGINT) AS n,
                       CAST(len(tk) // 3 AS BIGINT) AS p_end,
                       CAST((2 * len(tk)) // 3 AS BIGINT) AS m_end
                FROM t)
       SELECT doc_id, n AS n_tokens,
              CASE WHEN doc_id % 2 = 1 THEN 'ar' ELSE 'fim' END AS mode,
              CASE WHEN doc_id % 2 = 1 THEN array_to_string(tk, ' ')
                   ELSE '<PRE> ' || array_to_string(tk[1:p_end], ' ')
                        || ' <SUF> ' || array_to_string(tk[m_end+1:n], ' ')
                        || ' <MID> ' || array_to_string(tk[p_end+1:m_end], ' ')
              END AS text_out
       FROM cuts""",
)
def _fim_transform(spark, sf_dir):
    """Fill-in-the-middle pretraining transform (Bavarian et al.
    2022): half the corpus (odd doc_ids) stays autoregressive, the
    other half is rearranged PSM — <PRE> prefix <SUF> suffix <MID>
    middle — with deterministic third-point cuts, teaching infilling
    at zero architecture cost. Pure per-row array slicing in codegen;
    the 50% FIM rate and sentinel layout follow the paper's
    recommended defaults."""
    toks = _tokens(spark, sf_dir)
    cuts = toks.select(
        "doc_id",
        F.col("tokens").alias("tk"),
        F.size("tokens").cast("long").alias("n"),
        (F.size("tokens").cast("long") / 3).cast("long").alias("p_end"),
        (F.size("tokens").cast("long") * 2 / 3).cast("long").alias("m_end"),
    )
    fim = F.concat(
        F.lit("<PRE> "),
        F.expr("concat_ws(' ', slice(tk, 1, CAST(p_end AS INT)))"),
        F.lit(" <SUF> "),
        F.expr(
            "concat_ws(' ', slice(tk, CAST(m_end + 1 AS INT), "
            "CAST(n - m_end AS INT)))"
        ),
        F.lit(" <MID> "),
        F.expr(
            "concat_ws(' ', slice(tk, CAST(p_end + 1 AS INT), "
            "CAST(m_end - p_end AS INT)))"
        ),
    )
    return cuts.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("ar"))
        .otherwise(F.lit("fim"))
        .alias("mode"),
        F.when(
            F.col("doc_id") % 2 == 1, F.expr("concat_ws(' ', tk)")
        )
        .otherwise(fim)
        .alias("text_out"),
    )


def _rbo_suffix_weights(p: float = 0.9, k: int = 10, lcm: int = 2520):
    """Driver-precomputed RBO suffix weights (the NDCG-discount idiom
    from ranking_eval_metrics): a doc common to both top-d lists for
    every d >= m contributes W_m = sum_{d=m..k} w_d * (lcm // d) with
    w_d = round((1-p) p^(d-1) 1e9) — integer nano-units, so the
    distributed sum is exact int64 and both engines fold identical
    literals."""
    w = [round((1.0 - p) * p ** (d - 1) * 1e9) for d in range(1, k + 1)]
    return [sum(w[d - 1] * (lcm // d) for d in range(m, k + 1))
            for m in range(1, k + 1)]


def _rbo_case_sql(col: str) -> str:
    ws = _rbo_suffix_weights()
    arms = " ".join(
        f"WHEN {m} THEN {ws[m-1]}" for m in range(1, len(ws) + 1)
    )
    return f"CASE {col} {arms} ELSE 0 END"


_RBO_RANKERS_SQL = """
    toks AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
         FROM documents),
    tok AS (
         SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM toks),
    st AS (
         SELECT count(DISTINCT doc_id) AS n_docs, count(*) AS tok_sum FROM tok),
    p AS (
         SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf FROM tok
         WHERE term IN ('spark', 'join', 'window', 'stream', 'hash')
         GROUP BY 1, 2, 3),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
    scored AS (
         SELECT p.term, p.doc_id, p.tf,
                ln(CAST(1.0 AS DOUBLE)
                   + (st.n_docs - dft.df + CAST(0.5 AS DOUBLE))
                     / (dft.df + CAST(0.5 AS DOUBLE)))
                  * p.tf
                  / (p.tf + CAST(1.2 AS DOUBLE)
                     * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE) * p.dl
                          / (st.tok_sum / st.n_docs))) AS bm25
         FROM p JOIN dft USING (term), st),
    ra AS (
         SELECT term, doc_id,
                row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id ASC) AS r
         FROM scored QUALIFY r <= 10),
    rb AS (
         SELECT term, doc_id,
                row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS r
         FROM scored QUALIFY r <= 10)
"""


@q(
    "rbo_rank_agreement",
    f"""WITH {_RBO_RANKERS_SQL},
       common AS (
         SELECT ra.term, greatest(ra.r, rb.r) AS m
         FROM ra JOIN rb ON ra.term = rb.term AND ra.doc_id = rb.doc_id),
       agg AS (
         SELECT term,
                CAST(sum({_rbo_case_sql('m')}) AS BIGINT) AS rbo_units,
                CAST(count(*) AS BIGINT) AS overlap_at_k
         FROM common GROUP BY 1),
       terms AS (SELECT DISTINCT term FROM ra)
       SELECT terms.term,
              CAST(coalesce(agg.overlap_at_k, 0) AS BIGINT) AS overlap_at_k,
              CAST(coalesce(agg.rbo_units, 0) AS BIGINT) AS rbo_units,
              CAST(coalesce(agg.rbo_units, 0) AS DOUBLE)
                / (2520 * CAST(1000000000 AS BIGINT)) AS rbo
       FROM terms LEFT JOIN agg USING (term)""",
)
def _rbo_rank_agreement(spark, sf_dir):
    """Rank-Biased Overlap @10, p=0.9 (Webber et al. 2010) between
    the SAME two rankers rrf_hybrid_search fuses (per-term BM25 vs
    raw tf): the top-weighted agreement measure for comparing ranking
    systems where disagreement near rank 1 matters most. Closed
    integer form: a doc in both top-d for all d >= m := max(ra, rb)
    contributes the precomputed suffix weight W_m (nano-unit x
    lcm(1..10) literals — identical in both engines), so per-term RBO
    is ONE exact int64 sum over the top-10 x top-10 join; the double
    is a single final division. Depth-capped windows keep shuffle
    O(#terms · 10)."""
    # build both depth-10 rank lists exactly as
    # text/hybrid.py hybrid_bm25_tf_search's rankers do
    toks = _tokens(spark, sf_dir)
    tok = toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("dl"),
        F.explode("tokens").alias("term"),
    )
    stats = tok.groupBy().agg(
        F.count_distinct("doc_id").alias("n_docs"), F.count("*").alias("tok_sum")
    )
    p = (
        tok.filter(F.col("term").isin(list(KEYWORDS)))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = p.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        p.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(1.0)
                        - F.lit(0.75)
                        + F.lit(0.75)
                        * F.col("dl")
                        / (F.col("tok_sum") / F.col("n_docs"))
                    )
                )
            ).alias("bm25"),
        )
    )
    wa = Window.partitionBy("term").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    wb = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    ra = (
        scored.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") <= 10)
        .select("term", "doc_id", F.col("r").alias("ra"))
    )
    rb = (
        scored.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= 10)
        .select("term", "doc_id", F.col("r").alias("rb"))
    )
    ws = _rbo_suffix_weights()
    wexpr = F.lit(0).cast("long")
    for m in range(len(ws), 0, -1):
        wexpr = F.when(
            F.greatest("ra", "rb") == m, F.lit(ws[m - 1]).cast("long")
        ).otherwise(wexpr)
    common = ra.join(rb, ["term", "doc_id"]).select(
        "term", wexpr.alias("wm")
    )
    agg = common.groupBy("term").agg(
        F.sum("wm").cast("long").alias("rbo_units"),
        F.count(F.lit(1)).cast("long").alias("overlap_at_k"),
    )
    terms = ra.select("term").distinct()
    return terms.join(agg, "term", "left").select(
        "term",
        F.coalesce("overlap_at_k", F.lit(0)).cast("long").alias("overlap_at_k"),
        F.coalesce("rbo_units", F.lit(0)).cast("long").alias("rbo_units"),
        (
            F.coalesce("rbo_units", F.lit(0)).cast("double")
            / (F.lit(2520) * F.lit(1_000_000_000).cast("long"))
        ).alias("rbo"),
    )


def _winrate_boot_oracle() -> str:
    from redshells_spark.queries.r5c_ops import _bootstrap_thresholds_sql

    base_cte = _BT_MATCHES_CTE_LOCAL.replace(
        "SELECT CASE WHEN prev_value >= value THEN prev_type ELSE event_type END AS winner",
        "SELECT event_id AS id, CASE WHEN prev_value >= value THEN 1 ELSE 0 END AS u,"
        " CASE WHEN prev_value >= value THEN prev_type ELSE event_type END AS winner"
    ).replace(
        "SELECT user_id, event_type, value,",
        "SELECT user_id, event_id, event_type, value,"
    ).replace("matches AS (", "base AS (")
    # the .replace chain must actually have rewritten the CTE — a
    # silent no-op here would produce a matches/base mismatch
    assert "base AS (" in base_cte and "AS id," in base_cte
    return f"""WITH {base_cte},
       hs AS (
         SELECT base.id, base.u, g.g,
                md5('3|' || CAST(g.g AS VARCHAR) || '|' || CAST(base.id AS VARCHAR)) AS h
         FROM base, (SELECT unnest(generate_series(0, 12)) AS g) g),
       wts AS (
         SELECT hs.g * 8 + s.s AS b, hs.u,
                {_bootstrap_thresholds_sql().replace(
                    "pfx", "substr(hs.h, s.s * 4 + 1, 4)"
                )} AS w
         FROM hs, (SELECT unnest(generate_series(0, 7)) AS s) s
         WHERE hs.g * 8 + s.s < 100),
       reps AS (
         SELECT b, CAST(sum(w * u) AS BIGINT) AS wu, CAST(sum(w) AS BIGINT) AS ws
         FROM wts GROUP BY b HAVING sum(w) > 0),
       means AS (
         SELECT b, CAST(wu AS DOUBLE) / CAST(ws AS DOUBLE) / 1.0 AS boot_mean
         FROM reps),
       ord AS (
         SELECT b, boot_mean,
                row_number() OVER (ORDER BY boot_mean ASC, b ASC) - 1 AS rn
         FROM means),
       cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_replicas FROM means),
       lo AS (SELECT round(boot_mean, 4) AS ci_lo FROM ord WHERE rn = 2),
       hi AS (SELECT round(boot_mean, 4) AS ci_hi
              FROM ord, cnt WHERE rn = n_replicas - 3),
       pt AS (SELECT round(CAST(sum(u) AS DOUBLE) / count(*) / 1.0, 4)
                AS point_mean FROM base)
       SELECT n_replicas, point_mean, ci_lo, ci_hi FROM cnt, pt, lo, hi"""


@q("winrate_bootstrap_ci", _winrate_boot_oracle())
def _winrate_bootstrap_ci(spark, sf_dir):
    """95% Poisson-bootstrap CI on the FIRST-POSITION win rate over
    the sequential match log — 'is the position bias significant?'
    answered with the same replica machinery as bootstrap_metric_ci
    (ml/bootstrap.py; Chamandy et al. 2012). The outcome is 0/1 so
    scale=1: replica win rates are exact-int ratios, bit-identical
    across engines and partitionings; a CI excluding 0.5 is the
    rigorous version of judge_position_bias's Wilson flag."""
    from redshells_spark.ml.bootstrap import ci_from_sums, replica_sums

    base = _event_seq_pairs(spark, sf_dir).select(
        F.col("event_id").alias("id"),
        (F.col("prev_value") >= F.col("value")).cast("long").alias("u"),
    )
    reps = replica_sums(base, "u", "id", n_replicas=100, seed=3, scale=1)
    tot = base.agg(
        F.sum("u").cast("long").alias("su"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return ci_from_sums(reps, tot, n_replicas=100, alpha=0.05, scale=1)


@q(
    "ks_two_sample",
    """WITH b AS (
         SELECT CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
         FROM events WHERE event_type IN ('click', 'purchase')),
       pv AS (SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
                     CAST(sum(1 - is1) AS BIGINT) AS c2
              FROM b GROUP BY 1),
       cum AS (SELECT v,
                      CAST(sum(c1) OVER (ORDER BY v ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
                      CAST(sum(c2) OVER (ORDER BY v ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
               FROM pv),
       n AS (SELECT CAST(sum(is1) AS BIGINT) AS n1,
                    CAST(sum(1 - is1) AS BIGINT) AS n2
             FROM b),
       d AS (SELECT CAST(max(abs(cum1 * n.n2 - cum2 * n.n1)) AS BIGINT)
                      AS d_num
             FROM cum, n)
       SELECT n.n1, n.n2, d.d_num,
              CAST(d.d_num AS DOUBLE) / (n.n1 * n.n2) AS d_stat,
              CAST(1.358 AS DOUBLE)
                * sqrt((n.n1 + n.n2) / (CAST(n.n1 AS DOUBLE) * n.n2))
                AS critical_005,
              CAST(CASE WHEN CAST(d.d_num AS DOUBLE) / (n.n1 * n.n2)
                        > CAST(1.358 AS DOUBLE)
                          * sqrt((n.n1 + n.n2)
                                 / (CAST(n.n1 AS DOUBLE) * n.n2))
                        THEN 1 ELSE 0 END AS BIGINT) AS reject_005
       FROM n, d""",
)
def _ks_two_sample(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov test between the click and
    purchase value distributions — the standard drift check between
    two data slices. The supremum gap folds to max|cum1*n2 - cum2*n1|
    — an exact int64 over one value-ordered window (missing values in
    either sample carry forward automatically because the cumsum runs
    over the UNION of distinct values) — and D, the alpha=0.05
    critical value, and the reject flag are one fixed IEEE tree over
    those ints (identical operands -> identical comparison in both
    engines). No p-value series expansion: the decision threshold is
    the closed Smirnov large-sample form. The per-value count relation
    is also the mergeable state of streaming/drift.py's monitor."""
    from redshells_spark.operators.drift import ks_two_sample

    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "value",
        (F.col("event_type") == "click").cast("long").alias("is1"),
    )
    return ks_two_sample(b, "value", "is1", scale=100)


@q(
    "chat_loss_mask_spans",
    """WITH seq AS (
         SELECT user_id, event_type,
                row_number() OVER (
                  PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS turn_idx
         FROM events),
       turns AS (
         SELECT user_id, turn_idx, event_type,
                CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END
                  AS role,
                CAST(2 + length(event_type) AS BIGINT) AS turn_tokens
         FROM seq WHERE turn_idx <= 6),
       ofs AS (
         SELECT user_id, turn_idx, role, turn_tokens,
                CAST(coalesce(sum(turn_tokens) OVER (
                  PARTITION BY user_id ORDER BY turn_idx ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_tok
         FROM turns)
       SELECT user_id, CAST(turn_idx AS BIGINT) AS turn_idx,
              start_tok + 1 AS mask_start,
              start_tok + turn_tokens AS mask_end,
              turn_tokens - 1 AS n_masked
       FROM ofs WHERE role = 'assistant'""",
)
def _chat_loss_mask_spans(spark, sf_dir):
    """SFT loss-mask computation: each user's first 6 events become
    alternating user/assistant chat turns rendered with a 2-sentinel
    template (<|role|> ... <|end|>, content tokens = the label
    length); the training pipeline needs the TOKEN SPANS of
    assistant content (+ end sentinel) to mask the loss to — the
    standard assistant-only SFT convention. One per-conversation
    window cumulative sum gives every span offset exactly; spans are
    half-open-free inclusive [mask_start, mask_end] in exact int64
    token positions. Zero joins beyond the window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_us(ev, "ts").asc(), F.col("event_id").asc()
    )
    turns = (
        ev.withColumn("turn_idx", F.row_number().over(w))
        .filter(F.col("turn_idx") <= 6)
        .select(
            "user_id",
            "turn_idx",
            F.when(F.col("turn_idx") % 2 == 1, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            (F.lit(2) + F.length("event_type")).cast("long").alias("turn_tokens"),
        )
    )
    wo = Window.partitionBy("user_id").orderBy(F.col("turn_idx").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ofs = turns.withColumn(
        "start_tok", F.coalesce(F.sum("turn_tokens").over(wo), F.lit(0)).cast("long")
    )
    return ofs.filter(F.col("role") == "assistant").select(
        "user_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        (F.col("start_tok") + 1).alias("mask_start"),
        (F.col("start_tok") + F.col("turn_tokens")).alias("mask_end"),
        (F.col("turn_tokens") - 1).alias("n_masked"),
    )


@q(
    "conformal_threshold",
    """WITH b AS (
         SELECT event_type, event_id,
                CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS s,
                event_id % 2 AS odd
         FROM events),
       cal AS (SELECT event_type, event_id, s,
                      row_number() OVER (
                        PARTITION BY event_type
                        ORDER BY s ASC, event_id ASC) AS rn
               FROM b WHERE odd = 0),
       ncal AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
                FROM cal GROUP BY 1),
       kidx AS (SELECT event_type, n_cal,
                       CAST(least((9 * (n_cal + 1) + 9) // 10, n_cal)
                         AS BIGINT) AS k
                FROM ncal),
       thr AS (SELECT cal.event_type, kidx.n_cal, kidx.k,
                      CAST(cal.s AS BIGINT) AS threshold_c
               FROM cal JOIN kidx
               ON cal.event_type = kidx.event_type AND cal.rn = kidx.k),
       test AS (SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n_test FROM b
                WHERE odd = 1 GROUP BY 1),
       cov AS (SELECT b.event_type,
                      CAST(sum(CASE WHEN b.s <= thr.threshold_c
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
               FROM b JOIN thr ON b.event_type = thr.event_type
               WHERE b.odd = 1 GROUP BY 1)
       SELECT thr.event_type, thr.n_cal, thr.k, thr.threshold_c,
              test.n_test, cov.n_covered,
              CAST(cov.n_covered AS DOUBLE) / test.n_test AS coverage
       FROM thr JOIN test ON thr.event_type = test.event_type
       JOIN cov ON thr.event_type = cov.event_type""",
)
def _conformal_threshold(spark, sf_dir):
    """Split-conformal prediction thresholds per group (Vovk et al.;
    Angelopoulos & Bates 2023 tutorial form): the calibration half's
    ceil(0.9*(n+1))-th smallest nonconformity score — computed with
    EXACT integer index arithmetic ((9(n+1)+9) div 10; a float
    0.9*(n+1) ceil flips at binary boundaries) — plus empirical
    coverage on the held-out half, whose exchangeability guarantee
    (coverage >= 90% in expectation) the test suite checks at data
    level. One per-group rank window on the calibration half and two
    map-combined aggregates; scores compare as exact cents."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "event_id",
        money_units(F.col("value")).alias("s"),
        (F.col("event_id") % 2).alias("odd"),
    ).localCheckpoint(eager=True)  # narrow score rows; the calibration
    # window, the test counts and the coverage join all consume it
    cal = b.filter(F.col("odd") == 0).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("s").asc(), F.col("event_id").asc()
            )
        ),
    ).localCheckpoint(eager=True)  # ranked calibration half; the size
    # counts and the threshold pick both consume it
    ncal = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    kidx = ncal.select(
        F.col("event_type").alias("__et"),
        "n_cal",
        F.least(
            F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")
        )
        .cast("long")
        .alias("k"),
    )
    thr = cal.join(
        F.broadcast(kidx),
        (cal["event_type"] == kidx["__et"]) & (cal["rn"] == kidx["k"]),
    ).select(
        "event_type", "n_cal", "k", F.col("s").cast("long").alias("threshold_c")
    )
    test = (
        b.filter(F.col("odd") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_test"))
    )
    cov = (
        b.filter(F.col("odd") == 1)
        .join(F.broadcast(thr.select("event_type", "threshold_c")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("s") <= F.col("threshold_c")).cast("int"))
            .cast("long")
            .alias("n_covered")
        )
    )
    return (
        thr.join(test, "event_type")
        .join(cov, "event_type")
        .select(
            "event_type",
            "n_cal",
            "k",
            "threshold_c",
            "n_test",
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test")).alias(
                "coverage"
            ),
        )
    )


@q(
    "packed_attention_boundaries",
    """WITH ntok AS (
         SELECT doc_id, source,
                CAST(len(list_filter(string_split(lower(text), ' '),
                                     t -> t <> '')) AS BIGINT) AS n_tokens
         FROM documents),
       packed AS (
         SELECT doc_id, source, n_tokens,
                CAST((sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id ASC
                        ROWS UNBOUNDED PRECEDING) - n_tokens) // 256
                  AS BIGINT) AS chunk_id
         FROM ntok),
       spans AS (
         SELECT source, chunk_id, doc_id, n_tokens,
                CAST(sum(n_tokens) OVER (
                       PARTITION BY source, chunk_id ORDER BY doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         FROM packed)
       SELECT source, chunk_id, doc_id,
              CAST(cum - n_tokens AS BIGINT) AS start_tok,
              CAST(cum - 1 AS BIGINT) AS end_tok, n_tokens
       FROM spans""",
)
def _packed_attention_boundaries(spark, sf_dir):
    """Block-diagonal attention map for packed training sequences
    (text/packing.py packed_attention_boundaries over pack_sequences
    at budget 256 per source shard): each doc's exact chunk-local
    token span, so a trainer masks cross-document attention inside a
    packed context. Two shard-keyed windows, zero joins; the same
    doc-id order the packer used makes the spans a pure function of
    the corpus."""
    from redshells_spark.text.packing import (
        pack_sequences,
        packed_attention_boundaries,
    )

    toks = _tokens(spark, sf_dir)
    docs = toks.select(
        "doc_id", "source", F.size("tokens").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, budget=256, partition_column="source")
    return packed_attention_boundaries(packed, "source")


def _crossmodal_oracle() -> str:
    from redshells_spark.queries.text import _duck_h60

    return f"""WITH iv AS (
         SELECT vec_id AS id, d - 1 AS d,
                CAST(floor(x * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vi
         FROM (SELECT vec_id, unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS d
               FROM embeddings)),
       tok AS (
         SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                           t -> t <> '')) AS token
         FROM documents),
       tv AS (SELECT doc_id, {_duck_h60("token")} % 64 AS d,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM tok GROUP BY 1, 2),
       dt AS (SELECT tv.doc_id, CAST(sum(iv.vi * tv.cnt) AS BIGINT) AS dot_e3
              FROM tv JOIN iv ON iv.id = tv.doc_id AND iv.d = tv.d
              GROUP BY 1),
       ni AS (SELECT id, CAST(sum(vi * vi) AS BIGINT) AS normi2 FROM iv
              GROUP BY 1),
       nt AS (SELECT doc_id, CAST(sum(cnt * cnt) AS BIGINT) AS normt2 FROM tv
              GROUP BY 1),
       k AS (SELECT d.doc_id, d.source,
                    CASE WHEN dt.dot_e3 > 0
                         AND 100 * dt.dot_e3 * dt.dot_e3
                             >= ni.normi2 * nt.normt2
                         THEN 1 ELSE 0 END AS kept
             FROM documents d
             LEFT JOIN dt ON dt.doc_id = d.doc_id
             LEFT JOIN ni ON ni.id = d.doc_id
             LEFT JOIN nt ON nt.doc_id = d.doc_id)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(kept) AS BIGINT) AS n_aligned,
              CAST(sum(kept) AS DOUBLE) / count(*) AS align_rate
       FROM k GROUP BY 1"""


@q("crossmodal_alignment_filter", _crossmodal_oracle())
def _crossmodal_alignment_filter(spark, sf_dir):
    """LAION-style cross-modal alignment filtering (Schuhmann et al.
    2021: keep pairs whose CLIP image-text cosine clears a
    threshold), with the real Spark plumbing and a deterministic
    stand-in text encoder (hashed bag-of-words into the embedding's
    64 dims — the DSIR feature hash): per source, how many
    (image-embedding, text) pairs clear cosine >= 0.1 (data-scaled;
    production uses ~0.28 on real encoders).

    The whole decision is EXACT integers: image vectors e3-quantized
    per component, dot and both squared norms are int64 sums over the
    sparse (id, dim) join, and the cosine test folds to
    100*dot^2 >= normi2*normt2 with dot > 0 — no float ever
    aggregates, so the filter bit-matches any partitioning. One
    corpus shuffle per side + a co-partitioned sparse join."""
    from redshells_spark.dedup.simhash import portable_token_hash

    emb = _t(spark, sf_dir, "embeddings")
    iv = emb.select(
        F.col("vec_id").alias("id"),
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "id", "d", money_units(F.col("x"), 1000).alias("vi")
    )
    toks = _tokens(spark, sf_dir)
    tv = (
        toks.select("doc_id", F.explode("tokens").alias("token"))
        .select(
            "doc_id", (portable_token_hash(F.col("token")) % 64).alias("d")
        )
        .groupBy("doc_id", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    dt = (
        tv.join(iv, (iv["id"] == tv["doc_id"]) & (iv["d"] == tv["d"]))
        .groupBy("doc_id")
        .agg(F.sum(F.col("vi") * F.col("cnt")).cast("long").alias("dot_e3"))
    )
    ni = iv.groupBy("id").agg(
        F.sum(F.col("vi") * F.col("vi")).cast("long").alias("normi2")
    )
    nt = tv.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("normt2")
    )
    docs = toks.select("doc_id", "source")
    k = (
        docs.join(dt, "doc_id", "left")
        .join(ni, docs["doc_id"] == ni["id"], "left")
        .join(nt, "doc_id", "left")
        .select(
            "source",
            F.when(
                (F.col("dot_e3") > 0)
                & (
                    F.lit(100) * F.col("dot_e3") * F.col("dot_e3")
                    >= F.col("normi2") * F.col("normt2")
                ),
                1,
            )
            .otherwise(0)
            .alias("kept"),
        )
    )
    return k.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_aligned"),
        (F.sum("kept").cast("double") / F.count(F.lit(1))).alias("align_rate"),
    )
