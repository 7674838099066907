"""Round-5 session-2 additions: repeated-span dedup (Lee et al.),
positional phrase search, the MMDS LSH parameter planner, and a
DoReMi exponentiated-gradient domain-reweight step.

Registered after r5_ops; the package __init__ surfaces these at the
head of _FRONT so they land inside the driver's 50-query window.
"""

from redshells_spark.queries._shared import *  # noqa: F401,F403

# 0-based token positions (the spans/phrase modules index from 0 so
# Spark's posexplode/sequence and DuckDB agree without offsets)
_TOK0_SQL = """
    tok AS (
        SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS token
        FROM (
            SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
            FROM documents
        )
    )
"""


@q(
    "repeated_span_dedup",
    f"""WITH {_TOK0_SQL},
       sh AS (
         SELECT doc_id, pos,
                md5(token || ' ' || lead(token, 1) OVER w
                          || ' ' || lead(token, 2) OVER w
                          || ' ' || lead(token, 3) OVER w) AS shingle
         FROM tok
         WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         QUALIFY lead(token, 3) OVER w IS NOT NULL),
       dup AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2),
       dpos AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup USING (shingle)),
       isl AS (
         SELECT doc_id, pos,
                CASE WHEN max(pos + 3) OVER prev IS NULL
                       OR pos > max(pos + 3) OVER prev + 1
                     THEN 1 ELSE 0 END AS ni
         FROM dpos
         WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       isl2 AS (
         SELECT doc_id, pos,
                sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
       spans AS (
         SELECT doc_id, island, min(pos) AS s, max(pos) + 3 AS e
         FROM isl2 GROUP BY doc_id, island),
       per AS (
         SELECT doc_id, count(*) AS n_spans,
                CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
         FROM spans GROUP BY doc_id),
       tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY doc_id)
       SELECT t.doc_id, t.n_tokens,
              CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
              CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
              round(coalesce(p.dup_tokens, 0) / greatest(t.n_tokens, 1), 4) AS dup_fraction
       FROM tot t LEFT JOIN per p USING (doc_id)""",
)
def _repeated_span_dedup(spark, sf_dir):
    """Corpus-internal repeated-substring spans, Lee et al. 2022
    (arXiv:2107.06499): every 4-token shingle occurring >= 2 times
    corpus-wide marks its positions duplicated; maximal merged spans
    are reported per document (dedup/spans.py:repeated_span_report).
    Beyond-reference surface — the reference dedups whole docs only."""
    from redshells_spark.dedup.spans import repeated_span_report

    return repeated_span_report(
        _tokens(spark, sf_dir), shingle_len=4, min_count=2
    )


@q(
    "phrase_search_topk",
    f"""WITH {_TOK0_SQL},
       grams AS (
         SELECT doc_id,
                token || ' ' || lead(token, 1) OVER w AS g2,
                token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS g3
         FROM tok
         WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       hits AS (
         SELECT doc_id, g2 AS phrase FROM grams
         WHERE g2 IN ('table scan', 'hash join', 'window agg')
         UNION ALL
         SELECT doc_id, g3 AS phrase FROM grams
         WHERE g3 = 'sort merge join'),
       counts AS (
         SELECT phrase, doc_id, count(*) AS n_occurrences
         FROM hits GROUP BY phrase, doc_id)
       SELECT phrase, doc_id, n_occurrences,
              CAST(row_number() OVER (PARTITION BY phrase
                                      ORDER BY n_occurrences DESC, doc_id ASC) AS BIGINT) AS rank
       FROM counts
       QUALIFY rank <= 10""",
)
def _phrase_search_topk(spark, sf_dir):
    """Exact positional phrase search (Lucene-style consecutive-token
    match, relationally: codegen window-slice + literal IN filter —
    text/phrase.py:phrase_topk); top-10 documents per phrase."""
    from redshells_spark.text.phrase import phrase_topk

    return phrase_topk(
        _tokens(spark, sf_dir),
        ["table scan", "hash join", "window agg", "sort merge join"],
        k=10,
    )


@q(
    "lsh_parameter_plan",
    """WITH d AS (
         SELECT CAST(b AS BIGINT) AS bands, CAST(128 // b AS BIGINT) AS rows_per_band
         FROM (SELECT unnest(generate_series(1, 128)) AS b)
         WHERE 128 % b = 0),
       s AS (
         SELECT bands, rows_per_band,
                pow(1.0 / bands, 1.0 / rows_per_band) AS thr,
                1.0 - pow(1.0 - pow(0.8, rows_per_band), bands) AS pt,
                1.0 - pow(1.0 - pow(0.4, rows_per_band), bands) AS pf,
                CAST(floor(abs(pow(1.0 / bands, 1.0 / rows_per_band) - 0.8) * 1000000 + 0.5) AS BIGINT) AS dist
         FROM d),
       m AS (
         SELECT s.*, min(dist) OVER () AS best_dist FROM s),
       m2 AS (
         SELECT m.*, max(CASE WHEN dist = best_dist THEN bands END) OVER () AS best_bands FROM m)
       SELECT bands, rows_per_band,
              round(thr, 4) AS threshold_est,
              round(pt, 4) AS p_at_target,
              round(1.0 - pt, 4) AS fn_at_target,
              round(pf, 4) AS fp_at_probe,
              (dist = best_dist AND bands = best_bands) AS selected
       FROM m2""",
)
def _lsh_parameter_plan(spark, sf_dir):
    """MMDS §3.4.3 S-curve planner: score every (bands, rows) split of
    a 128-perm MinHash signature and flag the factorization whose
    collision threshold (1/b)^(1/r) lands nearest the 0.8 target
    (dedup/lsh_plan.py:lsh_parameter_plan). Argmin compared in integer
    micro-units so engines never compare raw doubles."""
    from redshells_spark.dedup.lsh_plan import lsh_parameter_plan

    return lsh_parameter_plan(
        spark, n_perm=128, target_jaccard=0.8, fp_probe_jaccard=0.4
    )


@q(
    "doremi_domain_reweight",
    f"""WITH {_TOK0_SQL},
       src AS (SELECT doc_id, source FROM documents),
       uni AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
       loss AS (
         SELECT s.source AS domain,
                avg(-ln(u.n / t.n_total)) AS loss
         FROM tok JOIN src s USING (doc_id)
              JOIN uni u USING (token)
              CROSS JOIN tot t
         GROUP BY s.source),
       ref AS (SELECT min(loss) AS ref_loss FROM loss),
       alpha AS (
         SELECT domain,
                greatest(loss - ref_loss, 0.0) AS excess,
                exp(1.0 * greatest(loss - ref_loss, 0.0)) AS a
         FROM loss CROSS JOIN ref),
       norm AS (SELECT sum(a) AS z, count(*) AS k FROM alpha)
       SELECT domain,
              round(excess, 4) AS excess_loss,
              round(0.99 * a / z + 0.01 / k, 4) AS weight
       FROM alpha CROSS JOIN norm""",
)
def _doremi_domain_reweight(spark, sf_dir):
    """DoReMi (arXiv:2305.10429) exponentiated-gradient domain
    reweighting over per-source unigram cross-entropy: sources whose
    tokens the corpus-wide unigram LM compresses worst gain mixture
    weight, smoothed 1% toward uniform (data/doremi.py:doremi_reweight).
    The loss proxy is one groupBy(token) + one broadcast join — the
    EG step itself is domain-count-sized."""
    from redshells_spark.data.doremi import doremi_reweight

    tok = _tokens(spark, sf_dir).select(
        "doc_id", "source", F.explode("tokens").alias("token")
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    n_total = tok.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    losses = (
        tok.join(F.broadcast(uni), on="token")
        .join(F.broadcast(n_total))
        .groupBy(F.col("source").alias("domain"))
        .agg(F.avg(-F.log(F.col("n") / F.col("n_total"))).alias("loss"))
    )
    return doremi_reweight(losses, eta=1.0, smoothing=0.01)


_MMR_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(greatest(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])), 1e-12) * "
    "greatest(sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 1e-12))"
)

# one greedy MMR stage, unrolled (DuckDB windows run after GROUP BY, so
# the argmax-over-remaining is a row_number on the aggregated score)
_MMR_STAGE = """
   s{i} AS (
     SELECT query_id, vec_id, mmr_score_e5, {i} AS rank FROM (
       SELECT c.query_id, c.vec_id,
              CAST(7 * c.rel_e4 - 3 * max(s.sim_e4) AS BIGINT) AS mmr_score_e5,
              row_number() OVER (
                PARTITION BY c.query_id
                ORDER BY 7 * c.rel_e4 - 3 * max(s.sim_e4) DESC, c.vec_id ASC
              ) AS rn
       FROM cand c
       JOIN sims s ON s.query_id = c.query_id AND s.a_id = c.vec_id
       JOIN p{prev} p ON p.query_id = s.query_id AND p.vec_id = s.b_id
       LEFT JOIN p{prev} px ON px.query_id = c.query_id AND px.vec_id = c.vec_id
       WHERE px.vec_id IS NULL
       GROUP BY c.query_id, c.vec_id, c.rel_e4
     ) WHERE rn = 1),
   p{i} AS (SELECT * FROM p{prev} UNION ALL SELECT query_id, vec_id FROM s{i})"""


@q(
    "mmr_diversity_rerank",
    f"""WITH base AS (
         SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                CAST(round({_MMR_COS} * 10000) AS BIGINT) AS rel_e4,
                row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_MMR_COS} DESC, b.vec_id ASC) AS rn
         FROM (SELECT * FROM embeddings WHERE vec_id < 8) a
         CROSS JOIN embeddings b
         WHERE b.vec_id <> a.vec_id),
       cand AS (SELECT query_id, vec_id, rel_e4 FROM base WHERE rn <= 20),
       ce AS (
         SELECT c.query_id, c.vec_id, c.rel_e4, e.embedding
         FROM cand c JOIN embeddings e USING (vec_id)),
       sims AS (
         SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
                CAST(round({_MMR_COS} * 10000) AS BIGINT) AS sim_e4
         FROM ce a JOIN ce b ON a.query_id = b.query_id),
       s1 AS (
         SELECT query_id, vec_id, CAST(7 * rel_e4 AS BIGINT) AS mmr_score_e5, 1 AS rank
         FROM (SELECT query_id, vec_id, rel_e4,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY rel_e4 DESC, vec_id ASC) AS rn
               FROM cand)
         WHERE rn = 1),
       p1 AS (SELECT query_id, vec_id FROM s1),
       {_MMR_STAGE.format(i=2, prev=1)},
       {_MMR_STAGE.format(i=3, prev=2)},
       {_MMR_STAGE.format(i=4, prev=3)},
       {_MMR_STAGE.format(i=5, prev=4)}
       SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank, mmr_score_e5
       FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
             SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL
             SELECT * FROM s5)""",
)
def _mmr_diversity_rerank(spark, sf_dir):
    """Carbonell-Goldstein MMR re-rank (similarity/mmr.py:mmr_rerank):
    top-20 cosine candidates per query (8 queries, self excluded), then
    greedy lambda=0.7 diversity selection of 5 on exact 1e-4-unit
    integer scores — the greedy loop runs in an Arrow applyInPandas per
    query; the oracle unrolls the same five picks as SQL stages."""
    from redshells_spark.similarity.allpairs import matmul_topk
    from redshells_spark.similarity.mmr import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    q_ = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # BLAS matmul candidate stage (same values as the Catalyst cosine,
    # pinned in tests/test_ann_recall.py); k=21 then drop the query
    # itself and re-rank, matching the oracle's b <> a pre-filter
    top = matmul_topk(q_, emb, k=21).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cand = per_group_topk(
        top, "query_id", "score", 20, tie_break=["vec_id"]
    ).select(
        "query_id",
        "vec_id",
        F.round(F.col("score") * 10000, 0).cast("long").alias("rel_e4"),
    )
    with_emb = cand.join(emb.select("vec_id", "embedding"), on="vec_id")
    return mmr_rerank(with_emb, k=5, lambda10=7)


@q(
    "contamination_spans",
    f"""WITH {_TOK0_SQL},
       srcmap AS (SELECT doc_id, source FROM documents),
       sh AS (
         SELECT doc_id, pos,
                md5(token || ' ' || lead(token, 1) OVER w
                          || ' ' || lead(token, 2) OVER w
                          || ' ' || lead(token, 3) OVER w) AS shingle
         FROM tok
         WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         QUALIFY lead(token, 3) OVER w IS NOT NULL),
       bench AS (
         SELECT DISTINCT shingle
         FROM sh JOIN srcmap USING (doc_id) WHERE source = 'src0'),
       cpos AS (
         SELECT s.doc_id, s.pos
         FROM sh s JOIN srcmap m USING (doc_id)
         WHERE m.source <> 'src0'
           AND s.shingle IN (SELECT shingle FROM bench)),
       isl AS (
         SELECT doc_id, pos,
                CASE WHEN max(pos + 3) OVER prev IS NULL
                       OR pos > max(pos + 3) OVER prev + 1
                     THEN 1 ELSE 0 END AS ni
         FROM cpos
         WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       isl2 AS (
         SELECT doc_id, pos,
                sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
       spans AS (
         SELECT doc_id, island, min(pos) AS s, max(pos) + 3 AS e
         FROM isl2 GROUP BY doc_id, island),
       per AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                CAST(sum(e - s + 1) AS BIGINT) AS leaked_tokens
         FROM spans GROUP BY doc_id),
       tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
               FROM tok GROUP BY doc_id)
       SELECT p.doc_id, t.n_tokens, p.n_spans, p.leaked_tokens,
              round(p.leaked_tokens / greatest(t.n_tokens, 1), 4) AS leaked_fraction
       FROM per p JOIN tot t USING (doc_id)""",
)
def _contamination_spans(spark, sf_dir):
    """Span-level decontamination (GPT-3 appendix C, with positions):
    the exact token ranges where a corpus document reproduces a 4-gram
    of the held-out benchmark (source src0 stands in), via a broadcast
    semi-probe of the benchmark's shingles — the corpus is never
    shuffled (dedup/spans.py:contamination_span_report)."""
    from redshells_spark.dedup.spans import contamination_span_report

    docs = _tokens(spark, sf_dir)
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    return contamination_span_report(corpus, bench, shingle_len=4)


@q(
    "pass_at_k_by_source",
    """WITH samp AS (
         SELECT source AS problem,
                (len(list_filter(string_split(lower(text), ' '), t -> t <> '')) >= 40) AS correct
         FROM documents),
       counts AS (
         SELECT problem,
                CAST(count(*) AS BIGINT) AS n_samples,
                CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         FROM samp GROUP BY problem),
       with_k AS (
         SELECT c.*, CAST(k.k AS BIGINT) AS k
         FROM counts c, (SELECT unnest([1, 5, 10]) AS k) k
         WHERE k.k <= c.n_samples)
       SELECT problem, n_samples, n_correct, k,
              round(CASE WHEN n_samples - n_correct < k THEN 1.0
                         ELSE 1.0 - list_reduce(
                                list_transform(generate_series(0, CAST(k AS INTEGER) - 1),
                                  i -> (n_samples - n_correct - i) / CAST(n_samples - i AS DOUBLE)),
                                (a, b) -> a * b)
                    END, 4) AS pass_at_k
       FROM with_k""",
)
def _pass_at_k_by_source(spark, sf_dir):
    """Chen et al. 2021 unbiased pass@k (ml/pass_at_k.py): sources
    stand in for problems, docs for samples, the >= 40-token gate for
    "correct". The telescoping-product form folds the same IEEE double
    sequence in both engines, so values match bit-for-bit before the
    display rounding."""
    from redshells_spark.ml.pass_at_k import pass_at_k

    docs = _tokens(spark, sf_dir).select(
        "source", (F.size("tokens") >= 40).alias("correct")
    )
    return pass_at_k(docs, "source", "correct", ks=(1, 5, 10))


# ---- unigram-LM tokenizer oracle: Viterbi DP unrolled as CTE stages
_UNI_N = 12  # DP positions (corpus max word length is 8; headroom)
_UNI_L = 4  # max piece length
_UNI_TOP = 50  # multi-char candidates kept


def _unigram_dp_sql() -> str:
    stages = []
    for j in range(1, _UNI_N + 1):
        arms = []
        for l in range(1, min(_UNI_L, j) + 1):
            arms.append(
                f"""SELECT w.word,
                       d.score + coalesce(p.logp_e6, -1000000000000000) AS score,
                       {l} AS bp
                FROM wf w
                JOIN dp{j - l} d ON d.word = w.word
                LEFT JOIN pieces p ON p.piece = substr(w.word, {j - l + 1}, {l})"""
            )
        union = "\n                UNION ALL\n                ".join(arms)
        stages.append(
            f"""dp{j} AS MATERIALIZED (
             SELECT word, score, bp FROM (
               SELECT c.word, c.score, c.bp,
                      row_number() OVER (PARTITION BY c.word
                                         ORDER BY c.score DESC, c.bp DESC) AS rn
               FROM ({union}) c)
             WHERE rn = 1)"""
        )
    dpall = " UNION ALL ".join(
        f"SELECT word, {j} AS j, bp FROM dp{j}" for j in range(1, _UNI_N + 1)
    )
    stages.append(f"dpall AS MATERIALIZED ({dpall})")
    stages.append(
        "bt0 AS (SELECT word, length(word) AS j, []::VARCHAR[] AS parts FROM wf)"
    )
    for i in range(1, _UNI_N + 1):
        stages.append(
            f"""bt{i} AS MATERIALIZED (
             SELECT b.word,
                    CASE WHEN b.j > 0 THEN b.j - d.bp ELSE b.j END AS j,
                    CASE WHEN b.j > 0
                         THEN list_append(b.parts, substr(b.word, b.j - d.bp + 1, d.bp))
                         ELSE b.parts END AS parts
             FROM bt{i - 1} b
             LEFT JOIN dpall d ON d.word = b.word AND d.j = b.j)"""
        )
    return ",\n       ".join(stages)


@q(
    "unigram_encode",
    f"""WITH {_TOK0_SQL},
       wf AS MATERIALIZED (SELECT token AS word, CAST(count(*) AS BIGINT) AS freq
              FROM tok GROUP BY token),
       subs AS (
         SELECT substr(word, s.s, l.l) AS piece, freq
         FROM wf
         JOIN (SELECT unnest(generate_series(1, {_UNI_N})) AS s) s
           ON s.s <= length(word)
         JOIN (SELECT unnest(generate_series(1, {_UNI_L})) AS l) l
           ON l.l <= length(word) - s.s + 1),
       pc AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses
              FROM subs GROUP BY piece),
       kept AS (
         SELECT * FROM pc WHERE length(piece) = 1
         UNION ALL
         SELECT * FROM (SELECT * FROM pc WHERE length(piece) > 1
                        ORDER BY n_uses DESC, piece ASC LIMIT {_UNI_TOP})),
       tot AS (SELECT sum(n_uses) AS t FROM kept),
       pieces AS MATERIALIZED (
         SELECT piece,
                CAST(floor(ln(n_uses) * 1000000) - floor(ln(t) * 1000000)
                     AS BIGINT) AS logp_e6
         FROM kept CROSS JOIN tot),
       dp0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS bp FROM wf),
       {_unigram_dp_sql()},
       seg AS (SELECT word, list_reverse(parts) AS pieces FROM bt{_UNI_N})
       SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
              CAST(generate_subscripts(s.pieces, 1) - 1 AS BIGINT) AS sub_pos,
              unnest(s.pieces) AS piece
       FROM tok t JOIN seg s ON s.word = t.token""",
)
def _unigram_encode(spark, sf_dir):
    """Unigram-LM (SentencePiece) tokenizer, Kudo 2018 arXiv:1804.10959
    (text/unigram.py): substring-seeded piece table with exact-int
    fixed-point log-probs, Viterbi best segmentation of the
    distinct-word relation ENTIRELY in Catalyst expressions (one DP
    column per prefix position, backtrace as an aggregate fold — no
    UDF), then corpus encoding via one broadcast join. The oracle
    replays the identical DP as unrolled SQL stages; ties break
    (score desc, last-piece-length desc) on exact int64 in both
    engines. Complements text/bpe.py — the two standard subword
    families, both oracle-checked."""
    from redshells_spark.text.unigram import (
        seed_piece_table,
        unigram_encode,
        viterbi_segment_words,
    )

    toks = _tokens(spark, sf_dir)
    words = (
        toks.select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pieces = seed_piece_table(
        words, max_piece_len=_UNI_L, keep_top=_UNI_TOP
    )
    seg = viterbi_segment_words(
        words, pieces, max_piece_len=_UNI_L, max_word_len=_UNI_N
    )
    docs = _t(spark, sf_dir, "documents")
    return unigram_encode(docs, seg)
