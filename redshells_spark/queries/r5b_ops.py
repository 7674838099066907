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
