"""Round-6 additions: the sqrt(N)-rule SemDeDup path as an oracled
query, Min-K% Prob pretraining-membership signals, speculative-decoding
acceptance analytics, and a Hill tail-index profile of the token
distribution.

Registered after r5d_ops; the package __init__ surfaces these at the
head of _FRONT so they land inside the driver's 50-query window.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.similarity import _COS_SQL  # noqa: E402
from redshells_spark.queries.text import _duck_h60  # noqa: E402

# ----------------------------------------------------- semantic dedup, √N k


@q(
    "semantic_dedup_sqrtn",
    f"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       -- max(16, isqrt(n-1)+1) == max(16, ceil(sqrt(n))) for n >= 1
       kk AS (SELECT greatest(16, CAST(ceil(sqrt(n)) AS BIGINT)) AS k FROM nn),
       rk AS (
         SELECT vec_id, embedding,
                row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS rn
         FROM (SELECT vec_id, embedding, {_duck_h60("vec_id")} AS h
               FROM embeddings)),
       cent AS (SELECT CAST(rn AS BIGINT) AS cid, embedding
                FROM rk, kk WHERE rn < kk.k),
       d2 AS (
         SELECT e.vec_id AS eid, c.cid AS cid,
                list_reduce(list_transform(range(1, 65),
                    i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                       * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)),
                    (acc, x) -> acc + x) AS d2
         FROM embeddings e CROSS JOIN cent c),
       assign AS (
         SELECT eid AS vec_id, cid FROM (
           SELECT eid, cid,
                  row_number() OVER (PARTITION BY eid ORDER BY d2 ASC, cid ASC) AS rn2
           FROM d2)
         WHERE rn2 = 1),
       pairs AS (
         SELECT s1.vec_id AS id1
         FROM assign s0
         JOIN assign s1 ON s0.cid = s1.cid AND s0.vec_id < s1.vec_id
         JOIN embeddings a ON a.vec_id = s0.vec_id
         JOIN embeddings b ON b.vec_id = s1.vec_id
         WHERE {_COS_SQL} >= 0.25),
       dropped AS (SELECT DISTINCT id1 AS vec_id FROM pairs)
       SELECT s.vec_id, s.cid
       FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
       WHERE d.vec_id IS NULL""",
)
def _semantic_dedup_sqrtn(spark, sf_dir):
    """SemDeDup under the paper's sqrt(N) centroid rule
    (dedup/semantic.py with ``centroids=None``): k = max(16, ceil √N)
    seed centroids derived from the corpus itself, so the per-cluster
    population — and with it the quadratic within-cluster term — stays
    ~√N as the corpus grows. This is the configuration that holds at
    100 TB (the k=16 ``semantic_dedup`` entry pins a fixed quantizer
    for oracle continuity); the dynamic-k derivation is itself
    oracle-checked here via a window-bounded centroid CTE."""
    from redshells_spark.dedup.semantic import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    kept = semantic_dedup(emb, centroids=None, threshold=0.25)
    return kept.select("vec_id", F.col("cid").cast("long").alias("cid"))


# ------------------------------------------------------------ Min-K% Prob

_MINK_LM_SQL = """tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         FROM documents),
       flat AS (
         SELECT doc_id, unnest(toks) AS token,
                generate_subscripts(toks, 1) AS pos
         FROM tok),
       prs AS (
         SELECT doc_id, pos,
                coalesce(lag(token) OVER (PARTITION BY doc_id ORDER BY pos ASC), '␟<s>') AS prev,
                token AS word
         FROM flat),
       bc AS (SELECT prev, word, count(*) AS n FROM prs GROUP BY 1, 2),
       ctx AS (SELECT prev, sum(n) AS c_prev, count(*) AS n1p_fwd FROM bc GROUP BY 1),
       cont AS (SELECT word, count(*) AS n1p_bwd FROM bc GROUP BY 1),
       ty AS (SELECT count(*) AS n_types FROM bc),
       sc AS (
         SELECT p.doc_id, p.pos,
                log2((greatest(bc.n - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
                      + CAST(0.75 AS DOUBLE) * ctx.n1p_fwd
                        * (cont.n1p_bwd / ty.n_types))
                     / ctx.c_prev) AS lp
         FROM prs p
         JOIN bc USING (prev, word)
         JOIN ctx USING (prev)
         JOIN cont USING (word), ty)"""


@q(
    "min_k_prob_contamination",
    f"""WITH {_MINK_LM_SQL},
       ranked AS (
         SELECT doc_id, lp,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY lp ASC, pos ASC) AS rn,
                count(*) OVER (PARTITION BY doc_id) AS n_scored
         FROM sc)
       SELECT doc_id,
              CAST(max(n_scored) AS BIGINT) AS n_scored,
              CAST(CAST(ceil(0.2 * max(n_scored)) AS BIGINT) AS BIGINT) AS k_min,
              round(avg(CASE WHEN rn <= CAST(ceil(0.2 * n_scored) AS BIGINT)
                             THEN lp END), 4) AS min_k_lp
       FROM ranked GROUP BY doc_id""",
)
def _min_k_prob_contamination(spark, sf_dir):
    """Min-K% Prob pretraining-data detection (Shi et al. 2024,
    "Detecting Pretraining Data from Large Language Models"): a
    document's membership signal is the mean log-probability of its
    LOWEST-20% scoring tokens under a reference LM — members lack the
    few very-improbable outlier tokens that fresh text has. Scored
    with the repo's interpolated KN bigram LM (text/ngram_lm.py, the
    same scorer behind kn_perplexity/ccnet buckets); per-doc bottom-k
    selection is one window with a (lp, pos) total-order tie-break, so
    both engines pick the identical token set. One explode + LM joins
    + one window — no shuffle carries text."""
    docs = _t(spark, sf_dir, "documents")
    lm = _kn_lm(spark, sf_dir)
    from redshells_spark.text.ngram_lm import _bigrams, _tokens

    toks = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    prs = toks.withColumn(
        "prev", F.coalesce(F.lag("word").over(w_lag), F.lit("␟<s>"))
    )
    d = F.lit(0.75)
    p_cont = F.coalesce(F.col("n1p_bwd"), F.lit(0)) / F.lit(
        float(lm.n_bigram_types)
    )
    p = (
        F.greatest(F.coalesce(F.col("n"), F.lit(0)) - d, F.lit(0.0))
        + d * F.col("n1p_fwd") * p_cont
    ) / F.col("c_prev")
    sc = (
        prs.join(F.broadcast(lm.bigram_counts), ["prev", "word"])
        .join(F.broadcast(lm.context_stats), "prev")
        .join(F.broadcast(lm.continuation_counts), "word", "left")
        .select("doc_id", "pos", F.log2(p).alias("lp"))
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("lp").asc(), F.col("pos").asc()
    )
    w_all = Window.partitionBy("doc_id")
    ranked = sc.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n_scored", F.count(F.lit(1)).over(w_all)
    )
    return ranked.groupBy("doc_id").agg(
        F.max("n_scored").cast("long").alias("n_scored"),
        F.ceil(0.2 * F.max("n_scored")).cast("long").alias("k_min"),
        F.round(
            F.avg(
                F.when(
                    F.col("rn") <= F.ceil(0.2 * F.col("n_scored")).cast("long"),
                    F.col("lp"),
                )
            ),
            4,
        ).alias("min_k_lp"),
    )


# --------------------------------------------- speculative-decoding accept


@q(
    "draft_acceptance_stats",
    """WITH tok AS (
         SELECT doc_id, lang,
                list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         FROM documents),
       flat AS (
         SELECT doc_id, lang, unnest(toks) AS token,
                generate_subscripts(toks, 1) AS pos
         FROM tok),
       cons AS (SELECT * FROM flat WHERE pos <= 32),
       -- the draft "model" diverges where md5(token) starts 0-3 AND
       -- the reversed token differs (a deterministic ~25% divergence)
       mism AS (
         SELECT doc_id, min(pos) AS first_bad
         FROM cons
         WHERE substr(md5(token), 1, 1) IN ('0', '1', '2', '3')
           AND reverse(token) <> token
         GROUP BY doc_id),
       per_doc AS (
         SELECT c.doc_id, max(c.lang) AS lang,
                CAST(count(*) AS BIGINT) AS n_cons,
                CAST(coalesce(max(m.first_bad) - 1, count(*)) AS BIGINT) AS lcp
         FROM cons c LEFT JOIN mism m ON m.doc_id = c.doc_id
         GROUP BY c.doc_id)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(lcp) AS BIGINT) AS sum_accepted,
              CAST(sum(n_cons) AS BIGINT) AS sum_drafted,
              CAST((2 * sum(lcp) * 10000 + count(*)) // (2 * count(*)) AS BIGINT)
                  AS mean_accept_e4,
              CAST(sum(CASE WHEN lcp = n_cons THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_full_accept
       FROM per_doc GROUP BY lang""",
)
def _draft_acceptance_stats(spark, sf_dir):
    """Speculative-decoding acceptance analytics (Leviathan et al.
    2023): given per-sequence draft vs target token streams, the
    accepted prefix length is the first draft/target mismatch — the
    metric that decides whether a draft model speeds up serving. The
    draft stream is derived deterministically from the corpus (token
    reversed where its md5 leads 0-3), so both engines score identical
    pairs. Exact integer statistics per language: accepted/drafted
    token sums, e4 fixed-point mean acceptance, full-accept count.
    One explode + one min-aggregate — the sequences never self-join."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokenize_on_space(docs, "text", "toks", lowercase=True)
    flat = toks.select(
        "doc_id", "lang", F.posexplode("toks").alias("pos0", "token")
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"), "token")
    cons = flat.filter(F.col("pos") <= 32)
    mism = (
        cons.filter(
            F.substring(F.md5("token"), 1, 1).isin("0", "1", "2", "3")
            & (F.reverse(F.col("token")) != F.col("token"))
        )
        .groupBy("doc_id")
        .agg(F.min("pos").alias("first_bad"))
    )
    per_doc = (
        cons.join(mism, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).cast("long").alias("n_cons"),
            F.coalesce(F.max("first_bad") - 1, F.count(F.lit(1)))
            .cast("long")
            .alias("lcp"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lcp").cast("long").alias("sum_accepted"),
        F.sum("n_cons").cast("long").alias("sum_drafted"),
        F.expr("(2 * sum(lcp) * 10000 + count(*)) div (2 * count(*))")
        .cast("long")
        .alias("mean_accept_e4"),
        F.sum((F.col("lcp") == F.col("n_cons")).cast("long"))
        .cast("long")
        .alias("n_full_accept"),
    )


# ----------------------------------------------------------- Hill tail fit


@q(
    "hill_tail_index",
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
         FROM documents),
       cnt AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
       rk AS (
         SELECT source, c,
                row_number() OVER (PARTITION BY source
                                   ORDER BY c DESC, token ASC) AS rn
         FROM cnt),
       tail AS (SELECT source, CAST(c AS DOUBLE) AS c_ref FROM rk WHERE rn = 11),
       top AS (SELECT source, c FROM rk WHERE rn <= 10)
       SELECT t.source,
              CAST(10 AS BIGINT) AS m,
              CAST(max(ta.c_ref) AS BIGINT) AS c_tail,
              round(10.0 / sum(ln(t.c / ta.c_ref)), 4) AS hill_alpha
       FROM top t JOIN tail ta ON ta.source = t.source
       GROUP BY t.source""",
)
def _hill_tail_index(spark, sf_dir):
    """Hill tail-index estimate (Hill 1975) of each source's token
    frequency distribution — the standard check that a corpus slice
    follows the expected Zipfian tail (alpha ~ 1) rather than being
    template-dominated (heavy head, alpha >> 1) or shredded. Uses the
    top m=10 order statistics against the (m+1)-th:
    alpha = m / sum ln(c_i / c_(m+1)). Counts are exact int64; the
    log-sum is one fixed expression per source, rounded after the
    aggregate (the ppl-oracle precedent). Token counting is the usual
    map-combined groupBy; the window runs over the vocabulary-bounded
    counts relation, never the corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokenize_on_space(docs, "text", "toks", lowercase=True)
    cnt = (
        toks.select("source", F.explode("toks").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    rk = cnt.withColumn("rn", F.row_number().over(w))
    tail = rk.filter(F.col("rn") == 11).select(
        "source", F.col("c").cast("double").alias("c_ref")
    )
    top = rk.filter(F.col("rn") <= 10).select("source", "c")
    return (
        top.join(tail, "source")
        .groupBy("source")
        .agg(
            F.lit(10).cast("long").alias("m"),
            F.max("c_ref").cast("long").alias("c_tail"),
            F.round(
                F.lit(10.0) / F.sum(F.log(F.col("c") / F.col("c_ref"))), 4
            ).alias("hill_alpha"),
        )
    )


# -------------------------------------------------- SGD-trained FastText


@q("fasttext_sgd_oov")  # SGD fit (numpy RNG) → rows-only check
def _fasttext_sgd_oov(spark, sf_dir):
    """FastText with SGD-TRAINED subwords (ml/fasttext.py:fit_sgd —
    Bojanowski et al. 2017 §3.2, the reference's actual gensim training
    objective, reimplemented since gensim is absent): skip-gram with
    negative sampling where the center word is the mean of its char
    n-gram vectors, so the bucket vectors that compose OOV words are
    learned against co-occurrence rather than induced post-hoc.
    Rows-only (SGD RNG); topic-separation and OOV-composition gates
    live in tests/test_fasttext.py."""
    from redshells_spark.ml.fasttext import FastTextVectors

    ft = FastTextVectors.fit_sgd(
        _tokens(spark, sf_dir), vector_size=16, min_count=2, epochs=3,
        bucket=100_000, max_docs=2_000, seed=42,
    )
    words = spark.createDataFrame(
        [("spark",), ("window",), ("sparkly",), ("windowing",), ("quuxzilch",)],
        ["word"],
    )
    out = ft.infer_vectors(words)
    return out.select(
        "word",
        "oov",
        F.round(F.coalesce(F.aggregate("vector", F.lit(0.0), lambda a, x: a + F.abs(x)), F.lit(-1.0)), 4).alias("l1_norm"),
    ).orderBy("word")
