"""Round-5 additions: binary-code ANN tier, dedup-quality evaluation,
CCNet perplexity bucketing, quality-stratified mixing, Matryoshka
truncation. All beyond-reference LLM-pipeline operators; every entry
registers at the head of the driver window (_FRONT in __init__)."""

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.dedup import _SHINGLE_SQL  # noqa: F401
from redshells_spark.queries.similarity import _COS_SQL  # noqa: F401

EMB_DIM = 64  # driver testdata embedding width (embeddings.parquet)

# sign-bit packing in DuckDB: 32 bits per word so 1<<b never touches
# the int64 sign bit (mirrors similarity/binary.py token-for-token)
_BINQ_SQL = """
    x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             unnest(embedding) AS x
      FROM embeddings),
    codes AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN d < 32 AND x > 0
                           THEN (1::BIGINT << d) ELSE 0 END) AS BIGINT) AS w0,
             CAST(sum(CASE WHEN d >= 32 AND x > 0
                           THEN (1::BIGINT << (d - 32)) ELSE 0 END) AS BIGINT) AS w1
      FROM x GROUP BY vec_id)
"""


@q(
    "binary_quantize_embeddings",
    f"""WITH {_BINQ_SQL}
       SELECT vec_id, w0, w1,
              CAST(bit_count(w0) + bit_count(w1) AS BIGINT) AS n_pos
       FROM codes""",
)
def _binary_quantize_embeddings(spark, sf_dir):
    """1-bit sign quantization (similarity/binary.py binary_quantize):
    the third rung of the quantization ladder after int8 — 64 floats
    pack into two 32-bit-populated int64 words, 32× smaller than
    float32, with a popcount checksum pinning every bit. Pure integer
    sign tests, so the codes are bit-identical cross-engine. At 100 TB
    the binary corpus is the first-stage ANN filter that streams
    through codegen at scan speed."""
    from redshells_spark.similarity.binary import binary_quantize

    out = binary_quantize(_t(spark, sf_dir, "embeddings"), dim=EMB_DIM)
    return out.select(
        "vec_id",
        F.element_at("words", 1).alias("w0"),
        F.element_at("words", 2).alias("w1"),
        "n_pos",
    )


@q(
    "hamming_topk",
    f"""WITH {_BINQ_SQL},
       qs AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
              FROM codes WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, c.vec_id,
                CAST(bit_count(xor(c.w0, q.q0))
                     + bit_count(xor(c.w1, q.q1)) AS BIGINT) AS hamming
         FROM codes c CROSS JOIN qs q)
       SELECT query_id, vec_id, hamming,
              CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY hamming ASC, vec_id ASC) AS BIGINT) AS rn
       FROM scored
       QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY hamming ASC, vec_id ASC) <= 5""",
)
def _hamming_topk(spark, sf_dir):
    """Hamming-distance retrieval over the binary codes
    (similarity/binary.py hamming_topk): xor + popcount per word pair —
    a handful of cycles inside whole-stage codegen, the Faiss
    IndexBinaryFlat shape. Query codes broadcast; the corpus streams
    once; per-query top-k is a WindowGroupLimit. Exact integer
    distances with id tie-breaks make the ranking engine-exact. The
    production pattern: this is the 100 TB coarse stage, survivors
    re-rank through exact cosine or the int8 codes."""
    from redshells_spark.similarity.binary import binary_quantize, hamming_topk

    codes = binary_quantize(_t(spark, sf_dir, "embeddings"), dim=EMB_DIM).drop(
        "n_pos"
    )
    queries = codes.filter(F.col("vec_id") < 10)
    return hamming_topk(codes, queries, n_words=EMB_DIM // 32, k=5)


@q(
    "minhash_dedup_eval",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
       banded AS (
         SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
                md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j ASC)) AS bucket
         FROM sigs WHERE CAST(j // 4 AS INTEGER) < 4
         GROUP BY doc_id, CAST(j // 4 AS INTEGER)),
       sized AS (
         SELECT * FROM (
           SELECT band, bucket, doc_id, count(*) OVER (PARTITION BY band, bucket) AS bsz
           FROM banded) WHERE bsz <= 1000),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_id_0, b.doc_id AS doc_id_1
         FROM sized a JOIN sized b ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id < b.doc_id),
       sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT s0.doc_id AS doc_id_0, s1.doc_id AS doc_id_1, count(*) AS inter
         FROM shingles s0 JOIN shingles s1
           ON s1.shingle = s0.shingle AND s0.doc_id < s1.doc_id
         GROUP BY 1, 2),
       truth AS (
         SELECT i.doc_id_0, i.doc_id_1
         FROM inter i
         JOIN sz z0 ON z0.doc_id = i.doc_id_0
         JOIN sz z1 ON z1.doc_id = i.doc_id_1
         WHERE 10 * i.inter >= (z0.sz + z1.sz - i.inter)),
       hit AS (SELECT count(*) AS n FROM cand c
               JOIN truth t ON t.doc_id_0 = c.doc_id_0 AND t.doc_id_1 = c.doc_id_1),
       nc AS (SELECT count(*) AS n FROM cand),
       nt AS (SELECT count(*) AS n FROM truth)
       SELECT CAST(nc.n AS BIGINT) AS n_candidates,
              CAST(nt.n AS BIGINT) AS n_truth,
              CAST(hit.n AS BIGINT) AS n_hits,
              CAST((2 * hit.n * 1000000 + nc.n) // (2 * nc.n) AS BIGINT) AS precision_e6,
              CAST((2 * hit.n * 1000000 + nt.n) // (2 * nt.n) AS BIGINT) AS recall_e6
       FROM nc, nt, hit""",
)
def _minhash_dedup_eval(spark, sf_dir):
    """Dedup-quality evaluation: precision/recall of the banded-LSH
    candidate set against EXACT shingle-Jaccard ≥ 0.1 ground truth
    (dedup/minhash.py candidates vs a shingle self-join). The ≥ t test
    is the integer comparison 10·|∩| ≥ |∪| and the exports exact
    (2a+b) div 2b ratios — no float anywhere, so the measured quality
    of the dedup tier is itself oracle-exact. The exact side is
    by-contract bounded (shingle co-occurrence join) — it's the
    measurement harness, not the production path; run it on samples
    at scale."""
    sh = _shingles(spark, sf_dir)
    cand = _cand44(spark, sf_dir).select("doc_id_0", "doc_id_1")
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    s0 = sh.select(F.col("doc_id").alias("doc_id_0"), "shingle")
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), "shingle")
    inter = (
        s0.join(s1, "shingle")
        .filter(F.col("doc_id_0") < F.col("doc_id_1"))
        .groupBy("doc_id_0", "doc_id_1")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    truth = (
        inter.join(sz.withColumnRenamed("doc_id", "doc_id_0").withColumnRenamed("sz", "sz0"), "doc_id_0")
        .join(sz.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed("sz", "sz1"), "doc_id_1")
        .filter(10 * F.col("inter") >= (F.col("sz0") + F.col("sz1") - F.col("inter")))
        .select("doc_id_0", "doc_id_1")
        # referenced by both the hit join and the n_truth count — pin it
        # so the shingle co-occurrence self-join (the expensive subtree)
        # runs once; output is the bounded >=0.1-Jaccard pair relation
        .localCheckpoint(eager=True)
    )
    hits = cand.join(truth, ["doc_id_0", "doc_id_1"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_truth")))
        .crossJoin(hits)
    )
    return counts.select(
        "n_candidates",
        "n_truth",
        "n_hits",
        F.expr("(2 * n_hits * 1000000 + n_candidates) div (2 * n_candidates)").alias("precision_e6"),
        F.expr("(2 * n_hits * 1000000 + n_truth) div (2 * n_truth)").alias("recall_e6"),
    )


@q(
    "ccnet_perplexity_buckets",
    """WITH tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         FROM documents),
       flat AS (
         SELECT doc_id, unnest(toks) AS token,
                generate_subscripts(toks, 1) AS pos
         FROM tok),
       pairs AS (
         SELECT doc_id,
                coalesce(lag(token) OVER (PARTITION BY doc_id ORDER BY pos ASC), '␟<s>') AS prev,
                token AS word
         FROM flat),
       bc AS (SELECT prev, word, count(*) AS n FROM pairs GROUP BY 1, 2),
       ctx AS (SELECT prev, sum(n) AS c_prev, count(*) AS n1p_fwd FROM bc GROUP BY 1),
       cont AS (SELECT word, count(*) AS n1p_bwd FROM bc GROUP BY 1),
       ty AS (SELECT count(*) AS n_types FROM bc),
       sc AS (
         SELECT p.doc_id,
                log2((greatest(bc.n - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
                      + CAST(0.75 AS DOUBLE) * ctx.n1p_fwd
                        * (cont.n1p_bwd / ty.n_types))
                     / ctx.c_prev) AS lp
         FROM pairs p
         JOIN bc USING (prev, word)
         JOIN ctx USING (prev)
         JOIN cont USING (word), ty),
       ppl AS (
         SELECT doc_id, round(pow(2.0, -avg(lp)), 4) AS perplexity
         FROM sc GROUP BY doc_id)
       SELECT d.doc_id, d.lang, p.perplexity,
              CAST(ntile(3) OVER (PARTITION BY d.lang
                     ORDER BY p.perplexity ASC, d.doc_id ASC) AS BIGINT) AS bucket
       FROM ppl p JOIN documents d ON d.doc_id = p.doc_id""",
)
def _ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet's actual selection step (Wenzek et al. 2020 §4.3): rank
    each language's documents by LM perplexity and cut into
    head/middle/tail terciles — head trains, tail drops, middle is
    judgement. Built on the KN bigram scorer (text/ngram_lm.py);
    bucketing orders on the ROUNDED perplexity with a doc-id tie-break
    so tercile boundaries are engine-exact (raw float ordering could
    flip docs whose true scores differ below summation noise). One
    window per language over the tiny (doc, ppl) relation — the corpus
    itself never re-shuffles."""
    from redshells_spark.text.ngram_lm import score_kn_perplexity

    docs = _t(spark, sf_dir, "documents")
    lm = _kn_lm(spark, sf_dir)
    ppl = score_kn_perplexity(docs, lm, broadcast_lm=True).select(
        "doc_id", _r4(F.col("perplexity"), "perplexity")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("perplexity").asc(), F.col("doc_id").asc()
    )
    return (
        ppl.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("bucket", F.ntile(3).over(w).cast("long"))
        .select("doc_id", "lang", "perplexity", "bucket")
    )


@q(
    "quality_stratified_mix",
    """WITH t AS (
         SELECT doc_id, source,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
                string_split(text, chr(10)) AS lines, text
         FROM documents),
       m AS (
         SELECT doc_id, source,
                len(toks) AS n_tokens,
                greatest(len(toks), 1) AS ntd,
                length(array_to_string(toks, '')) AS wl_sum,
                length(text) - length(replace(text, '#', '')) AS n_hash,
                (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell,
                len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                len(list_intersect(list_distinct(toks),
                    ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS n_stop,
                greatest(len(lines), 1) AS nld,
                len(list_filter(lines, l -> starts_with(l, '- ')
                    OR starts_with(l, '* ') OR starts_with(l, '•'))) AS n_bul,
                len(list_filter(lines, l -> ends_with(l, '...')
                    OR ends_with(l, '…'))) AS n_ele
         FROM t),
       kept AS (
         SELECT source, n_tokens FROM m
         WHERE n_tokens >= 50 AND n_tokens <= 100000
           AND wl_sum / CAST(ntd AS DOUBLE) >= 3
           AND wl_sum / CAST(ntd AS DOUBLE) <= 10
           AND (n_hash + n_ell) / CAST(ntd AS DOUBLE) <= CAST(0.1 AS DOUBLE)
           AND n_alpha / CAST(ntd AS DOUBLE) >= CAST(0.8 AS DOUBLE)
           AND n_bul / CAST(nld AS DOUBLE) <= CAST(0.9 AS DOUBLE)
           AND n_ele / CAST(nld AS DOUBLE) <= CAST(0.3 AS DOUBLE)),
       c AS (SELECT source, count(*)::BIGINT AS n_docs,
                    CAST(sum(n_tokens) AS BIGINT) AS n
             FROM kept GROUP BY source),
       tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
       b AS (
         SELECT c.source, c.n_docs, c.n,
                CAST((100000 * c.n) // tt.tot AS BIGINT) AS floor_share,
                CAST((100000 * c.n) % tt.tot AS BIGINT) AS rem
         FROM c, tt),
       s AS (SELECT CAST(100000 - sum(floor_share) AS BIGINT) AS short FROM b)
       SELECT b.source, b.n_docs, b.n, b.floor_share,
              CAST(b.floor_share
                + CAST(row_number() OVER (ORDER BY b.rem DESC, b.source ASC)
                         <= s.short AS BIGINT) AS BIGINT) AS allocation
       FROM b, s""",
)
def _quality_stratified_mix(spark, sf_dir):
    """Quality-stratified source mixing — the composite a training-mix
    pipeline actually runs: Gopher quality gate (text/analysis.py) →
    per-source token counts of the SURVIVORS → largest-remainder
    integer quotas over a 100k-token budget (data/sampling.py). Every
    stage already oracle-exact on its own; the composite pins that
    they compose without a float seam. Uses the STRUCTURAL subset of
    the Gopher battery (length, word shape, symbols, bullets) — the
    English-stopword rule zeroes this synthetic corpus out; production
    keeps the full `keep` conjunction. One codegen scan + one tiny
    per-source aggregate + one ordered window."""
    from redshells_spark.data.sampling import largest_remainder_allocation
    from redshells_spark.text.analysis import gopher_quality_rules

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    g = gopher_quality_rules(docs)
    kept = g.filter(
        (F.col("n_tokens") >= 50)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("frac_bullet_lines") <= 0.9)
        & (F.col("frac_ellipsis_lines") <= 0.3)
    )
    counts = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("n"),
    )
    # n_docs CARRIES through the allocation windows instead of joining
    # the result back to counts — the join form ran the fact-scale
    # Gopher gate twice (column pruning specializes the two aggregate
    # subtrees, defeating exchange reuse); this is one corpus scan
    alloc = largest_remainder_allocation(
        counts, total_budget=100_000, carry_columns=("n_docs",)
    )
    return alloc.select("source", "n_docs", "n", "floor_share", "allocation")


@q(
    "matryoshka_truncation_report",
    """WITH x AS (
         SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                unnest(embedding::DOUBLE[]) AS x
         FROM embeddings),
       n AS (
         SELECT vec_id,
                sqrt(sum(x * x)) AS full_norm,
                sqrt(sum(CASE WHEN d < 32 THEN x * x ELSE 0 END)) AS trunc_norm
         FROM x GROUP BY vec_id)
       SELECT vec_id,
              round(trunc_norm / greatest(full_norm, 1e-12), 4) AS energy_kept,
              round(trunc_norm * trunc_norm / greatest(full_norm * full_norm, 1e-12), 4)
                AS energy_kept_sq
       FROM n""",
)
def _matryoshka_truncation_report(spark, sf_dir):
    """Matryoshka-style dimension truncation report (Kusupati et al.
    2022): keeping the first 32 of 64 dims, what fraction of each
    vector's L2 energy survives? energy_kept = ‖x[:32]‖/‖x‖ is also
    exactly the cosine between the truncated-then-zero-padded vector
    and the original, so the report reads directly as serving-time
    similarity degradation. Per-row bounded (64-element) sums — the
    cleared float class — rounded after one deterministic ratio. Pure
    codegen; the decision artifact before shipping half-width vectors
    to the ANN tier."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "x")
    )
    n = x.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("full_norm"),
        F.sqrt(
            F.sum(F.when(F.col("d") < 32, F.col("x") * F.col("x")).otherwise(F.lit(0.0)))
        ).alias("trunc_norm"),
    )
    return n.select(
        "vec_id",
        _r4(F.col("trunc_norm") / F.greatest(F.col("full_norm"), F.lit(1e-12)), "energy_kept"),
        _r4(
            (F.col("trunc_norm") * F.col("trunc_norm"))
            / F.greatest(F.col("full_norm") * F.col("full_norm"), F.lit(1e-12)),
            "energy_kept_sq",
        ),
    )


@q(
    "binary_rerank_topk",
    f"""WITH {_BINQ_SQL},
       qs AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
              FROM codes WHERE vec_id < 10),
       coarse AS (
         SELECT q.query_id, c.vec_id
         FROM codes c CROSS JOIN qs q
         QUALIFY row_number() OVER (PARTITION BY q.query_id
                   ORDER BY bit_count(xor(c.w0, q.q0))
                            + bit_count(xor(c.w1, q.q1)) ASC,
                            c.vec_id ASC) <= 50)
       SELECT query_id, vec_id, round(score, 4) AS score,
              CAST(rn AS BIGINT) AS rank FROM (
         SELECT co.query_id, co.vec_id, {_COS_SQL} AS score,
                row_number() OVER (PARTITION BY co.query_id
                  ORDER BY {_COS_SQL} DESC, co.vec_id ASC) AS rn
         FROM coarse co
         JOIN embeddings a ON a.vec_id = co.query_id
         JOIN embeddings b ON b.vec_id = co.vec_id)
       WHERE rn <= 5""",
)
def _binary_rerank_topk(spark, sf_dir):
    """The production two-stage ANN pattern closed end-to-end: Hamming
    coarse stage over the 32×-compressed binary codes (xor+popcount at
    scan speed, 50 candidates/query) → EXACT cosine re-rank of the
    survivors only → top-5. At 100 TB the float vectors are touched
    for 50·|Q| rows instead of |corpus|·|Q| — the whole reason the
    binary tier exists. Both stages individually oracled
    (hamming_topk, brute_force_topk); this pins their composition."""
    from redshells_spark.functions.vector import cosine_similarity
    from redshells_spark.similarity.binary import binary_quantize, hamming_topk

    emb = _t(spark, sf_dir, "embeddings")
    codes = binary_quantize(emb, dim=EMB_DIM).drop("n_pos")
    queries = codes.filter(F.col("vec_id") < 10)
    coarse = hamming_topk(codes, queries, n_words=EMB_DIM // 32, k=50).select(
        "query_id", "vec_id"
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qe")
    )
    ce = emb.select("vec_id", F.col("embedding").alias("__ce"))
    scored = (
        coarse.join(F.broadcast(qe), "query_id")
        .join(ce, "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine_similarity("__qe", "__ce").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", _r4(F.col("score"), "score"), "rank")
    )
