"""Round-7 batch 11: dedup-pipeline meta-evaluation — the calibration
of the MinHash signature estimator against exact shingle Jaccard on
its own LSH candidates, and the pair-set agreement between the two
word-level near-dup methods the engine ships (MinHash-LSH-verified
shingle Jaccard vs blocked word-bigram Jaccard).

These are the reports a dedup pipeline owner reads before trusting a
threshold: "how biased is the sketch estimate per estimate bucket" and
"do my two dedup definitions flag the same pairs". House rules: every
Jaccard is an exact e6 integer division over exact int64 set sizes;
bucket means are exact integer divisions; relations are candidate- or
pair-bounded, never corpus^2.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.dedup import _SHINGLE_SQL  # noqa: E402

# candidate CTEs identical to minhash_near_dedup's oracle
_CAND_SQL = """banded AS (
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
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT c.doc_id_0, c.doc_id_1, CAST(count(*) AS BIGINT) AS inter
         FROM cand c
         JOIN shingles s0 ON s0.doc_id = c.doc_id_0
         JOIN shingles s1 ON s1.doc_id = c.doc_id_1 AND s1.shingle = s0.shingle
         GROUP BY c.doc_id_0, c.doc_id_1),
       exact AS (
         SELECT c.doc_id_0, c.doc_id_1,
                CAST(coalesce(i.inter, 0) * 1000000
                     // (z0.sz + z1.sz - coalesce(i.inter, 0)) AS BIGINT)
                  AS exact_e6
         FROM cand c
         LEFT JOIN inter i ON i.doc_id_0 = c.doc_id_0
                          AND i.doc_id_1 = c.doc_id_1
         JOIN sz z0 ON z0.doc_id = c.doc_id_0
         JOIN sz z1 ON z1.doc_id = c.doc_id_1)"""


# ---------------------------------------- MinHash estimate calibration


@q(
    "minhash_estimate_calibration",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
       {_CAND_SQL},
       agree AS (
         SELECT c.doc_id_0, c.doc_id_1,
                CAST(sum(CASE WHEN g0.minhash = g1.minhash THEN 1 ELSE 0 END)
                     AS BIGINT) AS agree16
         FROM cand c
         JOIN sigs g0 ON g0.doc_id = c.doc_id_0
         JOIN sigs g1 ON g1.doc_id = c.doc_id_1 AND g1.j = g0.j
         GROUP BY 1, 2),
       pairs AS (
         SELECT a.agree16, e.exact_e6,
                CAST(a.agree16 * 1000000 // 16 AS BIGINT) AS est_e6
         FROM agree a
         JOIN exact e ON e.doc_id_0 = a.doc_id_0 AND e.doc_id_1 = a.doc_id_1)
       SELECT agree16 AS est_sixteenths,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(exact_e6) // count(*) AS BIGINT) AS mean_exact_e6,
              CAST(sum(abs(est_e6 - exact_e6)) // count(*) AS BIGINT)
                AS mean_abs_err_e6
       FROM pairs GROUP BY 1 ORDER BY 1""",
)
def _minhash_estimate_calibration(spark, sf_dir):
    """Calibration of the 16-hash MinHash Jaccard estimator against
    the EXACT shingle Jaccard, per estimate bucket, over the LSH
    candidate pairs the dedup pipeline actually scores — the empirical
    companion to lsh_parameter_plan's theory: is agree/16 biased, and
    by how much, where the threshold sits? Signature agreement counts,
    exact intersections, and both means are exact int64 (missing
    intersections coalesce to 0 — a bucket-collision pair can share no
    shingle). Candidate-bounded throughout; the output is 17 rows at
    any corpus size."""
    sh = _shingles(spark, sf_dir)
    cand = _cand44(spark, sf_dir)
    # signature agreement IN-ROW: each doc's 16 minhashes ride as one
    # array and agree16 is a 16-element zip per candidate pair — the
    # long-form alternative (unpivot to (doc, j, minhash), join the
    # candidate relation at x16 cardinality twice, group back per
    # pair) re-shuffles 16 rows per candidate to compute what two
    # array columns already hold. Same exact counts (the oracle's
    # per-j CASE sum), three fewer exchanges.
    sig_arr = F.array(*[F.col(f"mh{j}") for j in range(16)])
    w = _wide16(spark, sf_dir)
    s0 = w.select(F.col("doc_id").alias("doc_id_0"), sig_arr.alias("__s0"))
    s1 = w.select(F.col("doc_id").alias("doc_id_1"), sig_arr.alias("__s1"))
    agree = (
        cand.join(s0, "doc_id_0")
        .join(s1, "doc_id_1")
        .select(
            "doc_id_0",
            "doc_id_1",
            F.expr(
                "aggregate(zip_with(__s0, __s1, (x, y) -> IF(x = y, 1L, 0L)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("agree16"),
        )
    )
    # exact side in array form (see _dedup_method_agreement): a
    # bucket-collision pair can share no shingle — array_intersect
    # yields inter = 0 for those naturally, matching the oracle's
    # coalesce(inter, 0)
    sharr = _sharr(spark, sf_dir).select(
        "doc_id", F.col("__arr").alias("arr"), F.col("sz").cast("long").alias("sz")
    )
    exact = (
        cand.join(
            sharr.select(
                F.col("doc_id").alias("doc_id_0"),
                F.col("arr").alias("a0"),
                F.col("sz").alias("sz0"),
            ),
            "doc_id_0",
        )
        .join(
            sharr.select(
                F.col("doc_id").alias("doc_id_1"),
                F.col("arr").alias("a1"),
                F.col("sz").alias("sz1"),
            ),
            "doc_id_1",
        )
        .withColumn("inter", F.size(F.array_intersect("a0", "a1")).cast("long"))
        .select(
            "doc_id_0",
            "doc_id_1",
            F.expr(
                "cast(inter * 1000000 div (sz0 + sz1 - inter) as long)"
            ).alias("exact_e6"),
        )
    )
    pairs = agree.join(exact, ["doc_id_0", "doc_id_1"]).select(
        "agree16",
        "exact_e6",
        F.expr("cast(agree16 * 1000000 div 16 as long)").alias("est_e6"),
    )
    return (
        pairs.groupBy(F.col("agree16").alias("est_sixteenths"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr("cast(sum(exact_e6) div count(1) as long)").alias(
                "mean_exact_e6"
            ),
            F.expr(
                "cast(sum(abs(est_e6 - exact_e6)) div count(1) as long)"
            ).alias("mean_abs_err_e6"),
        )
        .orderBy("est_sixteenths")
    )


# ------------------------------------------ dedup method agreement


@q(
    "dedup_method_agreement",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
       {_CAND_SQL},
       src AS (SELECT doc_id, source FROM documents),
       a_pairs AS (
         SELECT e.doc_id_0, e.doc_id_1, s0.source
         FROM exact e
         JOIN src s0 ON s0.doc_id = e.doc_id_0
         JOIN src s1 ON s1.doc_id = e.doc_id_1 AND s1.source = s0.source
         WHERE e.exact_e6 >= 500000),
       tok2 AS (
         SELECT doc_id, source, token,
                row_number() OVER (PARTITION BY doc_id ORDER BY pos ASC) AS p
         FROM (SELECT t.doc_id, s.source, t.token, t.pos
               FROM tok t JOIN src s ON s.doc_id = t.doc_id)),
       grams AS (
         SELECT DISTINCT doc_id, source,
                token || '|' || lead(token) OVER (
                  PARTITION BY doc_id ORDER BY p ASC) AS gram
         FROM tok2 QUALIFY gram IS NOT NULL),
       gsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
               FROM grams GROUP BY 1),
       guniv AS (
         SELECT a.doc_id AS doc_id_0, b.doc_id AS doc_id_1, a.source
         FROM (SELECT DISTINCT doc_id, source FROM grams) a
         JOIN (SELECT DISTINCT doc_id, source FROM grams) b
           ON a.source = b.source AND a.doc_id < b.doc_id),
       ginter AS (
         SELECT p.doc_id_0, p.doc_id_1, CAST(count(*) AS BIGINT) AS inter
         FROM guniv p
         JOIN grams g0 ON g0.doc_id = p.doc_id_0
         JOIN grams g1 ON g1.doc_id = p.doc_id_1 AND g1.gram = g0.gram
         GROUP BY 1, 2),
       b_pairs AS (
         SELECT p.doc_id_0, p.doc_id_1, p.source
         FROM guniv p
         JOIN ginter i ON i.doc_id_0 = p.doc_id_0 AND i.doc_id_1 = p.doc_id_1
         JOIN gsz z0 ON z0.doc_id = p.doc_id_0
         JOIN gsz z1 ON z1.doc_id = p.doc_id_1
         WHERE i.inter * 1000000 // (z0.sz + z1.sz - i.inter) >= 500000),
       u AS (SELECT doc_id_0, doc_id_1, source,
                    CAST(max(in_a) AS BIGINT) AS in_a,
                    CAST(max(in_b) AS BIGINT) AS in_b
             FROM (SELECT doc_id_0, doc_id_1, source, 1 AS in_a, 0 AS in_b
                   FROM a_pairs
                   UNION ALL
                   SELECT doc_id_0, doc_id_1, source, 0, 1 FROM b_pairs)
             GROUP BY 1, 2, 3)
       SELECT source,
              CAST(sum(in_a) AS BIGINT) AS n_minhash,
              CAST(sum(in_b) AS BIGINT) AS n_ngram,
              CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
              CAST(count(*) AS BIGINT) AS n_union,
              CAST(sum(in_a * in_b) * 1000000 // count(*) AS BIGINT)
                AS agreement_e6
       FROM u GROUP BY 1 ORDER BY source""",
)
def _dedup_method_agreement(spark, sf_dir):
    """Pair-set agreement between the engine's two word-level near-dup
    definitions, per source: (A) MinHash-LSH candidates verified by
    exact shingle Jaccard >= 0.5, restricted to same-source pairs, and
    (B) word-bigram Jaccard >= 0.5 with candidates from the exact
    prefix-filter join (dedup/ppjoin.py — no false negatives at any
    threshold), so side B is candidate-bounded instead of joining the
    full same-source pair universe. The report a dedup owner reads
    before swapping methods: where do they disagree, and does one
    dominate? Every membership is an exact e6-threshold decision; the
    union/intersection counts fold from one max-flag groupBy. The
    source lookups are plain shuffle joins — nothing
    documents-proportional is ever broadcast (the oracle keeps the
    quadratic guniv form; DuckDB verifies the same pair set)."""
    toks = _tokens(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    # shingles feed 4 branches (signatures, sizes, both verify sides) —
    # cache so the shingle hash runs once (llm_corpus_pipeline idiom)
    sh = _shingles(spark, sf_dir)
    cand = _cand44(spark, sf_dir)
    # exact verification in array form: per-doc shingle arrays joined
    # to the candidate pairs, |A∩B| = one int array_intersect per pair
    # (no exploded pair×shingle shuffle, no post-join groupBy)
    sharr = _sharr(spark, sf_dir).select(
        "doc_id", F.col("__arr").alias("arr"), F.col("sz").cast("long").alias("sz")
    )
    exact = (
        cand.join(
            sharr.select(
                F.col("doc_id").alias("doc_id_0"),
                F.col("arr").alias("a0"),
                F.col("sz").alias("sz0"),
            ),
            "doc_id_0",
        )
        .join(
            sharr.select(
                F.col("doc_id").alias("doc_id_1"),
                F.col("arr").alias("a1"),
                F.col("sz").alias("sz1"),
            ),
            "doc_id_1",
        )
        .withColumn("inter", F.size(F.array_intersect("a0", "a1")).cast("long"))
        .filter(F.expr("inter * 1000000 div (sz0 + sz1 - inter) >= 500000"))
        .select("doc_id_0", "doc_id_1")
    )
    a_pairs = (
        exact.join(
            src.select(F.col("doc_id").alias("doc_id_0"), F.col("source").alias("src0")),
            "doc_id_0",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_id_1"), F.col("source").alias("src1")),
            "doc_id_1",
        )
        .filter(F.col("src0") == F.col("src1"))
        .select("doc_id_0", "doc_id_1", F.col("src0").alias("source"))
    )
    # word-bigram side (the ngram_jaccard relation, exact e6): candidate
    # pairs come from the SOURCE-BLOCKED prefix-filter join — exact at
    # τ=0.5, integer threshold (inter·10 ≥ 5·union ⟺
    # inter·1e6 div union ≥ 5e5), with block equality composed into the
    # candidate join (the relation is same-source by definition, so
    # blocking is free exactness-wise and multiplies the candidate
    # reduction — critical when the bigram universe is small and
    # frequency pruning alone degenerates). Output is bit-identical to
    # the oracle's quadratic guniv form.
    from redshells_spark.dedup.ppjoin import pairs_from_rank_sorted

    # the shared blocked bigram index (_gram_index) feeds both this
    # query and ngram_jaccard; word_ngrams in the index is a narrow
    # array expression — per-doc distinct bigrams with NO window
    # shuffle and NO distinct shuffle (the gram separator differs from
    # the oracle's '|' but set identity is unaffected: tokens carry
    # neither glyph). collapse_identical stays OFF here: bigram sets
    # are large and nearly unique, so grouping costs more than it saves
    # (measured 3.3s plain vs 8.8s collapsed at sf0.1).
    bp = pairs_from_rank_sorted(
        _gram_index(spark, sf_dir),
        threshold_num=5,
        threshold_den=10,
    )
    b_pairs = bp.select(
        F.col("id_0").alias("doc_id_0"),
        F.col("id_1").alias("doc_id_1"),
        F.col("block").alias("source"),
    )
    u = (
        a_pairs.select(
            "doc_id_0", "doc_id_1", "source", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
        )
        .unionAll(
            b_pairs.select(
                "doc_id_0", "doc_id_1", "source", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("doc_id_0", "doc_id_1", "source")
        .agg(
            F.max("in_a").cast("long").alias("in_a"),
            F.max("in_b").cast("long").alias("in_b"),
        )
    )
    return (
        u.groupBy("source")
        .agg(
            F.sum("in_a").cast("long").alias("n_minhash"),
            F.sum("in_b").cast("long").alias("n_ngram"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
            F.count(F.lit(1)).cast("long").alias("n_union"),
            F.expr(
                "cast(sum(in_a * in_b) * 1000000 div count(1) as long)"
            ).alias("agreement_e6"),
        )
        .orderBy("source")
    )
