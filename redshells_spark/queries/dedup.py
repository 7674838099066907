"""Dedup tier: fingerprints, exact dedup, MinHash LSH, SimHash, n-gram Jaccard, components, decontamination, LLM corpus composites.

Split from the former single-file queries.py (round 4); registration
order within and across tier modules is preserved by the package
__init__ import order and pinned by tests/test_ann_recall.py.
"""

from redshells_spark.queries._shared import *  # noqa: F401,F403

# ------------------------------------------------------------ dedup ops

_SHINGLE_SQL = f"""
    ids AS (
        SELECT tok.doc_id, tok.pos, v.token_id
        FROM tok JOIN vocab v ON tok.token = v.token),
    shingles AS (
        SELECT DISTINCT doc_id,
               (token_id * 1000003 + lead(token_id) OVER (PARTITION BY doc_id ORDER BY pos ASC)) % 2147483647 AS shingle
        FROM ids
        QUALIFY shingle IS NOT NULL),
    params AS (
        SELECT CAST(jj AS INTEGER) AS j,
               (jj * 2654435761 + 1) % 2147483647 AS a,
               (jj * 40503 + 17) % 2147483647 AS b
        FROM (SELECT unnest(generate_series(0, 15)) AS jj)),
    sigs AS (
        SELECT doc_id, j, min((a * shingle + b) % 2147483647) AS minhash
        FROM shingles CROSS JOIN params
        GROUP BY doc_id, j)
"""


@q(
    "minhash_signatures",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL}
       SELECT doc_id, CAST(j AS BIGINT) AS j, minhash FROM sigs""",
)
def _minhash_signatures(spark, sf_dir):
    from redshells_spark.dedup.minhash import minhash_signatures_from_wide

    sig = minhash_signatures_from_wide(_wide16(spark, sf_dir).drop("sz"), 16)
    return sig.select("doc_id", F.col("j").cast("long").alias("j"), "minhash")


@q(
    "minhash_near_dedup",
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
         SELECT c.doc_id_0, c.doc_id_1, count(*) AS inter
         FROM cand c
         JOIN shingles s0 ON s0.doc_id = c.doc_id_0
         JOIN shingles s1 ON s1.doc_id = c.doc_id_1 AND s1.shingle = s0.shingle
         GROUP BY c.doc_id_0, c.doc_id_1)
       SELECT i.doc_id_0, i.doc_id_1,
              round(i.inter * 1.0 / (z0.sz + z1.sz - i.inter), 4) AS jaccard
       FROM inter i
       JOIN sz z0 ON z0.doc_id = i.doc_id_0
       JOIN sz z1 ON z1.doc_id = i.doc_id_1
       WHERE i.inter * 1.0 / (z0.sz + z1.sz - i.inter) >= 0.1""",
)
def _minhash_near_dedup(spark, sf_dir):
    out = _vpairs01(spark, sf_dir)
    return out.select("doc_id_0", "doc_id_1", _r4(F.col("jaccard"), "jaccard"))


@q(
    "near_dup_components",
    f"""WITH RECURSIVE {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
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
         SELECT c.doc_id_0, c.doc_id_1, count(*) AS inter
         FROM cand c
         JOIN shingles s0 ON s0.doc_id = c.doc_id_0
         JOIN shingles s1 ON s1.doc_id = c.doc_id_1 AND s1.shingle = s0.shingle
         GROUP BY c.doc_id_0, c.doc_id_1),
       pairs AS (
         SELECT i.doc_id_0, i.doc_id_1
         FROM inter i
         JOIN sz z0 ON z0.doc_id = i.doc_id_0
         JOIN sz z1 ON z1.doc_id = i.doc_id_1
         WHERE i.inter * 1.0 / (z0.sz + z1.sz - i.inter) >= 0.1),
       edges AS (
         SELECT doc_id_0 AS src, doc_id_1 AS dst FROM pairs
         UNION ALL SELECT doc_id_1, doc_id_0 FROM pairs),
       reach(id, r) AS (
         SELECT DISTINCT src, src FROM edges
         UNION
         SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
       SELECT id AS doc_id, min(r) AS keep_id FROM reach GROUP BY id""",
)
def _near_dup_components(spark, sf_dir):
    """Drop policy over the near-dup graph: every doc labeled with its
    connected component's min id (dedup/minhash.py
    connected_components_dedup — hash-min + pointer doubling,
    checkpointed). Oracle: recursive-CTE transitive closure over the
    SAME pair set DuckDB already value-matches."""
    return _nd_components(spark, sf_dir)


@q(
    "incremental_near_dedup",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
       corpus_banded AS (
         SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
                md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j ASC)) AS bucket
         FROM sigs WHERE doc_id < 250 AND CAST(j // 4 AS INTEGER) < 4
         GROUP BY doc_id, CAST(j // 4 AS INTEGER)),
       new_banded AS (
         SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
                md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j ASC)) AS bucket
         FROM sigs WHERE doc_id >= 250 AND CAST(j // 4 AS INTEGER) < 4
         GROUP BY doc_id, CAST(j // 4 AS INTEGER)),
       cand AS (
         SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
         FROM new_banded n JOIN corpus_banded c
           ON n.band = c.band AND n.bucket = c.bucket),
       est AS (
         SELECT cd.new_doc_id, cd.corpus_doc_id,
                avg(CASE WHEN sn.minhash = sc.minhash THEN 1.0 ELSE 0.0 END) AS est_jaccard
         FROM cand cd
         JOIN sigs sn ON sn.doc_id = cd.new_doc_id
         JOIN sigs sc ON sc.doc_id = cd.corpus_doc_id AND sc.j = sn.j
         GROUP BY cd.new_doc_id, cd.corpus_doc_id)
       SELECT new_doc_id, corpus_doc_id, round(est_jaccard, 4) AS est_jaccard
       FROM est WHERE est_jaccard >= 0.1""",
)
def _incremental_near_dedup(spark, sf_dir):
    """Delta-ingestion near-dedup (dedup/minhash.py
    minhash_dedup_against_index): docs ≥ 250 are the nightly batch,
    docs < 250 the indexed corpus; candidates via band-bucket
    equi-join against the index, scored by the signature-agreement
    Jaccard estimator — corpus text never re-read."""
    from redshells_spark.dedup.minhash import (
        minhash_band_index,
        minhash_dedup_against_index,
    )

    # the shared wide relation is per-doc, so doc-subset filters of it
    # are bit-identical to recomputing signatures on the subset
    wide = _wide16(spark, sf_dir).drop("sz")
    corpus_wide = wide.filter(F.col("doc_id") < 250)
    new_wide = wide.filter(F.col("doc_id") >= 250)
    index = minhash_band_index(corpus_wide, bands=4, rows_per_band=4)
    out = minhash_dedup_against_index(
        new_wide, index, corpus_wide, threshold=0.1, max_bucket_size=1_000_000
    )
    return out.select(
        "new_doc_id", "corpus_doc_id", _r4(F.col("est_jaccard"), "est_jaccard")
    )


@q(
    "decontaminate",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL},
       ids AS (
         SELECT tok.doc_id, tok.pos, v.token_id
         FROM tok JOIN vocab v ON tok.token = v.token),
       shingles AS (
         SELECT DISTINCT doc_id,
                ((token_id * 1000003 + lead(token_id, 1) OVER (PARTITION BY doc_id ORDER BY pos ASC)) % 2147483647
                  * 1000003 + lead(token_id, 2) OVER (PARTITION BY doc_id ORDER BY pos ASC)) % 2147483647 AS shingle
         FROM ids
         QUALIFY shingle IS NOT NULL),
       bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 50 = 0),
       contaminated AS (
         SELECT DISTINCT s.doc_id FROM shingles s JOIN bench b ON s.shingle = b.shingle
         WHERE s.doc_id % 50 <> 0)
       SELECT d.doc_id, d.lang, d.source FROM documents d
       WHERE d.doc_id % 50 <> 0
         AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)""",
)
def _decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appx C / Dolma-style): docs with
    doc_id % 50 == 0 play the eval benchmark; corpus docs sharing any
    token-id 3-gram shingle with it are dropped (dedup/decontaminate.py,
    broadcast semi-join — the corpus never shuffles)."""
    from redshells_spark.dedup.decontaminate import decontaminate
    from redshells_spark.dedup.minhash import doc_shingles

    docs = _t(spark, sf_dir, "documents")
    sh = doc_shingles(_tokens(spark, sf_dir), _vocab(spark, sf_dir), shingle_len=3)
    is_bench = F.col("doc_id") % 50 == 0
    corpus = docs.filter(~is_bench)
    kept = decontaminate(
        corpus, sh.filter(~is_bench), sh.filter(is_bench)
    )
    return kept.select("doc_id", "lang", "source")


@q(
    "duplicate_spans",
    f"""WITH {_VOCAB_SQL}, {_TOK_SQL},
       ids AS (
         SELECT tok.doc_id, tok.pos, v.token_id
         FROM tok JOIN vocab v ON tok.token = v.token),
       shingles AS (
         SELECT DISTINCT doc_id,
                (token_id * 1000003 + lead(token_id) OVER (PARTITION BY doc_id ORDER BY pos ASC)) % 2147483647 AS shingle
         FROM ids
         QUALIFY shingle IS NOT NULL),
       freq AS (SELECT shingle, count(*) AS n_docs FROM shingles GROUP BY shingle)
       SELECT s.doc_id,
              round(avg(CASE WHEN f.n_docs > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_fraction
       FROM shingles s JOIN freq f ON s.shingle = f.shingle
       GROUP BY s.doc_id""",
)
def _duplicate_spans(spark, sf_dir):
    """Per-doc duplicated-span fraction (Lee et al. 2021): share of a
    doc's distinct shingles that occur in >1 document
    (dedup/decontaminate.py:duplicate_span_fraction)."""
    from redshells_spark.dedup.decontaminate import duplicate_span_fraction

    sh = _shingles(spark, sf_dir)
    return duplicate_span_fraction(sh)


@q(
    "stratified_sample",
    """SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                row_number() OVER (
                  PARTITION BY lang
                  ORDER BY md5('7|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                ) AS rn
         FROM documents)
       WHERE rn <= 40""",
)
def _stratified_sample(spark, sf_dir):
    """Exact per-language quota sampling with the portable md5 order
    (data/sampling.py:stratified_sample_exact — per-group counterpart
    of the reference's shuffle+head SampleData)."""
    from redshells_spark.data.sampling import stratified_sample_exact

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample_exact(docs, "lang", 40, "doc_id", seed=7)
    return out.select("doc_id", "lang")


@q(
    "domain_mix_weights",
    """WITH counts AS (
         SELECT source, count(*) AS n_rows FROM documents GROUP BY source),
       tot AS (SELECT sum(n_rows) AS total, count(*) AS n_groups FROM counts),
       ratios AS (
         SELECT source, n_rows,
                (1.0 / n_groups) / (n_rows * 1.0 / total) AS ratio
         FROM counts, tot)
       SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
              round(ratio / (SELECT max(ratio) FROM ratios), 4) AS sample_prob
       FROM ratios""",
)
def _domain_mix_weights(spark, sf_dir):
    """Per-source downsampling probabilities toward a uniform domain
    mix (data/sampling.py:domain_mix_weights) — Pile/DoReMi-style
    static corpus reweighting, no upsampling."""
    from redshells_spark.data.sampling import domain_mix_weights

    docs = _t(spark, sf_dir, "documents")
    out = domain_mix_weights(docs, "source")
    return out.select("source", F.col("n_rows").cast("long").alias("n_rows"), "sample_prob")


@q(
    "pack_sequences",
    """WITH tc AS (
         SELECT doc_id, source,
                CAST(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS BIGINT) AS n_tokens
         FROM documents)
       SELECT doc_id, source, n_tokens,
              CAST(floor((SUM(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens) / 2000.0) AS BIGINT) AS chunk_id
       FROM tc""",
)
def _pack_sequences(spark, sf_dir):
    """Token-budget sequence packing per source shard
    (text/packing.py:pack_sequences): chunk = floor(tokens_before /
    budget) via one window cumsum — the streaming first-fit packers
    use, sharded so no global order exists."""
    from redshells_spark.text.packing import pack_sequences

    toks = _tokens(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    tc = toks.select("doc_id", F.size("tokens").cast("long").alias("n_tokens")).join(
        docs, on="doc_id"
    )
    out = pack_sequences(tc, budget=2000, partition_column="source")
    return out.select("doc_id", "source", "n_tokens", "chunk_id")


_LANG_HITS_SQL = ", ".join(
    f"len(list_filter(list_filter(string_split(lower(text), ' '), t -> t <> ''), t -> t IN {lst})) AS hits_{lang}"
    for lang, lst in {
        "de": "('der','die','das','und','ist','nicht','mit','ein','zu','den')",
        "en": "('the','and','of','to','in','is','that','with','for','it')",
        "es": "('el','los','las','es','no','una','por','con','para','del')",
        "fr": "('le','la','les','et','est','pas','des','une','dans','que')",
    }.items()
)


@q(
    "llm_corpus_pipeline",
    f"""WITH RECURSIVE {_VOCAB_SQL}, {_TOK_SQL}, {_SHINGLE_SQL},
       banded AS (
         SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
                md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j ASC)) AS bucket
         FROM sigs WHERE CAST(j // 4 AS INTEGER) < 4
         GROUP BY doc_id, CAST(j // 4 AS INTEGER)),
       sized AS (
         SELECT * FROM (
           SELECT band, bucket, doc_id,
                  count(*) OVER (PARTITION BY band, bucket) AS bsz
           FROM banded) WHERE bsz <= 1000),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_id_0, b.doc_id AS doc_id_1
         FROM sized a JOIN sized b ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id < b.doc_id),
       zz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT c.doc_id_0, c.doc_id_1, count(*) AS inter
         FROM cand c
         JOIN shingles s0 ON s0.doc_id = c.doc_id_0
         JOIN shingles s1 ON s1.doc_id = c.doc_id_1 AND s1.shingle = s0.shingle
         GROUP BY c.doc_id_0, c.doc_id_1),
       pairs AS (
         SELECT i.doc_id_0, i.doc_id_1 FROM inter i
         JOIN zz z0 ON z0.doc_id = i.doc_id_0
         JOIN zz z1 ON z1.doc_id = i.doc_id_1
         WHERE i.inter * 1.0 / (z0.sz + z1.sz - i.inter) >= 0.1),
       edges AS (
         SELECT doc_id_0 AS src, doc_id_1 AS dst FROM pairs
         UNION ALL SELECT doc_id_1, doc_id_0 FROM pairs),
       reach(id, r) AS (
         SELECT DISTINCT src, src FROM edges
         UNION
         SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
       comp AS (SELECT id AS doc_id, min(r) AS keep_id FROM reach GROUP BY id),
       lang AS (
         SELECT doc_id, CASE
             WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
             WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
             WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
             WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
         FROM (SELECT doc_id, {_LANG_HITS_SQL} FROM documents) h),
       qual AS (
         SELECT doc_id, CAST(round(
             (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN stop_hits / greatest(n_tokens, 1) >= 0.05 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN punct / greatest(n_chars, 1) <= 0.3 THEN 0.3 ELSE 0.0 END), 4) AS DOUBLE) AS quality,
             CAST(n_tokens AS BIGINT) AS n_tokens
         FROM (SELECT doc_id, length(text) AS n_chars,
                 CAST(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the','and','of','to','in','is','that','with','for','it'))) AS BIGINT) AS stop_hits,
                 length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct
               FROM documents) b),
       survivors AS (
         SELECT d.doc_id, l.lang_pred, q.quality, q.n_tokens, md5(d.text) AS fp
         FROM documents d
         JOIN lang l ON l.doc_id = d.doc_id AND l.lang_pred = 'en'
         JOIN qual q ON q.doc_id = d.doc_id AND q.quality >= 0.7),
       exact_kept AS (
         SELECT * FROM (
           SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep
           FROM survivors) WHERE doc_id = keep)
       SELECT e.doc_id, e.lang_pred, e.quality, e.n_tokens
       FROM exact_kept e
       LEFT JOIN comp c ON c.doc_id = e.doc_id
       WHERE c.doc_id IS NULL OR c.keep_id = e.doc_id""",
)
def _llm_corpus_pipeline(spark, sf_dir):
    """End-to-end corpus cleaning, the composite a 100 TB training-data
    pipeline runs nightly: language filter → quality filter → exact
    dedup (md5 keep-first) → near-dup drop (MinHash LSH components,
    non-canonical members removed). Every stage is the already-
    oracle-verified operator; this query value-checks their
    composition."""
    docs = _t(spark, sf_dir, "documents")
    lang = detect_language(docs).select("doc_id", "lang_pred")
    qual = quality_score(docs).select(
        "doc_id", F.col("quality"), F.col("n_tokens").cast("long").alias("n_tokens")
    )
    survivors = (
        docs.select("doc_id", "text")
        .join(lang.filter(F.col("lang_pred") == "en"), on="doc_id")
        .join(qual.filter(F.col("quality") >= 0.7), on="doc_id")
        .withColumn("fp", F.md5("text"))
    )
    w = Window.partitionBy("fp")
    exact_kept = (
        survivors.withColumn("keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep"))
        .drop("keep", "fp", "text")
    )
    # near-dup components over the full corpus (same graph the
    # near_dup_components query verifies); drop non-canonical members.
    # The production bucket-size guard (1000) is ON and mirrored by the
    # oracle's `sized` CTE — the unguarded variant went output-quadratic
    # on the factor-10 probe (25x wall; dense synthetic near-dup graph).
    comp = _nd_components(spark, sf_dir)
    non_canonical = comp.filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    return exact_kept.join(non_canonical, on="doc_id", how="left_anti").select(
        "doc_id", "lang_pred", _r4(F.col("quality"), "quality"), "n_tokens"
    )


@q(
    "ngram_jaccard",
    """WITH tok AS (
         SELECT doc_id, source, unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
         FROM (SELECT doc_id, source, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
               FROM documents)),
       grams AS (
         SELECT DISTINCT doc_id, source,
                token || '␟' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos ASC) AS gram
         FROM tok QUALIFY gram IS NOT NULL),
       sz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
       pairs AS (
         SELECT DISTINCT a.doc_id AS doc_id_0, b.doc_id AS doc_id_1
         FROM (SELECT DISTINCT doc_id, source FROM grams) a
         JOIN (SELECT DISTINCT doc_id, source FROM grams) b
           ON a.source = b.source AND a.doc_id < b.doc_id),
       inter AS (
         SELECT p.doc_id_0, p.doc_id_1, count(*) AS inter
         FROM pairs p
         JOIN grams g0 ON g0.doc_id = p.doc_id_0
         JOIN grams g1 ON g1.doc_id = p.doc_id_1 AND g1.gram = g0.gram
         GROUP BY p.doc_id_0, p.doc_id_1)
       SELECT i.doc_id_0, i.doc_id_1,
              round(i.inter * 1.0 / (z0.sz + z1.sz - i.inter), 4) AS jaccard
       FROM inter i JOIN sz z0 ON z0.doc_id = i.doc_id_0
       JOIN sz z1 ON z1.doc_id = i.doc_id_1
       WHERE i.inter * 1.0 / (z0.sz + z1.sz - i.inter) >= 0.1""",
)
def _ngram_jaccard(spark, sf_dir):
    """Candidate pairs come from the SOURCE-BLOCKED exact prefix-filter
    join (dedup/ppjoin.py) at τ=1/10 — the prefix filter is exact at
    ANY threshold (only the prefix gets longer as τ drops), and the
    relation is same-source by definition so block equality composes
    into the candidate join for free: pairs are generated only where a
    prefix bigram is shared WITHIN a source, never |D|²/source and
    never the global shared-element fan-out. The output pair set is
    identical to the oracle's quadratic same-source universe. Threshold
    is the integer form inter·10 ≥ union ⟺ inter/union ≥ 0.1 exactly."""
    from redshells_spark.dedup.ppjoin import pairs_from_rank_sorted

    bp = pairs_from_rank_sorted(
        _gram_index(spark, sf_dir),
        threshold_num=1,
        threshold_den=10,
    )
    return bp.select(
        F.col("id_0").alias("doc_id_0"),
        F.col("id_1").alias("doc_id_1"),
        _r4(F.col("inter") / F.col("union_sz"), "jaccard"),
    )


# SimHash oracle: DuckDB recomputes the 60-bit portable signatures
# digit-by-digit from md5 hex (engine-independent), then mirrors the
# block-permutation candidate join and Hamming filter. All generated
# SQL below is pure int64 arithmetic — no engine hash involved.
_SIMHASH_HEX2INT = " + ".join(
    f"(instr('0123456789abcdef', substr(h16, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)
_SIMHASH_BITSUMS = ",\n                ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS b{b}"
    for b in range(60)
)
_SIMHASH_PACK = " | ".join(
    f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
    for b in range(60)
)


@q(
    "simhash_near_dup",
    f"""WITH {_TOK_SQL},
       tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM tok GROUP BY doc_id, token),
       h AS (SELECT doc_id, tf, ({_SIMHASH_HEX2INT}) AS h
             FROM (SELECT doc_id, tf, md5(token) AS h16 FROM tf)),
       bs AS (SELECT doc_id, {_SIMHASH_BITSUMS}
              FROM h GROUP BY doc_id),
       sig AS (SELECT doc_id, ({_SIMHASH_PACK}) AS simhash FROM bs),
       blk AS (SELECT doc_id, simhash, i AS block_idx,
                      (simhash >> (i * 6)) & 63 AS block_val
               FROM sig, (SELECT unnest(range(9)) AS i)),
       cand AS (SELECT DISTINCT l.doc_id AS doc_id_0, r.doc_id AS doc_id_1,
                       l.simhash AS sh0, r.simhash AS sh1
                FROM blk l JOIN blk r
                  ON l.block_idx = r.block_idx AND l.block_val = r.block_val
                 AND l.doc_id < r.doc_id)
       SELECT doc_id_0, doc_id_1, bit_count(xor(sh0, sh1))::BIGINT AS hamming
       FROM cand WHERE bit_count(xor(sh0, sh1)) <= 8""",
)
def _simhash_near_dup(spark, sf_dir):
    """Portable-hash simhash (md5-hex-derived 60-bit) so the full
    signature→candidates→Hamming pipeline is oracle-checkable; the
    xxhash64 default stays the engine hot path (same plan shape)."""
    sig = simhash_signatures(_tokens(spark, sf_dir), portable=True)
    out = simhash_near_dup_pairs(sig, max_hamming=8, bits=60)
    return out.select(
        "doc_id_0", "doc_id_1", F.col("hamming").cast("long").alias("hamming")
    )




@q(
    "cross_doc_line_dedup",
    """WITH t AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '') AS toks
                  FROM documents),
       b AS (SELECT doc_id, CAST(bi AS BIGINT) AS pos,
                    array_to_string(toks[bi * 8 + 1 : bi * 8 + 8], ' ') AS unit
             FROM (SELECT doc_id, toks, unnest(range(0, (len(toks) + 7) // 8)) AS bi
                   FROM t WHERE len(toks) > 0)),
       j AS (SELECT doc_id, pos, unit,
                    count(*) OVER (PARTITION BY md5(unit)) AS cnt,
                    row_number() OVER (PARTITION BY md5(unit)
                                       ORDER BY doc_id ASC, pos ASC) AS rn
             FROM b),
       k AS (SELECT doc_id, pos, unit, (cnt < 2 OR rn = 1) AS keep FROM j)
       SELECT doc_id, count(*)::BIGINT AS n_units,
              sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
              coalesce(string_agg(CASE WHEN keep THEN unit END, ' '
                                  ORDER BY pos ASC), '') AS text
       FROM k GROUP BY doc_id""",
)
def _cross_doc_line_dedup(spark, sf_dir):
    """CCNet paragraph dedup (dedup/lines.py, Wenzek et al. 2020):
    hash every unit corpus-wide, keep only the globally-first
    occurrence of any repeated unit, reconstruct documents. ONE
    map-combined groupBy on the 32-byte unit hash + an equi-join back
    (groupBy+join, not a hash-partition window: a boilerplate unit in
    billions of docs stays a combinable aggregate row — skew-safe).
    The synthetic corpus has no newline structure, so units are
    non-overlapping 8-token blocks (block_units); real corpora use
    split_units('\\n')."""
    from redshells_spark.dedup.lines import block_units, cross_doc_unit_dedup

    docs = _t(spark, sf_dir, "documents")
    units = block_units(docs, block_tokens=8)
    return cross_doc_unit_dedup(units, min_occurrences=2)


@q(
    "source_overlap_matrix",
    """WITH fp AS (
         SELECT DISTINCT source,
                md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint
         FROM documents),
       sz AS (SELECT source, count(*) AS n FROM fp GROUP BY 1),
       sh AS (SELECT a.source AS source_a, b.source AS source_b,
                     count(*) AS n_shared
              FROM fp a JOIN fp b
                ON a.fingerprint = b.fingerprint AND a.source < b.source
              GROUP BY 1, 2),
       pairs AS (SELECT sa.source AS source_a, sa.n AS n_a,
                        sb.source AS source_b, sb.n AS n_b
                 FROM sz sa, sz sb WHERE sa.source < sb.source)
       SELECT p.source_a, p.source_b,
              CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
              CAST(p.n_a AS BIGINT) AS n_a,
              CAST(p.n_b AS BIGINT) AS n_b,
              CAST(coalesce(sh.n_shared, 0) AS DOUBLE)
                / (p.n_a + p.n_b - coalesce(sh.n_shared, 0)) AS jaccard
       FROM pairs p
       LEFT JOIN sh ON sh.source_a = p.source_a AND sh.source_b = p.source_b""",
)
def _source_overlap_matrix(spark, sf_dir):
    """Cross-source exact-duplicate leakage matrix (dedup/exact.py
    cross_source_overlap): which corpus sources copy from each other,
    on normalized-text fingerprints. The self-join runs on DISTINCT
    (source, 32-byte hash) rows so fan-out is bounded by the source
    count per hash, never corpus size; the full pair matrix is
    emitted (zero rows included) and the jaccard is one
    identical-operand IEEE division — full-precision export."""
    from redshells_spark.dedup.exact import cross_source_overlap

    docs = _t(spark, sf_dir, "documents")
    return cross_source_overlap(docs)
