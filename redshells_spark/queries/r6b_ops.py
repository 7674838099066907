"""Round-6 session-2 additions: PSI drift, a portable HyperLogLog
(registers + max-merge + estimate, all oracle-reproducible), blocked
fuzzy name matching, prefix-cache hit-rate planning, and the vocabulary
coverage curve.

Each entry follows the registry's determinism discipline: exact int64
sufficient statistics, single fixed IEEE expressions for the few
floats, total-order tie-breaks on every window.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.operators.sketches import (  # noqa: E402
    _bitlen_case_sql,
    hll_alpha,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from redshells_spark.queries.text import _duck_h60  # noqa: E402
from redshells_spark.timeutil import event_us  # noqa: E402

# ----------------------------------------------------------------- PSI drift

_PSI_BITS = 24  # value*100 fits well under 2^24; bucket = bit length


@q(
    "psi_value_drift",
    f"""WITH e AS (
         SELECT event_type,
                greatest(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT), 0) AS u,
                epoch_us(ts) AS us
         FROM events),
       mm AS (SELECT min(us) + max(us) AS mm FROM e),
       bk AS (
         SELECT event_type,
                {_bitlen_case_sql('u', _PSI_BITS)} AS bucket,
                CASE WHEN us * 2 < mm.mm THEN 1 ELSE 0 END AS is1
         FROM e, mm),
       pv AS (SELECT event_type, bucket,
                     CAST(sum(is1) AS BIGINT) AS c1,
                     CAST(sum(1 - is1) AS BIGINT) AS c2
              FROM bk GROUP BY 1, 2),
       g AS (SELECT event_type,
                    CAST(sum(c1) AS BIGINT) AS n1,
                    CAST(sum(c2) AS BIGINT) AS n2,
                    CAST(count(*) AS BIGINT) AS nb
             FROM pv GROUP BY 1),
       t AS (
         SELECT p.event_type,
                ((p.c1 + CAST(0.5 AS DOUBLE)) / (CAST(g.n1 AS DOUBLE) + CAST(0.5 AS DOUBLE) * g.nb)
                 - (p.c2 + CAST(0.5 AS DOUBLE)) / (CAST(g.n2 AS DOUBLE) + CAST(0.5 AS DOUBLE) * g.nb))
                * ln(((p.c1 + CAST(0.5 AS DOUBLE)) / (CAST(g.n1 AS DOUBLE) + CAST(0.5 AS DOUBLE) * g.nb))
                     / ((p.c2 + CAST(0.5 AS DOUBLE)) / (CAST(g.n2 AS DOUBLE) + CAST(0.5 AS DOUBLE) * g.nb)))
                  AS term
         FROM pv p JOIN g USING (event_type))
       SELECT g.event_type, g.n1 AS n1, g.n2 AS n2, g.nb AS n_buckets,
              round(sum(t.term), 6) AS psi
       FROM t JOIN g USING (event_type)
       GROUP BY g.event_type, g.n1, g.n2, g.nb""",
)
def _psi_value_drift(spark, sf_dir):
    """Population Stability Index of each event type's value
    distribution between the first and second half of the observation
    window (operators/drift.py:psi_drift) — the model-monitoring
    standard next to the KS test (PSI > 0.25 = action). The time split
    is the exact integer comparison us*2 < min+max (no division), the
    binning is the integer log2 bucket of the cent units (a comparison
    chain, no float log), and the per-bucket KL terms are one fixed
    IEEE expression over exact counts, summed over a ≤24-row relation
    per group and rounded after (the hill/ppl float discipline).
    Counts fold additively, so the bucket relation is also the
    mergeable streaming state, mirroring ks_value_counts."""
    from redshells_spark.operators.drift import psi_drift

    ev = _t(spark, sf_dir, "events")
    b = ev.select("event_type", "value", event_us(ev).alias("__us"))
    mm = b.agg((F.min("__us") + F.max("__us")).alias("__mm"))
    flagged = b.crossJoin(F.broadcast(mm)).select(
        "event_type",
        "value",
        (F.col("__us") * 2 < F.col("__mm")).cast("long").alias("is_early"),
    )
    return psi_drift(
        flagged, "value", "is_early", ["event_type"], scale=100, max_bits=_PSI_BITS
    )


# -------------------------------------------------------- portable HLL

_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_S = (60 - _HLL_P) + 1  # 53: scaled-denominator exponent
_HLL_NUM = hll_alpha(_HLL_M) * _HLL_M * _HLL_M * float(1 << _HLL_S)


def _duck_hll_regs(key_sql: str, group_sql: str, table: str) -> str:
    h = _duck_h60(key_sql)
    rank = f"({_HLL_S} - {_bitlen_case_sql(f'(({h}) // {_HLL_M})', 60 - _HLL_P)})"
    return f"""h AS (SELECT {group_sql} AS grp, ({h}) % {_HLL_M} AS reg,
                      {rank} AS rk
               FROM {table}),
       r0 AS (SELECT grp, reg, CAST(max(rk) AS BIGINT) AS m_j
              FROM h GROUP BY 1, 2),
       r AS (SELECT * FROM r0
             UNION ALL
             SELECT '__all__' AS grp, reg, CAST(max(m_j) AS BIGINT) AS m_j
             FROM r0 GROUP BY reg)"""


@q(
    "hll_distinct_sketch",
    f"""WITH {_duck_hll_regs("user_id", "event_type", "events")},
       agg AS (
         SELECT grp,
                CAST({_HLL_M} - count(*) AS BIGINT) AS v_zeros,
                CAST(({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << {_HLL_S})
                     + CAST(sum(CAST(1 AS BIGINT) << ({_HLL_S} - m_j)) AS BIGINT) AS BIGINT)
                    AS z_scaled
         FROM r GROUP BY grp),
       ex AS (SELECT event_type AS grp, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM events GROUP BY 1
              UNION ALL
              SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
       SELECT agg.grp AS event_type, ex.n_exact, agg.v_zeros, agg.z_scaled,
              round(CASE WHEN ({_HLL_NUM!r} / CAST(agg.z_scaled AS DOUBLE)) <= {2.5 * _HLL_M!r}
                          AND agg.v_zeros > 0
                         THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / CAST(agg.v_zeros AS DOUBLE))
                         ELSE {_HLL_NUM!r} / CAST(agg.z_scaled AS DOUBLE) END, 4) AS hll_est
       FROM agg JOIN ex ON ex.grp = agg.grp""",
)
def _hll_distinct_sketch(spark, sf_dir):
    """Portable HyperLogLog distinct-user sketch per event type PLUS
    the '__all__' row built by REGISTER-WISE MAX MERGE of the per-type
    sketches (operators/sketches.py:hll_registers/hll_merge/
    hll_estimate) — the few-hundred-byte mergeable state that makes
    HLL the 100-TB distinct-count structure (Flajolet et al. 2007).
    The engine-private `F.approx_count_distinct` stays the API default;
    this md5-register variant is the one an oracle can reproduce
    bit-for-bit: the harmonic denominator is kept as the exact int64
    Σ2^(S−M_j), and the only floats are one division and the
    small-range m·ln(m/V) branch. Exact counts ride along to show the
    error."""
    ev = _t(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id", p=_HLL_P)
    merged = hll_merge(
        regs.select(F.lit("__all__").alias("event_type"), "reg", "m_j"),
        ["event_type"],
    )
    est = hll_estimate(regs.unionByName(merged), ["event_type"], p=_HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    exact_all = ev.agg(
        F.lit("__all__").alias("event_type"),
        F.countDistinct("user_id").cast("long").alias("n_exact"),
    )
    return est.join(
        F.broadcast(exact.unionByName(exact_all)), "event_type"
    ).select(
        "event_type",
        "n_exact",
        "v_zeros",
        "z_scaled",
        _r4(F.col("hll_est"), "hll_est"),
    )


# ------------------------------------------------------- fuzzy name match


@q(
    "fuzzy_name_match",
    """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
       b AS (SELECT name, string_split(name, ' ')[2] AS block
             FROM names)
       SELECT x.block AS block, x.name AS name_a, y.name AS name_b,
              CAST(levenshtein(x.name, y.name) AS BIGINT) AS lev
       FROM b x JOIN b y ON x.block = y.block AND x.name < y.name
       WHERE levenshtein(x.name, y.name) <= 3""",
)
def _fuzzy_name_match(spark, sf_dir):
    """Blocked fuzzy matching over part names (operators/fuzzy.py):
    dedupe to DISTINCT names first (the step that keeps a billion-row
    corpus's pairwise work on its million distinct strings), block on
    the SECOND name token, then JVM-codegen `levenshtein` ≤ 3
    inside blocks only — the Fellegi-Sunter blocking shape. The
    block-partitioned self-join shuffles on the blocking key, so cost
    is Σ block², never corpus²."""
    from redshells_spark.operators.fuzzy import fuzzy_blocked_matches

    part = _t(spark, sf_dir, "part")
    return fuzzy_blocked_matches(
        part,
        "p_name",
        "element_at(split(name, ' '), 2)",
        max_distance=3,
    )


# -------------------------------------------------- prefix-cache planning


@q(
    "prefix_cache_sharing",
    """WITH tok AS (
         SELECT doc_id, source,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
         FROM documents),
       lg AS (SELECT source, t,
                     lag(t) OVER (PARTITION BY source
                                  ORDER BY t ASC, doc_id ASC) AS p
              FROM tok),
       sc AS (
         SELECT source, len(t) AS n_tok,
                CASE WHEN p IS NULL OR least(len(t), len(p)) = 0 THEN 0
                     ELSE coalesce(
                       list_min(list_transform(range(1, least(len(t), len(p)) + 1),
                                i -> CASE WHEN t[i] <> p[i] THEN i ELSE NULL END)) - 1,
                       least(len(t), len(p))) END AS lcp
         FROM lg)
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(sum(lcp) AS BIGINT) AS shared_prefix_tokens,
              CAST(CAST(sum(lcp) AS BIGINT) * 10000 // CAST(sum(n_tok) AS BIGINT) AS BIGINT)
                  AS hit_rate_e4
       FROM sc GROUP BY source""",
)
def _prefix_cache_sharing(spark, sf_dir):
    """Prefix-cache hit-rate planning for a prompt corpus
    (text/prefix.py): sorting each source's prompts makes every shared
    prefix adjacent, so Σ LCP(tokens_i, tokens_{i−1}) is exactly the
    token count a radix-tree KV-cache (vLLM automatic prefix caching,
    SGLang RadixAttention) would serve from memory on a cold replay.
    One window per source — the shuffle a sort-dedup already pays —
    and the LCP is a first-mismatch array-min, pure codegen. Token
    arrays order identically in both engines (elementwise, shorter-
    is-less), and the hit rate is exact fixed-point e4."""
    from redshells_spark.text.prefix import prefix_cache_stats

    toks = _tokens(spark, sf_dir)
    return prefix_cache_stats(toks, "source", "doc_id", "tokens")


# ------------------------------------------------- vocabulary coverage

_COVERAGE_RANKS = (1, 2, 5, 10, 20, 50, 100)


@q(
    "vocab_coverage_curve",
    f"""WITH {_TOK_SQL},
       cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
       rk AS (SELECT token, c,
                     row_number() OVER (ORDER BY c DESC, token ASC) AS rn
              FROM cnt),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS nv
               FROM rk),
       pts AS (SELECT unnest([{", ".join(str(r) for r in _COVERAGE_RANKS)}]) AS r)
       SELECT CAST(p.r AS BIGINT) AS vocab_rank,
              CAST(least(p.r, max(tot.nv)) AS BIGINT) AS n_top_tokens,
              CAST(sum(CASE WHEN rk.rn <= p.r THEN rk.c ELSE 0 END) AS BIGINT)
                  AS covered_tokens,
              CAST(CAST(sum(CASE WHEN rk.rn <= p.r THEN rk.c ELSE 0 END) AS BIGINT)
                   * 1000000 // CAST(max(tot.t) AS BIGINT) AS BIGINT) AS coverage_e6
       FROM pts p CROSS JOIN rk CROSS JOIN tot
       GROUP BY p.r""",
)
def _vocab_coverage_curve(spark, sf_dir):
    """Vocabulary coverage curve: what fraction of all token
    occurrences the top-r vocabulary covers, at fixed rank points —
    the standard tokenizer/UNK-budget planning table (and the
    companion to hill_tail_index's Zipf-tail fit). Counts are exact
    int64; coverage is fixed-point e6 integer division; the ranking
    window runs over the vocabulary-bounded counts relation, never the
    corpus; the rank points are a 7-row literal broadcast."""
    toks = _tokens(spark, sf_dir)
    cnt = (
        toks.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    rk = cnt.withColumn("rn", F.row_number().over(w))
    tot = rk.agg(
        F.sum("c").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("nv")
    )
    pts = spark.range(1).select(
        F.explode(F.array(*[F.lit(r) for r in _COVERAGE_RANKS])).alias("r")
    )
    return (
        pts.crossJoin(rk)
        .crossJoin(F.broadcast(tot))
        .groupBy("r")
        .agg(
            F.least(F.max("r"), F.max("nv")).cast("long").alias("n_top_tokens"),
            F.sum(F.when(F.col("rn") <= F.col("r"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.expr(
                "cast(sum(CASE WHEN rn <= r THEN c ELSE 0 END) * 1000000 div max(t) as bigint)"
            ).alias("coverage_e6"),
        )
        .select(
            F.col("r").cast("long").alias("vocab_rank"),
            "n_top_tokens",
            "covered_tokens",
            "coverage_e6",
        )
    )
