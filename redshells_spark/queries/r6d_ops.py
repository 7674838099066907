"""Round-6 session-2 batch 4: corpus integrity digests (Merkle-style
snapshot certificates) and k-center greedy coresets (farthest-first
traversal), both exactly oracled.
"""

from __future__ import annotations

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.text import _duck_h60  # noqa: E402

# ------------------------------------------------------ corpus digest

_DIGEST_CONTENT_DUCK = (
    "concat_ws('|', coalesce(CAST(doc_id AS VARCHAR), ''), coalesce(text, ''), "
    "coalesce(lang, ''), coalesce(source, ''), coalesce(CAST(n_chars AS VARCHAR), ''))"
)


@q(
    "corpus_merkle_digest",
    f"""WITH c AS (SELECT {_DIGEST_CONTENT_DUCK} AS c FROM documents),
       h AS (SELECT {_duck_h60("c")} AS h FROM c),
       per AS (
         SELECT h % 32 AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(bit_xor(h) AS BIGINT) AS xor_digest,
                CAST(sum(h % 268435456) AS BIGINT) AS sum_digest
         FROM h GROUP BY 1)
       SELECT CAST(bucket AS BIGINT) AS bucket, n_rows, xor_digest, sum_digest
       FROM per
       UNION ALL
       SELECT CAST(-1 AS BIGINT), CAST(sum(n_rows) AS BIGINT),
              CAST(bit_xor(xor_digest) AS BIGINT),
              CAST(sum(sum_digest) AS BIGINT)
       FROM per""",
)
def _corpus_merkle_digest(spark, sf_dir):
    """Merkle-style corpus digest (data/integrity.py): md5-hash every
    row's content, bucket by hash, keep per-bucket (count, XOR fold,
    mod-2^28 sum fold) plus the global fold row (bucket = -1) — the
    snapshot-equality certificate that answers 'is this copy the
    corpus we trained on?' without a row diff: digests are order-free
    and mergeable (map-side combine, incremental loads), and a
    mismatch pinpoints which bucket of the keyspace to re-scan. XOR
    alone cancels on duplicated rows and a sum alone is offset-blind;
    together with the count, accidental agreement is ~2^-88."""
    from redshells_spark.data.integrity import corpus_digest

    docs = _t(spark, sf_dir, "documents")
    return corpus_digest(
        docs, ["doc_id", "text", "lang", "source", "n_chars"], n_buckets=32
    )


# ----------------------------------------------------- k-center coreset


def _duck_d2(x_e: str, c_e: str) -> str:
    """Squared L2 — the same sequential fold as semantic_dedup's d2
    CTE (hash-MATCH-proven): list_reduce sum of squared diffs."""
    return (
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> ({x_e}[i]::DOUBLE - {c_e}[i]::DOUBLE)"
        f" * ({x_e}[i]::DOUBLE - {c_e}[i]::DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )


def _kcenter_oracle(k: int = 5, seed: int = 17) -> str:
    stages = [
        f"""b AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
       f0 AS MATERIALIZED (
         SELECT id FROM (
           SELECT id, md5('{seed}|' || CAST(id AS VARCHAR)) AS h FROM b)
         ORDER BY h ASC, id ASC LIMIT 1),
       d1 AS MATERIALIZED (
         SELECT x.id, x.e, {_duck_d2("x.e", "c.e")} AS d2
         FROM b x, (SELECT e FROM b WHERE id = (SELECT id FROM f0)) c
         WHERE x.id <> (SELECT id FROM f0))"""
    ]
    for t in range(2, k + 1):
        prev = f"d{t - 1}"
        stages.append(
            f"""s{t} AS MATERIALIZED (
              SELECT id, d2 FROM {prev} ORDER BY d2 DESC, id ASC LIMIT 1),
       d{t} AS MATERIALIZED (
         SELECT x.id, x.e, least(x.d2, {_duck_d2("x.e", "c.e")}) AS d2
         FROM {prev} x,
              (SELECT e FROM b WHERE id = (SELECT id FROM s{t})) c
         WHERE x.id <> (SELECT id FROM s{t}))"""
        )
    picks = "\n       UNION ALL ".join(
        f"SELECT {t} AS step, id, d2 FROM s{t}" for t in range(2, k + 1)
    )
    return (
        "WITH "
        + ",\n       ".join(stages)
        + f""",
       picks AS (
         SELECT 1 AS step, (SELECT id FROM f0) AS id, CAST(0.0 AS DOUBLE) AS d2
         UNION ALL {picks})
       SELECT CAST(step AS BIGINT) AS step, id AS vec_id,
              round(d2, 4) AS d2_to_chosen
       FROM picks"""
    )


@q("kcenter_coreset", _kcenter_oracle(5, 17))
def _kcenter_coreset(spark, sf_dir):
    """k-center greedy coreset over the embeddings (Gonzalez 1985
    farthest-first; Sener & Savarese 2018; similarity/coreset.py):
    5 picks that COVER the embedding space — the metric counterpart to
    greedy_max_coverage for diverse eval subsets and quantizer
    seeding, a 2-approximation to the k-center objective. Each round
    is one broadcast join against the single new center (nearest-
    center distances update as least(old, new) — O(N) per round, not
    O(k·N)) + a TakeOrdered argmax with a (d2, id) total-order
    tie-break; the loop unrolls into MATERIALIZED CTE stages, squared
    L2 via the same sequential fold the SemDeDup oracle proved."""
    from redshells_spark.similarity.coreset import kcenter_coreset

    emb = _t(spark, sf_dir, "embeddings")
    out = kcenter_coreset(emb, k=5, seed=17)
    return out.select("step", "vec_id", F.round("d2_to_chosen", 4).alias("d2_to_chosen"))


# ------------------------------------------------------- cohort LTV


@q(
    "cohort_ltv_curve",
    """WITH e AS (
         SELECT user_id, epoch_us(ts) // 604800000000 AS week,
                CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
         FROM events),
       fw AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
       cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
              FROM fw GROUP BY 1),
       act AS (
         SELECT f.cohort_week, e.week - f.cohort_week AS age_weeks,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
                CAST(sum(e.v) AS BIGINT) AS revenue_e2
         FROM e JOIN fw f USING (user_id)
         GROUP BY 1, 2),
       cum AS (
         SELECT cohort_week, age_weeks, n_active, revenue_e2,
                CAST(sum(revenue_e2) OVER (PARTITION BY cohort_week
                  ORDER BY age_weeks ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS cum_revenue_e2
         FROM act)
       SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
              CAST(c.age_weeks AS BIGINT) AS age_weeks,
              c.n_active, c.revenue_e2, c.cum_revenue_e2,
              CAST(c.cum_revenue_e2 // s.cohort_size AS BIGINT)
                  AS cum_per_user_e2
       FROM cum c JOIN cs s USING (cohort_week)""",
)
def _cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value triangle: users grouped by first-seen
    epoch week, revenue accumulated per cohort-age — THE
    product-analytics companion to retention_cohorts (which counts
    presence; this sums value). Everything exact int64: cent units,
    integer epoch weeks, window cumsum, per-user LTV as integer
    division by the cohort size. Two shuffles (first-week per user,
    cohort-age aggregate) — both map-combinable."""
    ev = _t(spark, sf_dir, "events")
    # integer `div`, never double `/`: double division of ~1e15 us
    # values can round across a week boundary (funnel.py precedent)
    e = ev.select(
        "user_id",
        event_us(ev).alias("__us"),
        money_units(F.col("value"), 100).alias("v"),
    ).select(
        "user_id",
        F.expr("cast(__us as bigint) div 604800000000").alias("week"),
        "v",
    )
    fw = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cs = fw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    act = (
        e.join(fw, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.sum("v").cast("long").alias("revenue_e2"),
        )
    )
    wc = Window.partitionBy("cohort_week").orderBy(F.col("age_weeks").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = act.withColumn(
        "cum_revenue_e2", F.sum("revenue_e2").over(wc).cast("long")
    )
    return cum.join(F.broadcast(cs), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("age_weeks").cast("long").alias("age_weeks"),
        "n_active",
        "revenue_e2",
        "cum_revenue_e2",
        F.expr("cast(cum_revenue_e2 div cohort_size as bigint)").alias(
            "cum_per_user_e2"
        ),
    )


# -------------------------------------------------- weighted median

_WEEK_US = 604800000000


@q(
    "weighted_median_by_group",
    """WITH b AS (
         SELECT event_type,
                CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
         FROM events),
       pv AS (SELECT event_type, v, CAST(sum(w) AS BIGINT) AS w_v
              FROM b GROUP BY 1, 2),
       cum AS (
         SELECT event_type, v, w_v,
                CAST(sum(w_v) OVER (PARTITION BY event_type ORDER BY v ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
         FROM pv),
       tot AS (SELECT event_type, CAST(sum(w_v) AS BIGINT) AS w_total,
                      CAST(count(*) AS BIGINT) AS n_values
               FROM pv GROUP BY 1)
       SELECT t.event_type, t.n_values, t.w_total,
              CAST(min(c.v) AS BIGINT) AS weighted_median_e2
       FROM cum c JOIN tot t USING (event_type)
       WHERE 2 * c.cw >= t.w_total
       GROUP BY t.event_type, t.n_values, t.w_total""",
)
def _weighted_median_by_group(spark, sf_dir):
    """Weighted (lower) median of event value per type, weighted by
    the props payload weight k — robust central tendency where rows
    carry unequal mass (docs weighted by tokens, events by spend).
    Entirely exact integers: cent units, int64 weight cumsums over the
    per-value count relation (domain-bounded, the KS/PSI state shape),
    and the median is min(v) with 2·cumweight ≥ total — no float ever
    appears."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        money_units(F.col("value"), 100).alias("v"),
        F.get_json_object("props", "$.k").cast("long").alias("w"),
    )
    pv = b.groupBy("event_type", "v").agg(F.sum("w").cast("long").alias("w_v"))
    wc = Window.partitionBy("event_type").orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pv.withColumn("cw", F.sum("w_v").over(wc).cast("long"))
    tot = pv.groupBy("event_type").agg(
        F.sum("w_v").cast("long").alias("w_total"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    return (
        cum.join(F.broadcast(tot), "event_type")
        .filter(2 * F.col("cw") >= F.col("w_total"))
        .groupBy("event_type", "n_values", "w_total")
        .agg(F.min("v").cast("long").alias("weighted_median_e2"))
        .select("event_type", "n_values", "w_total", "weighted_median_e2")
    )


# --------------------------------------------- dup-cluster histogram

from redshells_spark.queries.r5c_ops import _near_dup_labeled  # noqa: E402
from redshells_spark.queries.r5c_ops import _COMPONENTS_SQL, _NTOK_SQL  # noqa: E402


@q(
    "dup_cluster_histogram",
    f"""WITH RECURSIVE {_VOCAB_SQL}, {_TOK_SQL}, {_COMPONENTS_SQL}, {_NTOK_SQL},
       lab AS (
         SELECT n.doc_id,
                CAST(coalesce(c.keep_id, n.doc_id) AS BIGINT) AS component
         FROM ntok n LEFT JOIN comp c USING (doc_id)),
       sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                 FROM lab GROUP BY 1)
       SELECT csize AS cluster_size,
              CAST(count(*) AS BIGINT) AS n_clusters,
              CAST(count(*) * csize AS BIGINT) AS n_docs,
              CAST(count(*) * (csize - 1) AS BIGINT) AS n_dropped_at_keep1
       FROM sizes GROUP BY csize""",
)
def _dup_cluster_histogram(spark, sf_dir):
    """Near-dup cluster-size histogram — the dedup DIAGNOSTIC every
    corpus report leads with: how many clusters of each size, how many
    docs they hold, and how many a keep-one policy would drop. Reuses
    the exact component labeling near_dup_components value-matches
    (singletons included via the left join); the histogram itself is
    one component-bounded aggregate. At 100 TB the size distribution
    is the early-warning for template floods (one giant cluster) and
    boilerplate (a fat head of small clusters)."""
    lab = _near_dup_labeled(spark, sf_dir)
    sizes = lab.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return sizes.groupBy(F.col("csize").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.count(F.lit(1)) * F.first("csize")).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) * (F.first("csize") - 1))
        .cast("long")
        .alias("n_dropped_at_keep1"),
    )


# -------------------------------------------------------- token PMI


@q(
    "token_pmi_topk",
    f"""WITH {_TOK_SQL},
       n AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM tok),
       uni AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
       prs AS (
         SELECT a.token AS tok_a, b.token AS tok_b
         FROM tok a JOIN tok b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.token < b.token
         UNION ALL
         SELECT b.token, a.token
         FROM tok a JOIN tok b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND b.token < a.token),
       co AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab
              FROM prs GROUP BY 1, 2),
       scored AS (
         SELECT co.tok_a, co.tok_b, co.c_ab,
                round(ln((CAST(co.c_ab AS DOUBLE) * n.n_tok)
                         / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
         FROM co
         JOIN uni ua ON ua.token = co.tok_a
         JOIN uni ub ON ub.token = co.tok_b, n
         WHERE co.c_ab >= 20)
       SELECT tok_a, tok_b, c_ab, pmi FROM (
         SELECT *, row_number() OVER (ORDER BY pmi DESC, tok_a ASC, tok_b ASC) AS rn
         FROM scored) WHERE rn <= 30""",
)
def _token_pmi_topk(spark, sf_dir):
    """Top-30 adjacent-token associations by pointwise mutual
    information (Church & Hanks 1990) — collocation mining, the
    lexical-association companion to association_rules' basket lift.
    Pairs are ADJACENT positions only (one self-join on (doc, pos+1) —
    token-volume linear, never doc²), unordered via the lexicographic
    swap; counts exact int64, PMI one fixed ln expression rounded
    after; the ranking window runs over the vocab²-bounded pair
    relation."""
    toks = _tokens(spark, sf_dir)
    flat = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    n = flat.agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    uni = flat.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = flat.select("doc_id", "pos", F.col("token").alias("ta"))
    b = flat.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("token").alias("tb")
    )
    adj = a.join(b, ["doc_id", "pos"]).select(
        F.least("ta", "tb").alias("tok_a"), F.greatest("ta", "tb").alias("tok_b")
    ).filter(F.col("tok_a") != F.col("tok_b"))
    co = adj.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    ).filter(F.col("c_ab") >= 20)
    scored = (
        co.join(F.broadcast(uni.select(F.col("token").alias("tok_a"), F.col("c").alias("__ca"))), "tok_a")
        .join(F.broadcast(uni.select(F.col("token").alias("tok_b"), F.col("c").alias("__cb"))), "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_tok"))
                    / (F.col("__ca").cast("double") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("tok_a", "tok_b", "c_ab", "pmi")
    )


# ------------------------------------------- revenue concentration


@q(
    "revenue_concentration",
    """WITH r AS (
         SELECT n.n_name AS nation,
                CAST(sum(CAST(floor(o.o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev
         FROM orders o
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
         GROUP BY 1),
       rk AS (SELECT nation, rev,
                     row_number() OVER (ORDER BY rev ASC, nation ASC) AS i,
                     CAST(count(*) OVER () AS BIGINT) AS n,
                     CAST(sum(rev) OVER () AS BIGINT) AS tot
              FROM r)
       SELECT CAST(max(n) AS BIGINT) AS n_nations,
              CAST(max(tot) AS BIGINT) AS total_rev_e2,
              -- denominator pre-divided: D*1e6 overflows int64 at 10x
              -- (caught by the factor-10 differential); greatest(..,1)
              -- guards tiny corpora
              CAST((2 * sum(i * rev) - (max(n) + 1) * max(tot))
                   // greatest(max(n) * max(tot) // 1000000, 1) AS BIGINT) AS gini_e6,
              -- HHI over e3 integer shares: rev*rev sums overflow
              -- int64 (DuckDB would silently widen to HUGEINT and
              -- diverge); shares <= 1000 keep everything in range
              CAST(sum((rev * 1000 // max_tot) * (rev * 1000 // max_tot)) AS BIGINT)
                  AS hhi_e6
       FROM (SELECT *, CAST(max(tot) OVER () AS BIGINT) AS max_tot FROM rk) rk2""",
)
def _revenue_concentration(spark, sf_dir):
    """Revenue concentration across nations: the Gini coefficient via
    the sorted-rank identity G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) and
    the Herfindahl-Hirschman index Σ share² over e3 integer shares — both exact-integer fixed point over cent units (the identity needs one rank
    window over the nation-bounded relation; no float ever appears).
    The standard imbalance audit for corpus sources and revenue alike
    — a Gini near 1 or HHI near 1e6 says one group dominates."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(money_units(F.col("o_totalprice"), 100)).cast("long").alias("rev"))
    )
    w = Window.orderBy(F.col("rev").asc(), F.col("nation").asc())
    wa = Window.partitionBy()
    rk = r.select(
        "nation",
        "rev",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
        F.sum("rev").over(wa).cast("long").alias("tot"),
    )
    rk2 = rk.withColumn("max_tot", F.max("tot").over(wa).cast("long"))
    return rk2.agg(
        F.max("n").cast("long").alias("n_nations"),
        F.max("tot").cast("long").alias("total_rev_e2"),
        # denominator pre-divided: D*1e6 overflows int64 at 10x data
        # (caught by the factor-10 differential); greatest(.., 1)
        # guards tiny corpora
        F.expr(
            "cast((2 * sum(i * rev) - (max(n) + 1) * max(tot))"
            " div greatest(max(n) * max(tot) div 1000000, 1L) as bigint)"
        ).alias("gini_e6"),
        # e3 integer shares: rev*rev would overflow int64 (and DuckDB
        # would silently widen to HUGEINT and diverge)
        F.expr(
            "cast(sum((rev * 1000 div max_tot) * (rev * 1000 div max_tot)) as bigint)"
        ).alias("hhi_e6"),
    )
