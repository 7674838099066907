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
