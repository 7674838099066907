"""Bradley-Terry preference ratings by Hunter's MM algorithm — the
model behind pairwise human-preference data (RLHF reward comparisons,
chatbot-arena style ELO boards, search interleaving).

Bradley & Terry 1952: P(i beats j) = p_i / (p_i + p_j). Hunter 2004
("MM algorithms for generalized Bradley-Terry models", Ann. Statist.)
gives the monotone update

    p_i  <-  W_i / sum_{j != i}  n_ij / (p_i + p_j)

where W_i = total wins of i and n_ij = matches between i and j. The
item-count is tiny by construction (models, arms, variants) while the
MATCH log is the 100 TB side — so the log is folded ONCE into
item²-bounded pair counts DISTRIBUTED, and the MM loop runs on the
driver over the collected pair table (the same small-state split as
the repo's Lloyd centroids and GCMC trainer; iterating items-sized
state through Spark jobs pays scheduling latency for no scalability).
A ``max_items`` guard refuses loudly when the pair table would not
fit the driver.

Determinism contract: each denominator sums over at most (#items - 1)
terms — a bounded-group float sum per the repo's float policy (NOTES
round-5 inventory), so both engines agree to ~1e-14 and the oracle
unrolls the SAME fixed number of iterations as generated SQL stages
(the unigram-Viterbi oracle pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

# two items that have both converged to rating 0 (never won a match)
# would divide by p_i + p_j = 0; the guard is shared verbatim with the
# SQL oracle so both engines compute identical doubles
EPS = 1e-12


def pair_counts(
    matches: DataFrame, winner_column: str, loser_column: str
) -> tuple[DataFrame, DataFrame]:
    """Fold a match log into the two tables the MM iteration needs:

    - ``pairs`` (i, j, n) — matches between i and j, DIRECTED BOTH
      WAYS (each unordered pair appears as (i,j) and (j,i)) so the
      per-i denominator is one groupBy;
    - ``wins`` (i, w) — total wins per item.

    This is the only pass over the (potentially huge) match log."""
    require_columns(matches, [winner_column, loser_column])
    w = matches.groupBy(
        F.col(winner_column).alias("i"), F.col(loser_column).alias("j")
    ).agg(F.count("*").alias("nw"))
    pairs = (
        w.select("i", "j", "nw")
        .unionByName(w.select(F.col("j").alias("i"), F.col("i").alias("j"), "nw"))
        .groupBy("i", "j")
        .agg(F.sum("nw").alias("n"))
    )
    wins = w.groupBy("i").agg(F.sum("nw").alias("w"))
    return pairs, wins


def bradley_terry_ratings(
    matches: DataFrame,
    winner_column: str = "winner",
    loser_column: str = "loser",
    iterations: int = 20,
    max_items: int = 100_000,
) -> DataFrame:
    """→ (item, rating, w, n_matches): MM-fitted Bradley-Terry skills,
    normalized to sum 1 after the final iteration (MM is
    scale-invariant, so normalizing once minimizes float traffic).

    Architecture: the (potentially 100 TB) match log is folded ONCE
    into per-pair counts DISTRIBUTED; the MM loop then runs on the
    driver over the collected item²-bounded pair table — the same
    small-state/driver-loop split as the repo's Lloyd centroids and
    GCMC trainer. Iterating tiny state through 20 Spark jobs would pay
    ~seconds of scheduling per update for zero scalability gain (the
    state never grows with data). ``max_items`` guards the collect
    loudly."""
    pairs, wins = pair_counts(matches, winner_column, loser_column)
    n_items = wins.count()
    if n_items > max_items:
        raise ValueError(
            f"{n_items} distinct items exceeds max_items={max_items}: "
            "the pair table no longer fits the driver loop — shard by "
            "league/segment or raise the cap deliberately"
        )
    # deterministic driver fold: sorted (i, j) order everywhere
    pair_rows = sorted(
        (r["i"], r["j"], r["n"]) for r in pairs.collect()
    )
    win_rows = {r["i"]: r["w"] for r in wins.collect()}
    items = sorted({i for i, _, _ in pair_rows})
    w = {i: int(win_rows.get(i, 0)) for i in items}
    by_i: dict = {}
    for i, j, n in pair_rows:
        by_i.setdefault(i, []).append((j, n))
    p = {i: 1.0 for i in items}
    for _ in range(iterations):
        new_p = {}
        for i in items:
            d = 0.0
            for j, n in by_i.get(i, ()):
                d += n / max(p[i] + p[j], EPS)
            new_p[i] = (w[i] / d) if d > 0 else 0.0
        p = new_p
    total = sum(p[i] for i in items)
    n_per = {i: sum(n for _, n in by_i.get(i, ())) for i in items}
    spark = matches.sparkSession
    return spark.createDataFrame(
        [(i, p[i] / total, w[i], int(n_per[i])) for i in items],
        ["item", "rating", "w", "n_matches"],
    )


def bradley_terry_sql(
    matches_cte: str,
    iterations: int = 20,
) -> str:
    """Render the SAME computation as chained DuckDB CTEs (the oracle
    unroll): ``matches_cte`` must define a CTE named ``matches`` with
    columns (winner, loser). Returns a full WITH ... SELECT statement
    producing (item, rating, w, n_matches)."""
    parts = [
        matches_cte,
        """wdir AS (
           SELECT winner AS i, loser AS j, count(*) AS nw
           FROM matches GROUP BY winner, loser)""",
        """pairs AS (
           SELECT i, j, CAST(sum(nw) AS BIGINT) AS n FROM (
             SELECT i, j, nw FROM wdir
             UNION ALL SELECT j AS i, i AS j, nw FROM wdir)
           GROUP BY i, j)""",
        """wins AS (SELECT i, CAST(sum(nw) AS BIGINT) AS w FROM wdir GROUP BY i)""",
        """items AS (
           SELECT p.item, coalesce(wins.w, 0) AS w FROM
             (SELECT DISTINCT i AS item FROM pairs) p
             LEFT JOIN wins ON wins.i = p.item)""",
        """nper AS (SELECT i AS item, CAST(sum(n) AS BIGINT) AS n_matches
           FROM pairs GROUP BY i)""",
        "it0 AS MATERIALIZED (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM items)",
    ]
    # AS MATERIALIZED is load-bearing: each stage references the
    # previous one TWICE (pi/pj self-join), so inlined CTEs would
    # expand the plan 2^iterations
    for t in range(iterations):
        parts.append(
            f"""dn{t + 1} AS MATERIALIZED (
              SELECT pairs.i,
                     sum(pairs.n / greatest(pi.p + pj.p, {EPS!r})) AS d
              FROM pairs
              JOIN it{t} pi ON pi.item = pairs.i
              JOIN it{t} pj ON pj.item = pairs.j
              GROUP BY pairs.i)"""
        )
        parts.append(
            f"""it{t + 1} AS MATERIALIZED (
            SELECT items.item,
                   CASE WHEN d.d IS NOT NULL AND d.d > 0
                        THEN items.w / d.d ELSE CAST(0.0 AS DOUBLE) END AS p
            FROM items LEFT JOIN dn{t + 1} d ON d.i = items.item)"""
        )
    last = f"it{iterations}"
    parts.append(f"tot AS (SELECT sum(p) AS t FROM {last})")
    body = ",\n".join(parts)
    return f"""WITH {body}
    SELECT f.item, round(f.p / tot.t, 4) AS rating, items.w,
           coalesce(nper.n_matches, 0) AS n_matches
    FROM {last} f
    CROSS JOIN tot
    JOIN items ON items.item = f.item
    LEFT JOIN nper ON nper.item = f.item"""
