"""k-NN graph construction by relational NN-descent (Dong, Moses &
Li 2011, "Efficient k-nearest neighbor graph construction for generic
similarity measures", WWW'11).

Graph-based ANN needs a k-NN graph first, and building one exactly is
O(N²) — a non-starter at 100 TB. NN-descent converges to a near-exact
graph in a handful of rounds using only the observation that *a
neighbor of a neighbor is likely a neighbor*. This implementation is
Spark-relational end to end:

- **init**: each node gets k INDEPENDENT pseudo-random neighbors —
  per-(node, j) md5-hashed offsets into the md5(id) permutation
  (ranks via ``data/sharding.distributed_rank``, never a single-task
  window). Independence matters: a shared ring step makes adjacent
  nodes share k-1 neighbors and the graph never mixes;
- **iterate**: undirected neighborhood (edges ∪ reversed edges, each
  node's list capped at ``2k`` by hash priority so a hub's reverse
  in-degree can't blow up the self-join), then the
  neighbor-of-neighbor equi-join on the shared middle node, score new
  candidates, union with the current graph, keep per-node top-k
  (WindowGroupLimit prunes map-side);
- **bound the plans**: ``localCheckpoint`` per round, exactly like the
  repo's connected-components and Lloyd iterations.

Per round the shuffles are keyed by node id with join fan-out bounded
by (2k)², independent of N — the property that makes NN-descent THE
practical k-NN-graph recipe at cluster scale (Faiss/NN-descent
lineage; same recipe behind HNSW bulk-builds and PyNNDescent).

Both the build and the search are deterministic (md5-hashed init,
fixed round counts, total-order tie-breaks), so despite being
iterative they DO have exact SQL oracles: ``knn_graph_sql`` /
``graph_search_sql`` unroll the rounds as MATERIALIZED CTE stages —
the same recipe as ``ml/bradley_terry.py:bradley_terry_sql`` and the
Lloyd-iteration oracle. Build quality is additionally gated by a
recall@k-vs-brute-force threshold test (tests/test_knn_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import cosine_similarity, dot_product, l2_norm
from redshells_spark.operators.topk import per_group_topk
from redshells_spark.schema import require_columns


def _with_norm(vectors: DataFrame, id_column: str, emb: str) -> DataFrame:
    """Attach the clamped L2 norm once per vector. Cosine recomputes
    ``greatest(sqrt(Σx²), eps)`` for BOTH endpoints of EVERY candidate
    pair — 2/3 of the scoring FLOPs; hoisting it to the vector relation
    is bit-exact (same inputs → same IEEE sqrt) so the oracles are
    untouched, and it cut the sf0.1 build ~2×."""
    return vectors.select(
        id_column,
        emb,
        F.greatest(l2_norm(emb), F.lit(1e-12)).alias("__n"),
    )


def _score_edges(
    edges: DataFrame, vectors_n: DataFrame, id_column: str, emb: str
) -> DataFrame:
    """(src, dst) -> (src, dst, score) by joining both endpoints'
    (vector, norm) rows — two hash joins keyed on node id, then one
    dot product per pair. ``vectors_n`` must carry ``__n`` from
    :func:`_with_norm`; score bits equal the plain cosine tree."""
    v_src = vectors_n.select(
        F.col(id_column).alias("src"),
        F.col(emb).alias("__se"),
        F.col("__n").alias("__sn"),
    )
    v_dst = vectors_n.select(
        F.col(id_column).alias("dst"),
        F.col(emb).alias("__de"),
        F.col("__n").alias("__dn"),
    )
    return (
        edges.join(v_src, "src")
        .join(v_dst, "dst")
        .select(
            "src",
            "dst",
            (dot_product("__se", "__de") / (F.col("__sn") * F.col("__dn"))).alias(
                "score"
            ),
        )
    )


def knn_graph_nn_descent(
    vectors: DataFrame,
    k: int = 10,
    iterations: int = 3,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """→ (src, dst, score, rank): the approximate k-NN graph under
    cosine similarity after ``iterations`` NN-descent rounds."""
    require_columns(vectors, [id_column, embedding_column])
    if k < 1 or iterations < 0:
        raise ValueError(f"bad k={k} / iterations={iterations}")
    from redshells_spark.data.sharding import distributed_rank

    base = _with_norm(
        vectors.select(id_column, embedding_column), id_column, embedding_column
    )

    # --- init: hashed offsets into the md5(id) permutation -----------
    ranked = distributed_rank(
        base.withColumn(
            "__h",
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_column).cast("string"))),
        ),
        [F.col("__h").asc(), F.col(id_column).asc()],
        out_col="__r",
    ).select(id_column, "__r")
    n = ranked.count()
    if n <= k:
        # degenerate corpus: the exact graph is the all-pairs graph
        scored = _score_edges(
            base.selectExpr(f"{id_column} as src")
            .crossJoin(base.selectExpr(f"{id_column} as dst"))
            .filter(F.col("src") != F.col("dst")),
            base,
            id_column,
            embedding_column,
        )
        return per_group_topk(
            scored, "src", "score", k, tie_break=["dst"], rank_column="rank"
        )
    id_of_rank = ranked.select(
        F.col("__r").alias("__nr"), F.col(id_column).alias("dst")
    )
    # k INDEPENDENT pseudo-random neighbors per node — the offset is a
    # fresh md5 per (node, j), NOT a shared ring step: ring-successor
    # init makes adjacent nodes share k-1 neighbors, and then
    # neighbor-of-neighbor only widens the ring by k per round (the
    # graph never mixes). Independent offsets give each node ~(2k)²
    # distinct round-1 candidates, which is what makes NN-descent
    # converge in O(log n)-ish rounds.
    offset = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(seed)),
                        F.col("__j").cast("string"),
                        F.col(id_column).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (n - 1)
        + 1
    )
    edges = (
        ranked.withColumn("__j", F.explode(F.sequence(F.lit(1), F.lit(k))))
        .withColumn("__nr", (F.col("__r") + offset) % n)
        .join(id_of_rank, "__nr")
        .select(F.col(id_column).alias("src"), "dst")
        .distinct()
    )
    graph = per_group_topk(
        _score_edges(edges, base, id_column, embedding_column),
        "src",
        "score",
        k,
        tie_break=["dst"],
        rank_column="rank",
    ).localCheckpoint(eager=True)

    # --- NN-descent rounds ------------------------------------------
    for it in range(iterations):
        directed = graph.select("src", "dst")
        undirected = directed.union(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        # cap each node's neighborhood at 2k by hash priority so a
        # high-in-degree hub can't quadratically explode the join
        capped = per_group_topk(
            undirected.withColumn(
                "__p",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(f"{seed}|{it}"),
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                    )
                ),
            ),
            "src",
            "__p",
            2 * k,
            tie_break=["dst"],
            rank_column="__pr",
            ascending=True,
        ).select("src", "dst")
        # neighbor-of-neighbor: (a -> m), (m -> c) => candidate (a, c)
        cands = (
            capped.select(F.col("src").alias("a"), F.col("dst").alias("m"))
            .join(
                capped.select(F.col("src").alias("m"), F.col("dst").alias("c")),
                "m",
            )
            .filter(F.col("a") != F.col("c"))
            .select(F.col("a").alias("src"), F.col("c").alias("dst"))
            .distinct()
            # don't re-score current edges
            .join(directed, ["src", "dst"], "left_anti")
        )
        scored = _score_edges(cands, base, id_column, embedding_column)
        graph = per_group_topk(
            graph.select("src", "dst", "score").union(scored),
            "src",
            "score",
            k,
            tie_break=["dst"],
            rank_column="rank",
        ).localCheckpoint(eager=True)
    return graph


def _duck_cos(a: str, b: str, emb: str = "embedding") -> str:
    """DuckDB cosine between two aliases' embedding columns — the same
    dot/(greatest(norm,eps)*greatest(norm,eps)) tree as
    functions/vector.py:cosine_similarity (cf. queries/similarity.py
    _COS_SQL, already hash-MATCH-proven on unrounded comparisons)."""

    def dot(x: str, y: str) -> str:
        return f"list_dot_product({x}.{emb}::DOUBLE[], {y}.{emb}::DOUBLE[])"

    return (
        f"({dot(a, b)} / (greatest(sqrt({dot(a, a)}), 1e-12)"
        f" * greatest(sqrt({dot(b, b)}), 1e-12)))"
    )


def _duck_hex8(md5_arg: str) -> str:
    """DuckDB: decimal value of the first 8 hex digits of
    ``md5(md5_arg)`` — mirrors Spark's
    ``conv(substring(md5(...), 1, 8), 16, 10)`` (cf. _duck_h60)."""
    return (
        "("
        + " + ".join(
            f"(instr('0123456789abcdef', substr(md5({md5_arg}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )


def knn_graph_sql(
    table: str = "embeddings",
    k: int = 10,
    iterations: int = 3,
    seed: int = 7,
    id_column: str = "vec_id",
) -> list[str]:
    """Render :func:`knn_graph_nn_descent` as unrolled DuckDB CTE
    stages (the oracle form): returns the CTE list; the final graph
    lives in CTE ``g{iterations}`` with columns
    (src, dst, score, rank). AS MATERIALIZED is load-bearing — each
    round references the previous graph three times (undirected union,
    anti-join, union-with-scored), so inlined CTEs would expand the
    plan 3^iterations (same reasoning as bradley_terry_sql)."""
    cos = _duck_cos("a", "b")
    vid = id_column
    parts = [
        f"""ranked AS MATERIALIZED (
          SELECT {vid},
                 CAST(row_number() OVER (
                   ORDER BY md5('{seed}|' || CAST({vid} AS VARCHAR)) ASC,
                            {vid} ASC) - 1 AS BIGINT) AS r
          FROM {table})""",
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {table})",
        # k INDEPENDENT hashed offsets per node into the md5 permutation
        f"""cand_r AS MATERIALIZED (
          SELECT a.{vid} AS src,
                 (a.r + ({_duck_hex8(f"'{seed}|' || CAST(jj.j AS VARCHAR) || '|' || CAST(a.{vid} AS VARCHAR)")} % (nn.n - 1) + 1)) % nn.n AS nr
          FROM ranked a, nn, range(1, {k + 1}) jj(j))""",
        f"""init_edges AS MATERIALIZED (
          SELECT DISTINCT c.src, b.{vid} AS dst
          FROM cand_r c JOIN ranked b ON b.r = c.nr)""",
        f"""s_init AS MATERIALIZED (
          SELECT e.src, e.dst, {cos} AS score
          FROM init_edges e
          JOIN {table} a ON a.{vid} = e.src
          JOIN {table} b ON b.{vid} = e.dst)""",
        f"""g0 AS MATERIALIZED (
          SELECT src, dst, score, CAST(rn AS BIGINT) AS rank FROM (
            SELECT src, dst, score,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY score DESC, dst ASC) AS rn
            FROM s_init) WHERE rn <= {k})""",
    ]
    for t in range(iterations):
        pri = (
            f"md5('{seed}|{t}|' || CAST(src AS VARCHAR)"
            f" || '|' || CAST(dst AS VARCHAR))"
        )
        parts += [
            f"""u{t} AS (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM g{t}
                UNION ALL SELECT dst AS src, src AS dst FROM g{t}))""",
            # 2k cap by hash priority so hubs can't explode the NoN join
            f"""cap{t} AS MATERIALIZED (
              SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY {pri} ASC, dst ASC) AS pr
                FROM u{t}) WHERE pr <= {2 * k})""",
            # neighbor-of-neighbor candidates, minus current edges
            f"""cd{t} AS MATERIALIZED (
              SELECT DISTINCT t1.src AS src, t2.dst AS dst
              FROM cap{t} t1 JOIN cap{t} t2 ON t1.dst = t2.src
              WHERE t1.src <> t2.dst
                AND NOT EXISTS (SELECT 1 FROM g{t} g
                                WHERE g.src = t1.src AND g.dst = t2.dst))""",
            f"""sc{t} AS MATERIALIZED (
              SELECT e.src, e.dst, {cos} AS score
              FROM cd{t} e
              JOIN {table} a ON a.{vid} = e.src
              JOIN {table} b ON b.{vid} = e.dst)""",
            f"""g{t + 1} AS MATERIALIZED (
              SELECT src, dst, score, CAST(rn AS BIGINT) AS rank FROM (
                SELECT src, dst, score,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY score DESC, dst ASC) AS rn
                FROM (SELECT src, dst, score FROM g{t}
                      UNION ALL SELECT src, dst, score FROM sc{t}))
              WHERE rn <= {k})""",
        ]
    return parts


def graph_search_sql(
    table: str = "embeddings",
    graph_cte: str = "g3",
    query_pred: str = "vec_id % 25 = 0",
    k: int = 10,
    ef: int = 20,
    rounds: int = 3,
    n_entry: int = 4,
    seed: int = 13,
    id_column: str = "vec_id",
) -> list[str]:
    """Render :func:`graph_search_topk` as unrolled DuckDB CTE stages
    over an existing graph CTE (``graph_cte``, columns src/dst).
    Returns the CTE list; the final ranked beam lives in CTE
    ``search_out`` with columns (query_id, {id_column}, score, rank)."""
    vid = id_column
    cos = _duck_cos("q", "c")
    parts = [
        f"""qv AS (SELECT {vid} AS query_id, {table}.embedding
               FROM {table} WHERE {query_pred})""",
        f"""ent_r AS (
          SELECT {vid} AS cid,
                 row_number() OVER (
                   ORDER BY md5('{seed}|' || CAST({vid} AS VARCHAR)) ASC,
                            {vid} ASC) - 1 AS r
          FROM {table})""",
        f"ents AS (SELECT cid FROM ent_r WHERE r < {n_entry})",
        f"""b0 AS MATERIALIZED (
          SELECT query_id, cid, score FROM (
            SELECT query_id, cid, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, cid ASC) AS rn
            FROM (SELECT q.query_id, e.cid, {cos} AS score
                  FROM qv q CROSS JOIN ents e
                  JOIN {table} c ON c.{vid} = e.cid))
          WHERE rn <= {ef})""",
    ]
    for r in range(rounds):
        parts += [
            f"""ex{r} AS MATERIALIZED (
              SELECT DISTINCT b.query_id, g.dst AS cid
              FROM b{r} b JOIN {graph_cte} g ON g.src = b.cid
              WHERE NOT EXISTS (SELECT 1 FROM b{r} bb
                                WHERE bb.query_id = b.query_id
                                  AND bb.cid = g.dst))""",
            f"""sx{r} AS MATERIALIZED (
              SELECT e.query_id, e.cid, {cos} AS score
              FROM ex{r} e
              JOIN {table} c ON c.{vid} = e.cid
              JOIN qv q ON q.query_id = e.query_id)""",
            f"""b{r + 1} AS MATERIALIZED (
              SELECT query_id, cid, score FROM (
                SELECT query_id, cid, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, cid ASC) AS rn
                FROM (SELECT query_id, cid, score FROM b{r}
                      UNION ALL SELECT query_id, cid, score FROM sx{r}))
              WHERE rn <= {ef})""",
        ]
    parts.append(
        f"""search_out AS (
          SELECT query_id, cid AS {vid}, score, CAST(rn AS BIGINT) AS rank FROM (
            SELECT query_id, cid, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, cid ASC) AS rn
            FROM b{rounds}) WHERE rn <= {k})"""
    )
    return parts


def knn_graph_recall(
    graph: DataFrame,
    exact: DataFrame,
    k: int = 10,
) -> float:
    """Mean recall@k of ``graph`` (src, dst, rank) against the exact
    ``exact`` (query_id/src, vec_id/dst) graph — the build-quality
    metric NN-descent papers report. Driver returns one float."""
    g = graph.select(F.col("src"), F.col("dst")).filter(F.col("rank") <= k)
    cols = exact.columns
    e = exact.select(
        F.col(cols[0]).alias("src"), F.col("vec_id" if "vec_id" in cols else cols[1]).alias("dst")
    )
    hit = g.join(e, ["src", "dst"], "inner").groupBy("src").agg(F.count("*").alias("h"))
    per = e.groupBy("src").agg(F.count("*").alias("t")).join(hit, "src", "left")
    row = per.select(
        F.avg(F.coalesce(F.col("h"), F.lit(0)) / F.col("t")).alias("r")
    ).collect()[0]
    return float(row["r"])


def graph_search_topk(
    graph: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef: int = 20,
    rounds: int = 3,
    n_entry: int = 4,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    query_id: str = "query_id",
    seed: int = 13,
) -> DataFrame:
    """Greedy beam search over a k-NN graph (the NSW/HNSW search
    pattern, Malkov & Yashunin 2018, single layer) — the *query* half
    of graph-based ANN; :func:`knn_graph_nn_descent` is the build half.

    → (query_id, vec_id, score, rank): top-k per query after
    ``rounds`` beam expansions with beam width ``ef``.

    Relational form: the beam is a (query, node, score) frame; each
    round joins the beam's nodes to their graph neighbors (equi-join on
    node id, fan-out ef·k per query), scores the new candidates against
    the query vectors, unions with the beam and keeps per-query top-ef
    (WindowGroupLimit). Entry points are ``n_entry`` md5-hashed nodes
    shared by all queries — no centroids to train, no driver state.
    Per-round shuffle volume is O(|Q|·ef·k), independent of corpus
    size: the property that makes graph ANN the low-latency serving
    path at scale. ``localCheckpoint`` per round bounds the plans.
    """
    require_columns(vectors, [id_column, embedding_column])
    require_columns(queries, [query_id, embedding_column])
    if min(k, ef, rounds, n_entry) < 1 or ef < k:
        raise ValueError(f"bad k={k} ef={ef} rounds={rounds} n_entry={n_entry}")

    # the normed corpus and query relations are consumed once per
    # beam round (the scoring joins) plus the self-loop union and the
    # entry probe — pinning them is ANN serving's standard vectors-in-
    # memory residency; unpinned, every round re-ran the embeddings
    # scan + norm fold (17 scans at the round-8 plan audit)
    corpus = (
        _with_norm(
            vectors.select(id_column, embedding_column), id_column, embedding_column
        )
        .select(
            F.col(id_column).alias("__cid"),
            F.col(embedding_column).alias("__ce"),
            F.col("__n").alias("__cn"),
        )
        .localCheckpoint(eager=True)
    )
    qv = (
        _with_norm(
            queries.select(query_id, embedding_column), query_id, embedding_column
        )
        .select(
            F.col(query_id).alias("query_id"),
            F.col(embedding_column).alias("__qe"),
            F.col("__n").alias("__qn"),
        )
        .localCheckpoint(eager=True)
    )

    def _score(cands: DataFrame) -> DataFrame:
        # (query_id, __cid) -> + score; two hash joins, one dot per pair
        return (
            cands.join(corpus, "__cid")
            .join(qv, "query_id")
            .select(
                "query_id",
                "__cid",
                (dot_product("__qe", "__ce") / (F.col("__qn") * F.col("__cn"))).alias("score"),
            )
        )

    # entry points = the n_entry smallest md5 hashes: orderBy+limit is
    # Catalyst's TakeOrderedAndProject (per-partition top-k + driver
    # merge of n_entry rows) — fully distributed AND lazy, unlike the
    # previous distributed_rank which ran an eager offset-map job just
    # to pick 4 rows (one whole Spark job of fresh-session latency)
    entries = (
        vectors.select(
            F.col(id_column).alias("__cid"),
            F.md5(
                F.concat_ws("|", F.lit(str(seed)), F.col(id_column).cast("string"))
            ).alias("__h"),
        )
        .orderBy(F.col("__h").asc(), F.col("__cid").asc())
        .limit(n_entry)
        .select("__cid")
    )
    beam = per_group_topk(
        _score(qv.select("query_id").crossJoin(F.broadcast(entries))),
        "query_id",
        "score",
        ef,
        tie_break=["__cid"],
    )

    # Adjacency WITH SELF-LOOPS: one join then covers "current beam ∪
    # its neighbors", so each round references the beam exactly ONCE
    # and the whole search stays a single linear lineage. The earlier
    # keep-old-scores formulation referenced the beam three times per
    # round (expand, anti-join, union), forcing an eager checkpoint
    # every round — at 2-3s of fixed job overhead each, a fresh-session
    # 20-query serve cost ~10s in pure scheduling; re-scoring the ≤ ef
    # kept candidates per query instead is O(|Q|·ef) extra dot
    # products, noise next to the O(|Q|·ef·k) expansion join itself.
    # Scores are deterministic functions of (query, node), so the
    # rescored beam is bit-identical to the carried one.
    nbrs = graph.select(F.col("src").alias("__cid"), F.col("dst")).union(
        corpus.select("__cid", F.col("__cid").alias("dst"))
    )
    for i in range(rounds):
        cand = (
            beam.select("query_id", "__cid")
            .join(nbrs, "__cid")
            .select("query_id", F.col("dst").alias("__cid"))
            .distinct()
        )
        beam = per_group_topk(
            _score(cand),
            "query_id",
            "score",
            ef,
            tie_break=["__cid"],
        )
        # linear lineage still needs an occasional cut on LONG
        # searches; at the serving depth (rounds <= 4) the whole
        # search is one job
        if (i + 1) % 4 == 0 and i != rounds - 1:
            beam = beam.coalesce(8).localCheckpoint(eager=True)
    return per_group_topk(
        beam.select("query_id", F.col("__cid").alias(id_column), "score"),
        "query_id",
        "score",
        k,
        tie_break=[id_column],
        rank_column="rank",
    )


def knn_graph_insert(
    graph: DataFrame,
    vectors: DataFrame,
    new_vectors: DataFrame,
    k: int = 10,
    ef: int = 20,
    rounds: int = 3,
    max_batch_brute: int = 10_000,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Incremental k-NN-graph maintenance — the HNSW insert pattern
    (Malkov & Yashunin 2018 §4): for each new vector, beam-search the
    EXISTING graph for its neighbors, connect it to the top-k, and
    offer the reversed edges to those neighbors (cosine is symmetric),
    which keep their best k. New↔new edges come from a brute pass
    within the batch (bounded by ``max_batch_brute`` — a nightly delta,
    not a corpus).

    → the updated graph (src, dst, score, rank) over
    ``vectors ∪ new_vectors``. Cost: one beam search per new vector
    (O(ef·k) per round, corpus-size independent) + one batch²-bounded
    brute block — a full rebuild touches N·(2k)² per round instead;
    at 100 TB you insert, you don't rebuild.

    Drift caveat (honest): repeated incremental inserts approximate
    the rebuilt graph; recall is gated in tests/test_knn_graph.py, and
    a periodic NN-descent refresh (``knn_graph_nn_descent``) restores
    build quality — the same compaction rhythm as the binary/IVF
    streaming indexes.
    """
    require_columns(new_vectors, [id_column, embedding_column])
    n_new = new_vectors.count()
    if n_new == 0:
        return graph
    if n_new > max_batch_brute:
        raise ValueError(
            f"insert batch of {n_new} exceeds max_batch_brute="
            f"{max_batch_brute}: split the delta or raise deliberately"
        )
    from redshells_spark.similarity.ann import brute_force_topk

    queries = new_vectors.select(
        F.col(id_column).alias("query_id"), F.col(embedding_column)
    )
    # new -> old edges via beam search over the existing graph
    found = graph_search_topk(
        graph,
        vectors,
        queries,
        k=k,
        ef=ef,
        rounds=rounds,
        id_column=id_column,
        embedding_column=embedding_column,
        seed=seed,
    ).select(
        F.col("query_id").alias("src"), F.col(id_column).alias("dst"), "score"
    )
    # new <-> new edges: brute within the (bounded) batch
    batch_pairs = (
        brute_force_topk(
            queries,
            new_vectors,
            k=min(k + 1, max(2, n_new)),
            query_id="query_id",
            corpus_id=id_column,
            embedding_column=embedding_column,
        )
        .filter(F.col("query_id") != F.col(id_column))
        .select(
            F.col("query_id").alias("src"), F.col(id_column).alias("dst"), "score"
        )
    )
    new_out = per_group_topk(
        found.union(batch_pairs), "src", "score", k, tie_break=["dst"]
    ).select("src", "dst", "score")
    # reversed offers: old (and new) nodes keep their best k among
    # current neighbors + the newly-arrived reverse edges
    reverse = new_out.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
    )
    return per_group_topk(
        graph.select("src", "dst", "score").union(new_out).union(reverse),
        "src",
        "score",
        k,
        tie_break=["dst"],
        rank_column="rank",
    )
