"""ML model queries (rows-only MLlib fits + deterministic reductions) and temporal/analytic windows.

Split from the former single-file queries.py (round 4); registration
order within and across tier modules is preserved by the package
__init__ import order and pinned by tests/test_ann_recall.py.
"""

from redshells_spark.queries._shared import *  # noqa: F401,F403
from redshells_spark.queries.text import _duck_h60  # noqa: F401,E402

# ----------------------------------------------------- ML (rows-only)

@q("word2vec_vectors")
def _word2vec_vectors(spark, sf_dir):
    from redshells_spark.ml.word2vec import train_word2vec, word_vectors

    model = train_word2vec(
        _tokens(spark, sf_dir), vector_size=16, min_count=2, seed=42
    )
    return word_vectors(model)


@q("doc2vec_vectors")  # SGD fit → rows-only check
def _doc2vec_vectors(spark, sf_dir):
    """PV-DBOW doc vectors (reference train/train_doc2vec.py:11-30);
    driver fit on a capped corpus, distributed inference."""
    from redshells_spark.ml.doc2vec import Doc2Vec

    toks = _tokens(spark, sf_dir).limit(300)
    model = Doc2Vec.fit(
        toks, vector_size=16, min_count=2, epochs=5, seed=42
    )
    out = model.infer_vector(toks.limit(50))
    return out.select(
        "doc_id",
        F.round(F.aggregate("vector", F.lit(0.0), lambda a, x: a + F.abs(x)), 4).alias("l1_norm"),
    ).orderBy("doc_id")


@q("fasttext_oov_vectors")  # w2v fit RNG → rows-only check
def _fasttext_oov_vectors(spark, sf_dir):
    """FastText subword composition: OOV words still get vectors
    (reference train/train_fasttext.py:14-38 — the capability Word2Vec
    alone lacks). Known + OOV words inferred together; the oov flag
    distinguishes trained vs composed vectors."""
    from redshells_spark.ml.fasttext import FastTextVectors

    ft = FastTextVectors.fit(
        _tokens(spark, sf_dir), vector_size=16, min_count=2,
        bucket=100_000, seed=42,
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


@q("scdv_doc_vectors")
def _scdv_doc_vectors(spark, sf_dir):
    from redshells_spark.ml.scdv import SCDV

    docs = _tokens(spark, sf_dir)
    model = SCDV.fit(
        docs, cluster_size=4, embedding_size=8,
        word2vec_kwargs={"min_count": 2, "seed": 42}, seed=42,
    )
    return model.infer_vector(docs)


@q("als_item_factors")
def _als_item_factors(spark, sf_dir):
    from redshells_spark.ml.matrix_factorization import item_factors, train_matrix_factorization

    li = _t(spark, sf_dir, "lineitem")
    ratings = li.select(
        F.col("l_suppkey").cast("int").alias("user_id"),
        F.col("l_partkey").cast("int").alias("item_id"),
        (F.col("l_quantity") / 10.0).alias("rating"),
    )
    mf = train_matrix_factorization(ratings, n_latent_factors=8, max_iter=5, reg_param=0.1)
    return item_factors(mf, normalize=True)


@q("mf_item_similarity")  # ALS fit RNG → rows-only check
def _mf_item_similarity(spark, sf_dir):
    """Item-item similarity from ALS factors (reference
    calculate_similarity_with_matrix_factorization.py:21-66), tiered
    exact-BLAS here (catalog below max_exact_items); the LSH-bucketed
    big-catalog path is exercised in tests/test_scale_guards.py."""
    from redshells_spark.ml.matrix_factorization import (
        mf_item_similarity,
        train_matrix_factorization,
    )

    li = _t(spark, sf_dir, "lineitem")
    ratings = li.select(
        F.col("l_suppkey").cast("int").alias("user_id"),
        F.col("l_partkey").cast("int").alias("item_id"),
        (F.col("l_quantity") / 10.0).alias("rating"),
    )
    mf = train_matrix_factorization(ratings, n_latent_factors=8, max_iter=5, reg_param=0.1)
    out = mf_item_similarity(mf, threshold=0.95)
    return out.select("id0", "id1", _r4(F.col("similarity"), "similarity"))


@q("lda_doc_topics")
def _lda_doc_topics(spark, sf_dir):
    from redshells_spark.ml.lda import train_lda

    docs = _tokens(spark, sf_dir)
    res = train_lda(docs, n_topics=4, max_iter=5, min_df=2, max_df=0.95)
    return res.document_topics(docs).select("doc_id", "topic_distribution")


@q(
    "dimension_reduction",
    """WITH imp AS (
         SELECT dim, sum(x * x) AS s FROM (
           SELECT generate_subscripts(embedding, 1) AS dim,
                  unnest(embedding::DOUBLE[]) AS x
           FROM embeddings) GROUP BY dim),
       sel AS (
         SELECT dim, CAST(row_number() OVER (ORDER BY dim ASC) - 1 AS BIGINT) AS pos
         FROM (SELECT dim FROM imp ORDER BY s DESC, dim ASC LIMIT 16)),
       ex AS (
         SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x
         FROM embeddings),
       g AS (SELECT e.vec_id, s.pos, e.x FROM ex e JOIN sel s ON e.dim = s.dim),
       v AS (SELECT vec_id, list(x ORDER BY pos ASC) AS xs FROM g GROUP BY vec_id),
       n AS (SELECT vec_id, xs,
                    sqrt(list_reduce(list_transform(xs, t -> t * t),
                                     (a, b) -> a + b)) AS nrm
             FROM v)
       SELECT vec_id, CAST(p - 1 AS BIGINT) AS pos,
              round(xs[p] / greatest(nrm, 1e-12), 4) AS e
       FROM (SELECT vec_id, xs, nrm, unnest(range(1, len(xs) + 1)) AS p FROM n)""",
)
def _dimension_reduction(spark, sf_dir):
    """Deterministic dimension reduction (ml/dimension_reduction.py,
    reference dimension_reduction_model.py): keep the top-16 dims by
    Σx² importance, slice, L2-normalize. Fit and transform are pure
    arithmetic over fixed orders — importance argsort, index-ordered
    gather, left-fold norm — so the whole estimator-transform, exported
    as exploded (vec_id, pos, e) rows, hash-MATCHes a DuckDB replay
    (list_reduce folds in the same index order as F.aggregate)."""
    from redshells_spark.ml.dimension_reduction import DimensionReductionModel

    emb = _t(spark, sf_dir, "embeddings")
    model = DimensionReductionModel.fit(emb, top_n=16, normalize=True)
    out = model.transform(emb)
    return out.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        _r4(F.col("x"), "e"),
    )


@q(
    "value_percentiles",
    """SELECT event_type,
         round(quantile_cont(value, 0.25), 4) AS p25,
         round(quantile_cont(value, 0.5), 4) AS p50,
         round(quantile_cont(value, 0.95), 4) AS p95
       FROM events GROUP BY event_type""",
)
def _value_percentiles(spark, sf_dir):
    # beyond-reference OLAP: exact interpolated percentiles (Spark
    # `percentile` == DuckDB `quantile_cont` semantics)
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _r4(F.expr("percentile(value, 0.25)"), "p25"),
        _r4(F.expr("percentile(value, 0.5)"), "p50"),
        _r4(F.expr("percentile(value, 0.95)"), "p95"),
    )


@q(
    "orders_rollup",
    f"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n, {_MONEY_SUM('o_totalprice')} AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def _orders_rollup(spark, sf_dir):
    # Catalyst rollup (SURVEY §2.C: free in Spark, absent in reference)
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_money_sum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@q(
    "salted_aggregate",
    f"""SELECT event_type, count(*) AS n, {_MONEY_SUM('value')} AS sum_value
       FROM events GROUP BY event_type""",
)
def _salted_aggregate(spark, sf_dir):
    # two-phase salted aggregation produces identical results to the
    # plain groupBy — oracle proves it; the salt spreads hot keys.
    # The summed column is exact integer cents so the two-phase
    # partial-sum order can never shift a rounding boundary.
    from redshells_spark.operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events").withColumn(
        "__vc", money_units(F.col("value"))
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        {"n": "count", "sum_c": "sum:__vc"},
        num_salts=8,
    )
    return out.select(
        "event_type",
        "n",
        (F.col("sum_c").cast("double") / 100).alias("sum_value"),
    )


@q(
    "approx_distinct_users",
    f"""WITH h AS (SELECT DISTINCT {_duck_h60("user_id")} AS h FROM events),
       kept AS (SELECT h FROM h ORDER BY h ASC LIMIT 256),
       a AS (SELECT count(*)::BIGINT AS n_hashes, max(h) AS hk FROM kept),
       x AS (SELECT count(DISTINCT user_id)::BIGINT AS n_exact FROM events)
       SELECT a.n_hashes, x.n_exact,
              round(CASE WHEN a.n_hashes < 256 THEN a.n_hashes::DOUBLE
                    ELSE 255.0 * 1152921504606846976.0 / hk::DOUBLE END, 4)
                  AS approx_users
       FROM a, x""",
)
def _approx_distinct_users(spark, sf_dir):
    """Approximate global distinct-user count via the portable KMV
    sketch (operators/sketches.py kmv_distinct_global): 256 smallest
    md5-rank hashes found with a distributed sort+limit (TakeOrdered —
    no global window), estimate (k−1)·2⁶⁰/h_k. The engine-private HLL
    (`F.approx_count_distinct`) remains the API default at scale; this
    registry entry uses the estimator the DuckDB oracle reproduces
    bit-for-bit, with the exact count riding along to show the error."""
    from redshells_spark.operators.sketches import kmv_distinct_global

    ev = _t(spark, sf_dir, "events")
    sk = kmv_distinct_global(ev, "user_id", k=256)
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return sk.crossJoin(exact).select(
        "n_hashes",
        F.col("n_exact").cast("long").alias("n_exact"),
        _r4(F.col("kmv_estimate"), "approx_users"),
    )


@q("classifier_predictions")  # MLlib fit → rows-only
def _classifier_predictions(spark, sf_dir):
    from redshells_spark.ml.classifiers import train_classifier

    li = _t(spark, sf_dir, "lineitem")
    data = li.select(
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax",
    )
    model = train_classifier(
        data, ["l_quantity", "l_extendedprice", "l_tax"], "y", "LogisticRegression"
    )
    return model.transform(data).select("l_orderkey", "l_linenumber", "prediction")


@q("pairwise_similarity_predictions")  # Hadamard features + classifier → rows-only
def _pairwise_similarity_predictions(spark, sf_dir):
    from redshells_spark.ml.pairwise import (
        predict_pairwise_similarity,
        train_pairwise_similarity,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("item_id_0"),
            F.col("b.vec_id").alias("item_id_1"),
            F.when(F.col("a.label") == F.col("b.label"), 1).otherwise(0).alias("similarity"),
        )
    )
    model = train_pairwise_similarity(pairs, emb, "LogisticRegression")
    return predict_pairwise_similarity(
        model, pairs.select("item_id_0", "item_id_1"), emb
    ).select("item_id_0", "item_id_1", "prediction")


@q("fm_predictions")  # FMClassifier CTR pipeline → rows-only
def _fm_predictions(spark, sf_dir):
    from redshells_spark.ml.factorization_machine import train_factorization_machine

    ev = _t(spark, sf_dir, "events")
    data = ev.select(
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        F.col("value").alias("I1"),
        (F.col("user_id") % 20).cast("string").alias("C1"),
    ).na.fill(0)
    model = train_factorization_machine(
        data, ["I1"], ["C1"], embedding_size=4, max_iter=5
    )
    return model.transform(data).select("event_id", "prediction")


@q("gcmc_predictions")  # driver-trained numpy GCMC → rows-only
def _gcmc_predictions(spark, sf_dir):
    from redshells_spark.ml.gcmc import build_gcmc_dataset, train_gcmc

    li = _t(spark, sf_dir, "lineitem")
    ratings = (
        li.select(
            F.col("l_suppkey").cast("int").alias("user_id"),
            F.col("l_partkey").cast("int").alias("item_id"),
            F.when(F.col("l_quantity") > 25, 2.0).otherwise(1.0).alias("rating"),
        )
        .dropDuplicates(["user_id", "item_id"])
        .limit(20000)
    )
    edges, user_map, item_map = build_gcmc_dataset(ratings, test_size=0.1)
    model = train_gcmc(
        edges, user_map.count(), item_map.count(),
        encoder_hidden=16, encoder_size=8, epochs=20,
    )
    return model.predict(edges.filter(~F.col("is_train")))


@q("gcmc_feature_cold_start")  # driver-trained numpy GCMC → rows-only
def _gcmc_feature_cold_start(spark, sf_dir):
    """GCMC with item side features (reference cross-feature layers,
    graph_convolutional_matrix_completion.py:128-142): embeddings for
    NEW items known only by features; identical features → identical
    embeddings (l2 distance 0 between the two clones)."""
    import numpy as np

    from redshells_spark.ml.gcmc import build_gcmc_dataset, features_matrix, train_gcmc

    li = _t(spark, sf_dir, "lineitem")
    ratings = (
        li.select(
            F.col("l_suppkey").cast("int").alias("user_id"),
            F.col("l_partkey").cast("int").alias("item_id"),
            F.when(F.col("l_quantity") > 25, 2.0).otherwise(1.0).alias("rating"),
        )
        .dropDuplicates(["user_id", "item_id"])
        .limit(5000)
    )
    edges, user_map, item_map = build_gcmc_dataset(ratings, test_size=0.1)
    feats = item_map.select(
        "item_id",
        F.array(
            (F.col("item_id") % 7).cast("double"), (F.col("item_id") % 3).cast("double")
        ).alias("features"),
    )
    fmat = features_matrix(item_map, feats, "item_id")
    model = train_gcmc(
        edges, user_map.count(), item_map.count(),
        encoder_hidden=16, encoder_size=8, epochs=15, item_features=fmat,
    )
    # DISTRIBUTED cold-start scoring: embeddings for new items computed
    # by an Arrow batch map over broadcast cross-feature weights — the
    # inference path scales with the cluster even though training is
    # driver-capped (reference parity boundary)
    new_items = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, [3.0, 1.0])],
        "new_item int, features array<double>",
    )
    emb_df = model.item_embeddings_df(new_items, "new_item", "features")
    first = F.first(F.col("embedding")).over(
        Window.orderBy("new_item").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        emb_df.withColumn(
            "l1_norm",
            F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + F.abs(x)), 4),
        )
        .withColumn(
            "clone_gap",
            F.sqrt(
                F.aggregate(
                    F.zip_with("embedding", first, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        )
        .select("new_item", "l1_norm", "clone_gap")
    )


@q("feature_aggregation_similarity")  # driver-trained → rows-only
def _feature_aggregation_similarity(spark, sf_dir):
    from redshells_spark.ml.feature_aggregation import (
        train_feature_aggregation_similarity,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # synthesize indexed feature pairs from consecutive embedding rows
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").cast("int").alias("x_item_index"),
            F.col("b.vec_id").cast("int").alias("y_item_index"),
            F.array(
                (F.col("a.vec_id") % 20 + 1).cast("int"),
                (F.col("a.label") + 1).cast("int"),
            ).alias("x_item_features"),
            F.array(
                (F.col("b.vec_id") % 20 + 1).cast("int"),
                (F.col("b.label") + 1).cast("int"),
            ).alias("y_item_features"),
            F.when(F.col("a.label") == F.col("b.label"), 1.0).otherwise(-0.2).alias("score"),
        )
        .limit(400)
    )
    model = train_feature_aggregation_similarity(pairs, embedding_size=8, epochs=50)
    return model.predict(pairs).select(
        "x_item_index", "y_item_index", F.round("similarity", 4).alias("similarity")
    )


@q("quality_classifier_scores")  # MLlib LR fit → rows-only
def _quality_classifier_scores(spark, sf_dir):
    """Trainable quality model (text/quality_model.py, CCNet-style):
    weak labels from language id (en vs rest — a learnable bag-of-words
    signal), HashingTF→IDF→LR fit, distributed scoring of every doc."""
    from redshells_spark.text.quality_model import (
        score_quality,
        train_quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = tokenize_on_space(docs, "text", "tokens", lowercase=True).withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    model = train_quality_classifier(labeled, num_features=1 << 14)
    return score_quality(model, labeled).select(
        "doc_id", F.round("quality_prob", 4).alias("quality_prob")
    )


# ------------------------------------------- temporal / analytic windows


@q(
    "asof_join_orders",
    """WITH r AS (
         SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS rt_us,
                max(o_orderkey) AS matched_order,
                round(arg_max(o_totalprice, o_orderkey), 4) AS matched_totalprice
         FROM orders GROUP BY 1, 2)
       SELECT e.event_id, e.user_id, r.matched_order, r.matched_totalprice
       FROM events e ASOF JOIN r
         ON e.user_id = r.user_id AND epoch_us(e.ts) >= r.rt_us""",
)
def _asof_join_orders(spark, sf_dir):
    """As-of join (operators/asof.py): each event picks the customer's
    most recent order at-or-before the event time. Spark plan = tagged
    union + ONE shuffle on the key + ordered-window carry-forward (no
    join explosion); oracle = DuckDB's native ASOF JOIN — two
    independent machineries, same rows. Right side pre-aggregated to
    one row per (key, time) so the match is deterministic."""
    from redshells_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id", event_us(ev, "ts").alias("ts_us"))
    o = _t(spark, sf_dir, "orders")
    r = (
        o.withColumn("user_id", F.col("o_custkey"))
        .withColumn("rt_us", event_us(o, "o_orderdate"))
        .groupBy("user_id", "rt_us")
        .agg(
            F.max("o_orderkey").alias("matched_order"),
            F.round(F.max_by("o_totalprice", "o_orderkey"), 4).alias("matched_totalprice"),
        )
    )
    out = asof_join(ev, r, on="user_id", left_time="ts_us", right_time="rt_us")
    return out.select("event_id", "user_id", "matched_order", "matched_totalprice")


_PRICE_BANDS = [
    (0, 0.0, 2000.0),
    (1, 2000.0, 5000.0),
    (2, 5000.0, 10000.0),
    (3, 10000.0, 20000.0),
    (4, 20000.0, 40000.0),
    (5, 40000.0, 70000.0),
    (6, 70000.0, 110000.0),
]


@q(
    "range_join_price_bands",
    """WITH b(band_id, lo, hi) AS (VALUES """
    + ", ".join(
        f"(CAST({i} AS BIGINT), {lo}, {hi})" for i, lo, hi in _PRICE_BANDS
    )
    + """)
       SELECT b.band_id, count(*) AS n_items,
              """
    + _MONEY_SUM("l.l_extendedprice")
    + """ AS sum_price
       FROM lineitem l JOIN b
         ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
       GROUP BY 1""",
)
def _range_join_price_bands(spark, sf_dir):
    """Bucketed range join (operators/asof.py:range_join): intervals
    explode into coarse buckets, points equi-join on the bucket id with
    an exact residual filter — a shuffled hash join, never a
    BroadcastNestedLoopJoin (plan-asserted in tests/test_asof_range.py).
    Oracle = DuckDB inequality join."""
    from redshells_spark.operators.asof import range_join

    bands = spark.createDataFrame(_PRICE_BANDS, "band_id bigint, lo double, hi double")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    joined = range_join(li, bands, "l_extendedprice", "lo", "hi", bucket_width=10000.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


@q(
    "orders_grouping_sets",
    f"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n_orders, {_MONEY_SUM('o_totalprice')} AS sum_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), (o_orderpriority), ())""",
)
def _orders_grouping_sets(spark, sf_dir):
    """GROUPING SETS — free in Catalyst (one Expand + one aggregate,
    partial aggregation preserved), identical SQL runs on DuckDB.
    The price sum is exact integer cents (order-free across the
    Expand's partial aggregation)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                  coalesce(o_orderpriority, 'ALL') AS priority,
                  count(*) AS n_orders,
                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)) AS DOUBLE) / 100 AS sum_price
           FROM __gs_orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), (o_orderpriority), ())"""
    )


@q(
    "cumulative_revenue",
    """SELECT o_orderkey, o_custkey,
              CAST(row_number() OVER w AS BIGINT) AS order_seq,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_revenue,
              round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
)
def _cumulative_revenue(spark, sf_dir):
    """Running totals + moving average over an ordered frame: the
    accumulation order is pinned by the frame, so doubles fold in the
    same sequence on both engines — bit-identical before rounding."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        _r4(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            "cum_revenue",
        ),
        _r4(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), "moving_avg_3"),
    )


