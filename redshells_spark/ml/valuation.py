"""Training-data valuation by exact KNN-Shapley (Jia et al.,
"Efficient Task-Specific Data Valuation for Nearest Neighbor
Algorithms", VLDB 2019).

For a K-NN surrogate model the Shapley value of every training point
has a CLOSED FORM per validation point: sort the training set by
similarity to the validation point (nearest = i=1) and recurse from
the farthest point inward,

    s_N = 1[y_N = y_val] / N
    s_i = s_{i+1} + (1[y_i = y_val] − 1[y_{i+1} = y_val])
          · min(K, i) / (K · i)

so the full valuation is one window per validation point — no model
training, no Monte Carlo. This is the standard cheap proxy for "which
training documents help / hurt" in data-curation pipelines (the same
role TRAK/influence functions play at higher cost).

Relational form: score val×train pairs (|val| is bounded — a
validation set, not a corpus — so the join is broadcast and the total
work is O(|val|·N), linear in the corpus), rank per val point with a
(score, id) total-order tie-break, take each row's per-i term, then a
suffix sum over the rank order.

Exactness discipline: the terms min(K,i)/(K·i) are kept as e12
fixed-point int64 (sign applied AFTER the non-negative integer
division — Spark `div` truncates toward zero while DuckDB `//`
floors, so negative numerators would diverge), making every suffix
sum and the final per-train aggregation exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.functions.vector import dot_product, l2_norm
from redshells_spark.schema import require_columns

E12 = 1_000_000_000_000


def knn_shapley(
    train: DataFrame,
    val: DataFrame,
    k: int = 5,
    id_column: str = "vec_id",
    label_column: str = "label",
    embedding_column: str = "embedding",
    val_id: str = "val_id",
) -> DataFrame:
    """→ (``id_column``, ``label_column``, shapley_e12_sum, n_val):
    each training point's KNN-Shapley value summed over the validation
    points, in exact e12 fixed-point (divide by n_val·1e12 for the
    mean). Positive = the point helps K-NN classify the validation
    set; negative = it actively hurts (mislabeled/near-dup suspects —
    the curation signal)."""
    require_columns(train, [id_column, label_column, embedding_column])
    require_columns(val, [val_id, label_column, embedding_column])
    tn = train.select(
        F.col(id_column).alias("__tid"),
        F.col(label_column).alias("__ty"),
        F.col(embedding_column).alias("__te"),
        F.greatest(l2_norm(embedding_column), F.lit(1e-12)).alias("__tn"),
    )
    vn = val.select(
        F.col(val_id).alias("__vid"),
        F.col(label_column).alias("__vy"),
        F.col(embedding_column).alias("__ve"),
        F.greatest(l2_norm(embedding_column), F.lit(1e-12)).alias("__vn"),
    )
    pairs = tn.crossJoin(F.broadcast(vn)).select(
        "__tid",
        "__ty",
        "__vid",
        (dot_product("__te", "__ve") / (F.col("__tn") * F.col("__vn"))).alias(
            "__score"
        ),
        (F.col("__ty") == F.col("__vy")).cast("long").alias("__ind"),
    )
    w = Window.partitionBy("__vid").orderBy(
        F.col("__score").desc(), F.col("__tid").asc()
    )
    ranked = pairs.select(
        "__tid",
        "__ty",
        "__vid",
        "__ind",
        F.row_number().over(w).alias("__i"),
        F.lead("__ind").over(w).alias("__ind_next"),
    )
    # farthest row: base term ind·E12 div N (N = count over the val
    # partition); inner rows: (ind_i − ind_{i+1})·(min(K,i)·E12 div
    # (K·i)). The diff ∈ {−1,0,1} multiplies a NON-NEGATIVE integer
    # quotient, so truncate-vs-floor division semantics never differ.
    n = F.count(F.lit(1)).over(Window.partitionBy("__vid"))
    diff = F.col("__ind") - F.col("__ind_next")
    quot = F.expr(
        f"cast(least({k}, __i) * {E12} as bigint) div cast({k} * __i as bigint)"
    )
    termed = ranked.withColumn("__n", n).withColumn(
        "__term",
        F.when(
            F.col("__ind_next").isNull(),
            F.expr(f"cast(__ind * {E12} as bigint) div cast(__n as bigint)"),
        )
        .otherwise(diff * quot)
        .cast("long"),
    )
    ws = Window.partitionBy("__vid").orderBy(F.col("__i").asc()).rowsBetween(
        0, Window.unboundedFollowing
    )
    shap = termed.select(
        "__tid", "__ty", F.sum("__term").over(ws).cast("long").alias("__s")
    )
    return shap.groupBy("__tid", "__ty").agg(
        F.sum("__s").cast("long").alias("shapley_e12_sum"),
        F.count(F.lit(1)).cast("long").alias("n_val"),
    ).select(
        F.col("__tid").alias(id_column),
        F.col("__ty").alias(label_column),
        "shapley_e12_sum",
        "n_val",
    )
