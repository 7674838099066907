from redshells_spark.operators.aggregates import (
    distinct_count,
    feature_importance_sumsq,
    group_count_filter,
    min_max_avg_std,
    sum_embeddings_by_key,
    value_counts_id_map,
)
from redshells_spark.operators.joins import (
    anti_join_negative_sampling,
    blocked_pairwise_similarity,
    cartesian_product_scoring,
    keyword_match_join,
    lookup_join_embedding,
    semi_join_isin,
)
from redshells_spark.operators.topk import (
    per_group_topk,
    topk_threshold_similarity,
)

__all__ = [
    "distinct_count",
    "feature_importance_sumsq",
    "group_count_filter",
    "min_max_avg_std",
    "sum_embeddings_by_key",
    "value_counts_id_map",
    "anti_join_negative_sampling",
    "blocked_pairwise_similarity",
    "cartesian_product_scoring",
    "keyword_match_join",
    "lookup_join_embedding",
    "semi_join_isin",
    "per_group_topk",
    "topk_threshold_similarity",
]
