from redshells_spark.pipelines.click_train_data import make_click_train_data
from redshells_spark.pipelines.similarity_data import (
    make_similarity_data,
    random_pair_within_group,
    cross_group_negative_pairs,
)
from redshells_spark.pipelines.word_item_similarity import (
    calculate_word_embedding,
    filter_item_by_word_similarity,
    calculate_word_item_similarity,
)

__all__ = [
    "make_click_train_data",
    "make_similarity_data",
    "random_pair_within_group",
    "cross_group_negative_pairs",
    "calculate_word_embedding",
    "filter_item_by_word_similarity",
    "calculate_word_item_similarity",
]
