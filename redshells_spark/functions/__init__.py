from redshells_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    elementwise_product,
    elementwise_sum,
    l2_norm,
    l2_normalize,
    scale_vector,
)
from redshells_spark.functions.scalar import (
    clip,
    fillna_zero,
    log_transform,
    string_format_category,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "elementwise_product",
    "elementwise_sum",
    "l2_norm",
    "l2_normalize",
    "scale_vector",
    "clip",
    "fillna_zero",
    "log_transform",
    "string_format_category",
]
