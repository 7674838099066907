from redshells_spark.similarity.ann import (
    brute_force_topk,
    lsh_hyperplane_signatures,
    lsh_topk,
    ivf_build_index,
    ivf_topk,
)

__all__ = [
    "brute_force_topk",
    "lsh_hyperplane_signatures",
    "lsh_topk",
    "ivf_build_index",
    "ivf_topk",
]
