from redshells_spark.dedup.exact import exact_dedup
from redshells_spark.dedup.minhash import (
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_near_dedup,
)
from redshells_spark.dedup.ngram import ngram_jaccard_pairs
from redshells_spark.dedup.simhash import simhash_signatures, simhash_near_dup_pairs
from redshells_spark.dedup.embedding import embedding_near_dup_pairs

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_dedup",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
]
