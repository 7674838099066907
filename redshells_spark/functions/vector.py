"""Vector (array<float/double>) column expressions — all JVM-side.

Re-expresses the reference's numpy vector math as Catalyst higher-order
functions so they run inside whole-stage codegen with no Python
boundary:

- dot product: reference ``np.inner`` / ``np.dot``
  (``app/word_item_similarity/calculate_word_item_similarity.py:56``,
  ``filter_item_by_word_similarity.py:35``)
- elementwise (Hadamard) product: pair features for the pairwise
  similarity trainer (``train/train_pairwise_similarity_model.py:51-54``)
- L2 normalize: ``model/scdv.py:71,138``,
  ``app/word_item_similarity/calculate_word_embedding.py:35``

All functions cast to double first: testdata embeddings are
``array<float>`` and float accumulation is not associative enough for
cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def elementwise_product(a: Column | str, b: Column | str) -> Column:
    """Hadamard product of two vectors → array<double>."""
    return F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y)


def elementwise_sum(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_dbl(a), _dbl(b), lambda x, y: x + y)


def scale_vector(a: Column | str, s: Column | float) -> Column:
    sc = F.lit(s) if isinstance(s, (int, float)) else s
    return F.transform(_dbl(a), lambda x: x * sc)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column | str, eps: float = 1e-12) -> Column:
    """v / max(||v||₂, eps); zero vectors stay zero (reference divides
    by norm and would NaN — we keep the safer convention and document
    the delta)."""
    norm = l2_norm(a)
    return F.transform(_dbl(a), lambda x: x / F.greatest(norm, F.lit(eps)))


def cosine_similarity(a: Column | str, b: Column | str, eps: float = 1e-12) -> Column:
    return dot_product(a, b) / (
        F.greatest(l2_norm(a), F.lit(eps)) * F.greatest(l2_norm(b), F.lit(eps))
    )
