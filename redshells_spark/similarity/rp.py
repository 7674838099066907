"""Random-projection (Johnson-Lindenstrauss) dimensionality reduction
for ANN prefiltering.

Achlioptas 2003 ("Database-friendly random projections"): a ±1 sign
matrix preserves pairwise inner products in expectation with variance
O(1/d') — no Gaussians needed — so projecting 64-d embeddings to d'
dims gives a 4× (d'=16) cheaper first-pass scorer whose top-k' can be
re-ranked exactly, the same coarse→fine shape as the repo's
binary-Hamming and PQ stages. At 100 TB the projection is one
map-side pass (no shuffle) and shrinks every downstream byte.

Determinism: the sign matrix is derived from md5 in PYTHON at plan
time and embedded as array literals — fixed (d', d) constants, not
data-dependent — so Spark and the DuckDB oracle fold the exact same
doubles in the exact same order (`dot_product` and `list_dot_product`
are both sequential left-to-right, already hash-MATCH-proven).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import dot_product


def jl_signs(out_dim: int, in_dim: int, seed: int = 31) -> list[list[float]]:
    """±1.0 sign matrix rows, md5-derived — identical constants for
    the Spark plan and the SQL oracle."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    in_dim: int,
    embedding_column: str = "embedding",
    out_column: str = "proj",
    seed: int = 31,
) -> DataFrame:
    """Append ``out_column``: the d'-dim ±1 projection of
    ``embedding_column`` (array<double>, one sequential dot per output
    dim — pure codegen, no shuffle)."""
    signs = jl_signs(out_dim, in_dim, seed)
    proj = F.array(
        *[
            dot_product(
                embedding_column, F.array(*[F.lit(s) for s in row])
            )
            for row in signs
        ]
    )
    return df.withColumn(out_column, proj)


def jl_signs_sql(out_dim: int, in_dim: int, emb_sql: str, seed: int = 31) -> str:
    """DuckDB mirror of :func:`project_embeddings`'s projection: a
    ``[list_dot_product(...), ...]`` literal-array expression."""
    signs = jl_signs(out_dim, in_dim, seed)
    dots = ", ".join(
        f"list_dot_product({emb_sql}::DOUBLE[], "
        f"[{', '.join(repr(s) for s in row)}]::DOUBLE[])"
        for row in signs
    )
    return f"[{dots}]"
