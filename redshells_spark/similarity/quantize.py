"""Scalar int8 quantization for embedding columns.

The storage/serving companion to the ANN tier (similarity/ann.py,
similarity/pq.py): symmetric per-dimension int8 codes
``code = round_half_up(x * 127 / absmax_dim)`` quantize a float
embedding column 4× smaller with bounded reconstruction error — the
standard preprocessing step before shipping vectors to an index or an
inference fleet.

Scale design: one posexplode + one groupBy(dim) produces the
``dim``-row absmax table (tiny — embedding width, not corpus size),
which broadcasts back onto the exploded relation; codes and
reconstruction error are then pure codegen. The corpus shuffles once
(on id, to re-assemble vectors). Everything is fixed-expression
arithmetic (floor(x*127/absmax + 0.5)), so codes are bit-identical
cross-engine and the whole operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_absmax(
    emb: DataFrame, id_column: str = "vec_id", vector_column: str = "embedding"
) -> DataFrame:
    """→ (dim, absmax): per-dimension max |x| over the corpus."""
    x = emb.select(
        id_column, F.posexplode(vector_column).alias("dim", "x")
    ).select("dim", F.abs(F.col("x").cast("double")).alias("ax"))
    return x.groupBy("dim").agg(F.max("ax").alias("absmax"))


def int8_quantize(
    emb: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    absmax: DataFrame | None = None,
) -> DataFrame:
    """→ (id, dim, x, code, recon): per-component int8 codes and their
    dequantized values. Pass a precomputed ``absmax`` table to reuse
    training-corpus scales at serving time (the production path);
    otherwise scales come from ``emb`` itself."""
    if absmax is None:
        absmax = embedding_absmax(emb, id_column, vector_column)
    x = emb.select(
        id_column, F.posexplode(vector_column).alias("dim", "xf")
    ).select(id_column, "dim", F.col("xf").cast("double").alias("x"))
    code_raw = F.floor(F.col("x") * F.lit(127) / F.col("absmax") + F.lit(0.5))
    code = (
        F.when(F.col("absmax") > 0, F.greatest(F.least(code_raw, F.lit(127)), F.lit(-127)))
        .otherwise(F.lit(0))
        .cast("long")
    )
    out = x.join(F.broadcast(absmax), "dim").withColumn("code", code)
    return out.withColumn(
        "recon",
        F.when(F.col("absmax") > 0, (F.col("code") * F.col("absmax")) / F.lit(127))
        .otherwise(F.lit(0.0)),
    )


def int8_reconstruction_report(
    emb: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """→ (id, code_sum, code_l1, err_e8): per-vector integer code
    checksums (exact — they pin every code) and the squared
    reconstruction error as a sum of PER-COMPONENT 1e-8 fixed-point
    terms (floor(e²·1e8 + 0.5) each, then an integer sum). Rounding
    before the sum makes the export genuinely order-free: integer
    addition is associative, so partition order can never flip a .5
    boundary the way a floored double sum could."""
    q = int8_quantize(emb, id_column, vector_column)
    err = F.col("x") - F.col("recon")
    e2_e8 = F.floor(err * err * F.lit(100_000_000.0) + F.lit(0.5)).cast("long")
    per = q.select(id_column, "code", e2_e8.alias("e2_e8"))
    return per.groupBy(id_column).agg(
        F.sum("code").alias("code_sum"),
        F.sum(F.abs(F.col("code"))).alias("code_l1"),
        F.sum("e2_e8").alias("err_e8"),
    )
