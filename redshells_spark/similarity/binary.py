"""Binary (1-bit) embedding quantization + Hamming-distance retrieval.

The third rung of the quantization ladder (float32 → int8
(similarity/quantize.py) → 1 bit here): sign-bit codes pack a
``dim``-float vector into ``ceil(dim/32)`` int64 words — 32× smaller
than float32 — and Hamming distance between codes approximates angular
distance (Charikar 2002 SimHash/hyperplane-LSH bound:
P[bit differs] = θ/π). The standard deployment is binary codes as a
coarse first stage over the WHOLE corpus (bit_count(xor) is a handful
of cycles per word, fully inside whole-stage codegen) with an exact or
int8 re-rank of the surviving candidates — at 100 TB the float corpus
never leaves parquet except for the re-rank fetch.

Every step is integer arithmetic on sign tests, so codes, distances,
and rankings are bit-identical cross-engine and DuckDB-oracle-checked.
Bits pack 32 per word (not 64) so ``1 << bit`` never touches the int64
sign bit — no overflow semantics to reconcile across engines.

No reference counterpart (SURVEY §2 beyond-reference similarity tier);
cf. Faiss IndexBinaryFlat for the shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

BITS_PER_WORD = 32


def binary_code_words(vector_column: str, dim: int) -> Column:
    """→ array<long> of ⌈dim/32⌉ words; bit b of word j is set iff
    component 32j+b > 0. Emitted as FLAT per-word sums of explicit
    IF terms (not lambda aggregates): higher-order array functions run
    interpreted per row (~270 µs/row measured), while the flat tree
    stays inside whole-stage codegen — the difference between a
    projection and a bottleneck on a 100 TB corpus."""
    n_words = (dim + BITS_PER_WORD - 1) // BITS_PER_WORD
    words = []
    for j in range(n_words):
        terms = [
            f"IF(element_at(`{vector_column}`, {j * BITS_PER_WORD + b + 1}) > 0,"
            f" {1 << b}L, 0L)"
            for b in range(min(BITS_PER_WORD, dim - j * BITS_PER_WORD))
        ]
        words.append(" + ".join(terms))
    return F.expr("array(" + ", ".join(words) + ")")


def binary_quantize(
    emb: DataFrame,
    dim: int,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> DataFrame:
    """→ (id, words, n_pos): packed sign codes and the positive-bit
    population count (an exact per-vector checksum pinning every bit)."""
    require_columns(emb, [id_column, vector_column])
    n_words = (dim + BITS_PER_WORD - 1) // BITS_PER_WORD
    out = emb.select(
        id_column, binary_code_words(vector_column, dim).alias("words")
    )
    popcnt = F.expr(
        " + ".join(
            f"CAST(bit_count(element_at(words, {j + 1})) AS BIGINT)"
            for j in range(n_words)
        )
    )
    return out.withColumn("n_pos", popcnt)


def hamming_distance(a: str, b: str, n_words: int) -> Column:
    """Hamming distance between two packed-word array columns — a flat
    sum of per-word bit_count(xor) terms (codegen; this sits in the
    corpus × queries hot loop)."""
    return F.expr(
        " + ".join(
            f"CAST(bit_count(element_at(`{a}`, {j + 1})"
            f" ^ element_at(`{b}`, {j + 1})) AS BIGINT)"
            for j in range(n_words)
        )
    )


def hamming_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    n_words: int,
    k: int = 10,
    id_column: str = "vec_id",
    query_id_column: str = "query_id",
) -> DataFrame:
    """→ (query_id, vec_id, hamming, rn): the k corpus codes nearest
    each query code by Hamming distance (ties broken on id — fully
    deterministic ranking).

    Scale shape: the query table broadcasts (queries ≪ corpus), the
    corpus streams through ONE codegen stage of xor+popcount, and the
    per-query top-k is a WindowGroupLimit — no shuffle of the corpus
    beyond the final k·|Q| rows. This is the 100 TB first-stage filter;
    re-rank survivors with exact cosine or the int8 codes."""
    from pyspark.sql import Window

    q = query_codes.select(
        F.col(id_column).alias(query_id_column),
        F.col("words").alias("__qw"),
    )
    scored = corpus_codes.crossJoin(F.broadcast(q)).select(
        query_id_column,
        id_column,
        hamming_distance("words", "__qw", n_words).alias("hamming"),
    )
    w = Window.partitionBy(query_id_column).orderBy(
        F.col("hamming").asc(), F.col(id_column).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(query_id_column, id_column, "hamming", "rn")
    )
