"""Character/word n-gram Jaccard similarity — the brute verification
metric behind near-dedup; exposed standalone for small candidate sets
and as the SQL-oracle-friendly similarity definition."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def word_ngrams(tokens: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams as '␟'-joined strings (array expression,
    no explode)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_distinct(
        F.filter(
            F.transform(
                t,
                lambda _, i: F.when(
                    i + n <= F.size(t),
                    F.concat_ws("␟", F.slice(t, i + 1, n)),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def jaccard(a: Column | str, b: Column | str) -> Column:
    """|A∩B| / |A∪B| of two array columns (distinct semantics)."""
    ac = F.array_distinct(F.col(a) if isinstance(a, str) else a)
    bc = F.array_distinct(F.col(b) if isinstance(b, str) else b)
    inter = F.size(F.array_intersect(ac, bc))
    union = F.size(ac) + F.size(bc) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    doc_id_column: str = "doc_id",
    tokens_column: str = "tokens",
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Score candidate (doc_id_0, doc_id_1) pairs by word-n-gram
    Jaccard; keep ≥ threshold. Two joins bring the token arrays to the
    pair rows; the Jaccard itself is a codegen array expression —
    no shuffle beyond the joins."""
    require_columns(pairs, ["doc_id_0", "doc_id_1"])
    grams = docs.select(
        F.col(doc_id_column).alias("__id"),
        word_ngrams(tokens_column, n).alias("__grams"),
    )
    return (
        pairs.join(grams.withColumnsRenamed({"__id": "doc_id_0", "__grams": "__g0"}), on="doc_id_0")
        .join(grams.withColumnsRenamed({"__id": "doc_id_1", "__grams": "__g1"}), on="doc_id_1")
        .withColumn("jaccard", jaccard("__g0", "__g1"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_0", "doc_id_1", "jaccard")
    )
