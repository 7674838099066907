"""Keyword-in-context (KWIC) concordance — the corpus-inspection
primitive behind every "show me how this term is actually used" audit
(quality triage, decontamination review, tokenizer debugging).

One pass: tokenize → posexplode carrying the token array → filter to
the keyword → ``F.slice`` the SAME array for the left/right windows
(no self-join back to positions — the context comes from the array
already in the row). Shuffle-free except the final ordering; output
volume is bounded by match count, not corpus size. Contexts export as
space-joined strings (canonical cross-engine form; array hashing
differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def keyword_in_context(
    docs_tokens: DataFrame,
    keyword: str,
    window: int = 3,
    id_column: str = "doc_id",
    tokens_column: str = "tokens",
) -> DataFrame:
    """→ (doc_id, pos, left_ctx, keyword, right_ctx): every occurrence
    of ``keyword`` with up to ``window`` tokens of context each side
    (0-based ``pos``; contexts space-joined, empty string at doc
    edges)."""
    require_columns(docs_tokens, [id_column, tokens_column])
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    exploded = docs_tokens.select(
        F.col(id_column).alias("doc_id"),
        F.col(tokens_column).alias("__toks"),
        F.posexplode(F.col(tokens_column)).alias("pos", "__tok"),
    ).filter(F.col("__tok") == keyword)
    # F.slice is 1-based; left window starts at max(1, pos+1-window)
    left_start = F.greatest(F.lit(1), F.col("pos") + 1 - window)
    left_len = F.col("pos") + 1 - left_start
    left = F.when(
        left_len > 0, F.slice("__toks", left_start, left_len)
    ).otherwise(F.array().cast("array<string>"))
    right = F.slice("__toks", F.col("pos") + 2, F.lit(window))
    return exploded.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(left, " ").alias("left_ctx"),
        F.lit(keyword).alias("keyword"),
        F.array_join(right, " ").alias("right_ctx"),
    )
