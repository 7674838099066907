"""Tokenization — reference splits lazily on single spaces
(``train/utils/token_iterator.py:20``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def tokenize_on_space(
    df: DataFrame,
    text_column: str = "text",
    output_column: str = "tokens",
    lowercase: bool = False,
    drop_empty: bool = True,
) -> DataFrame:
    """``str.split(' ')`` as a Catalyst expression. ``drop_empty``
    removes empty tokens produced by repeated/leading spaces (the
    reference keeps them; gensim's Dictionary would count them — we
    drop and document the delta)."""
    require_columns(df, [text_column])
    src = F.lower(F.col(text_column)) if lowercase else F.col(text_column)
    toks = F.split(src, " ")
    if drop_empty:
        toks = F.filter(toks, lambda t: t != "")
    return df.withColumn(output_column, toks)
