"""Scalar column expressions mirroring reference transforms (§2.G)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clip(col: Column | str, lo: float, hi: float) -> Column:
    """Clip predictions to a range (reference
    ``contrib/model/matrix_factorization_model.py:259``,
    ``graph_convolutional_matrix_completion.py:349``). Nulls stay null
    (Spark's greatest/least would otherwise swallow them)."""
    c = _c(col).cast("double")
    return F.when(
        c.isNotNull(), F.least(F.greatest(c, F.lit(float(lo))), F.lit(float(hi)))
    )


def log_transform(col: Column | str, min_value: float) -> Column:
    """Criteo-style shifted log: null → sentinel then ``log(x - min + 2)``
    (reference ``examples/factorization_machine_example.py:69-75``)."""
    shifted = F.coalesce(_c(col).cast("double"), F.lit(float(min_value) - 1.0))
    return F.log(shifted - F.lit(float(min_value)) + F.lit(2.0))


def string_format_category(column_name: str, col: Column | str | None = None) -> Column:
    """Categorical key ``f'{col}_{value}'`` (reference
    ``contrib/model/factorization_machine.py:166,174``)."""
    c = _c(col) if col is not None else F.col(column_name)
    return F.concat_ws("_", F.lit(column_name), c.cast("string"))


def fillna_zero(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """``values.fillna(0)`` (reference ``factorization_machine.py:182``)."""
    return df.na.fill(0, subset=columns)
