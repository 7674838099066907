"""Dtype-dispatched event-time normalization.

The driver's testdata has shipped ``events.ts`` (and
``orders.o_orderdate``) under two different physical types across
rounds: parquet TIMESTAMP(NANOS) read as **long nanoseconds** (under
``spark.sql.legacy.parquet.nanosAsLong``) and parquet ``timestamp[us]``
read as **TIMESTAMP_NTZ**. A SQL-level ``CASE WHEN ... cast(ts as
bigint)`` guard cannot bridge the two: Spark's analyzer type-checks
*both* branches at plan time, so the bigint cast fails on an NTZ column
even when that branch can never execute
(``DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION``).

The fix is to dispatch in Python on the column's *actual* dtype
(``dict(df.dtypes)[col]``) and emit only the expression that is valid
for it. All timestamp arithmetic is normalized through TIMESTAMP under
a UTC session timezone, so NTZ values (naive wall-clock, which DuckDB's
``epoch_us`` also treats as UTC) convert losslessly.

These helpers are the single sanctioned way to touch an event-time
column anywhere in the engine; grep for ``cast(ts as bigint)`` should
return nothing outside this docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"bigint", "long", "int", "integer"}


def _dtype(df: DataFrame, col: str) -> str:
    try:
        return dict(df.dtypes)[col]
    except KeyError:
        raise KeyError(f"column {col!r} not in {df.columns}") from None


def event_ts(df: DataFrame, col: str = "ts") -> Column:
    """Event time as a proper TIMESTAMP column, whatever the source dtype.

    - long/bigint: interpreted as **nanoseconds** since epoch (the
      legacy ``nanosAsLong`` read of parquet TIMESTAMP(NANOS)); integer
      ``div`` keeps full precision — float division on ~1e18 ns longs
      is lossy.
    - timestamp / timestamp_ntz / date: cast to TIMESTAMP (identity for
      timestamp; NTZ/date are reinterpreted under the session timezone,
      which the engine pins to UTC — see session.py).
    """
    dt = _dtype(df, col)
    if dt in _INT_TYPES:
        return F.timestamp_micros(F.expr(f"cast(`{col}` as bigint) div 1000"))
    return F.col(col).cast("timestamp")


def event_us(df: DataFrame, col: str = "ts") -> Column:
    """Event time as **microseconds since epoch** (long), dtype-dispatched.

    Matches DuckDB ``epoch_us(col)`` for timestamp inputs (naive-as-UTC)
    and ``col // 1000`` for long-nano inputs.
    """
    dt = _dtype(df, col)
    if dt in _INT_TYPES:
        return F.expr(f"cast(`{col}` as bigint) div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))
