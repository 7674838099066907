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


def event_range_filter(
    df: DataFrame,
    col: str,
    lo_us: int | None = None,
    hi_us: int | None = None,
) -> Column:
    """Half-open range predicate ``lo_us <= col < hi_us`` expressed on
    the RAW column so it pushes down to the parquet scan.

    ``event_us(df, col) >= lo`` wraps the column in ``unix_micros`` —
    a predicate on an expression, which the scan cannot evaluate; the
    filter then runs post-scan and reads every row group. This helper
    instead compares the untouched column against a literal of the
    column's OWN type (int nanos / TIMESTAMP / TIMESTAMP_NTZ / DATE),
    so explain shows ``PushedFilters: [GreaterThanOrEqual(col, ...)]``
    and row-group statistics prune — at 100 TB on a date-partitioned
    layout this is the difference between scanning a month and
    scanning the decade. Bounds must be whole seconds (date cutoffs)."""
    import datetime as _d

    dt = _dtype(df, col)
    conds: list[Column] = []
    if dt in _INT_TYPES:
        if lo_us is not None:
            conds.append(F.col(col) >= lo_us * 1000)
        if hi_us is not None:
            conds.append(F.col(col) < hi_us * 1000)
    else:
        kw = {"timestamp_ntz": "TIMESTAMP_NTZ", "date": "DATE"}.get(dt, "TIMESTAMP")

        def _lit(us: int) -> Column:
            t = _d.datetime.fromtimestamp(us / 1_000_000, tz=_d.timezone.utc)
            s = t.strftime("%Y-%m-%d" if kw == "DATE" else "%Y-%m-%d %H:%M:%S")
            return F.expr(f"{kw} '{s}'")

        if lo_us is not None:
            conds.append(F.col(col) >= _lit(lo_us))
        if hi_us is not None:
            conds.append(F.col(col) < _lit(hi_us))
    if not conds:
        raise ValueError("event_range_filter needs at least one bound")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def event_us(df: DataFrame, col: str = "ts") -> Column:
    """Event time as **microseconds since epoch** (long), dtype-dispatched.

    Matches DuckDB ``epoch_us(col)`` for timestamp inputs (naive-as-UTC)
    and ``col // 1000`` for long-nano inputs.
    """
    dt = _dtype(df, col)
    if dt in _INT_TYPES:
        return F.expr(f"cast(`{col}` as bigint) div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))
