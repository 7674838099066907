"""Column profiling: one job, long-format stats for any column set.

The data-quality primitive every ingest pipeline runs before trusting a
new drop: null rates, distinct cardinalities, numeric ranges/means,
string extremes. One wide aggregation computes every statistic for
every requested column in a single pass over the data (Catalyst plans
the multi-distinct via Expand — still one scan), and the bounded
one-row result is reshaped driver-side into long format (one row per
column) so downstream checks can join/diff profiles across drops.

Scale: the scan is the cost; stats are all map-side-combinable except
the exact distinct counts, whose Expand multiplies rows by the number
of profiled columns — profile the columns you need, not ``*``. (For
web-scale distinct counts swap in `operators/sketches.py:kmv_distinct`.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns

_NUM_DTYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long", "float", "double"}


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """→ one row per profiled column:
    (column, dtype, n_rows, n_nulls, n_distinct,
     min_num, max_num, avg_num,   — numeric columns, else NULL
     min_str, max_str)            — string columns, else NULL
    """
    require_columns(df, columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if dtypes[c] in _NUM_DTYPES:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"__avg_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__smax_{c}"))
    row = df.agg(*aggs).first()  # bounded: one row, ~5 stats per column

    out = []
    for c in columns:
        numeric = dtypes[c] in _NUM_DTYPES
        out.append(
            (
                c,
                dtypes[c],
                row["__n"],
                row[f"__nulls_{c}"],
                row[f"__nd_{c}"],
                row[f"__min_{c}"] if numeric else None,
                row[f"__max_{c}"] if numeric else None,
                row[f"__avg_{c}"] if numeric else None,
                None if numeric else row[f"__smin_{c}"],
                None if numeric else row[f"__smax_{c}"],
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, n_distinct long, "
        "min_num double, max_num double, avg_num double, min_str string, max_str string",
    )
