"""Z-order (Morton) interleaved sort keys for multi-dimensional layout.

At 100 TB the cheapest query is the one whose files you never open:
sorting data by a space-filling curve before writing makes parquet
row-group min/max stats selective on EVERY interleaved dimension at
once, so predicate pushdown prunes files for queries on either column
(the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``). Spark has
no built-in; this implements it as pure integer column arithmetic:

1. scale each dimension into [0, 2^bits) with integer math —
   ``(x - min) * (2^bits - 1) div (max - min + 1... )`` — no floats, no
   rounding ambiguity;
2. interleave the bit planes: output bit ``b·ncols + c`` is input
   column c's bit b. The expression is ``ncols × bits`` shift/mask
   terms, all whole-stage codegen;
3. ``repartitionByRange + sortWithinPartitions`` on the key clusters
   the write.

Everything is engine-portable int64 arithmetic, so the DuckDB oracle
evaluates the *same* generated SQL text and the keys hash-MATCH —
layout decisions included in the correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def scale_sql(col_sql: str, vmin: int, vmax: int, bits: int, divop: str = "div") -> str:
    """Integer scaling of ``col_sql`` from [vmin, vmax] into
    [0, 2^bits): floor-div keeps it exact and portable (no float
    rounding anywhere). Degenerate ranges collapse to 0.

    ``divop``: Spark spells integer division ``div``, DuckDB ``//`` —
    same truncation on the non-negative operands used here. All other
    tokens (``>> << & + - *``) parse identically in both engines.
    """
    span = vmax - vmin + 1
    if span <= 1:
        return "0"
    top = (1 << bits) - 1
    # (x - min) in [0, span); * top stays < 2^bits * span ≤ 2^16·span —
    # safe in int64 for any 32-bit-ish source range
    return f"((({col_sql}) - ({vmin})) * {top}) {divop} ({span - 1})"


def interleave_sql(scaled: list[str], bits: int) -> str:
    """Morton interleave of pre-scaled [0, 2^bits) expressions.
    ncols·bits ≤ 62 keeps the key in a signed int64."""
    ncols = len(scaled)
    if ncols * bits > 62:
        raise ValueError(f"zorder: {ncols} cols × {bits} bits exceeds int64")
    terms = [
        f"(((({s}) >> {b}) & 1) << {b * ncols + c})"
        for c, s in enumerate(scaled)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    columns: list[str],
    bits: int = 16,
    key_column: str = "zkey",
    ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Append an int64 Morton key over integer ``columns``.

    ``ranges`` (per-column (min, max)) skips the driver's one-row
    min/max probe — pass them when known (e.g. from table stats).
    Null dimension values are rejected loudly: a null would need an
    arbitrary curve position, which silently breaks clustering.
    """
    require_columns(df, columns)
    if ranges is None:
        aggs = []
        for c in columns:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = df.agg(*aggs).first()  # one-row bounded probe
        ranges = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in columns}
    for c in columns:
        mn, mx = ranges[c]
        if mn is None:
            raise ValueError(f"zorder: column {c!r} is all-null or empty input")
    scaled = [
        scale_sql(f"cast(`{c}` as bigint)", int(ranges[c][0]), int(ranges[c][1]), bits)
        for c in columns
    ]
    null_guard = None
    for c in columns:
        cond = F.col(c).isNull()
        null_guard = cond if null_guard is None else null_guard | cond
    keyed = df.withColumn(
        key_column,
        F.when(
            null_guard,
            F.raise_error(F.lit(f"zorder: null in dimension column {columns}")),
        ).otherwise(F.expr(interleave_sql(scaled, bits))),
    )
    return keyed


def write_zordered(
    df: DataFrame,
    path: str,
    columns: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Cluster-and-write: range-partition on the Morton key (one
    shuffle sized to ``num_files``), sort within partitions, drop the
    key, write parquet. Row-group min/max stats on the interleaved
    dimensions become selective for pushdown on any of them."""
    keyed = with_zorder_key(df, columns, bits=bits)
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "zkey")
    else:
        keyed = keyed.repartitionByRange("zkey")
    keyed.sortWithinPartitions("zkey").drop("zkey").write.mode("overwrite").parquet(path)


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    size_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction plan: assign files (in path order) to
    output bins of ~``target_bytes`` each.

    Bin id = exclusive-prefix-sum(bytes) div target — the streaming
    first-fit assignment: a bin closes once the files before the next
    one already cover its target. Deterministic, one window pass, and
    expressible as identical integer arithmetic in any engine.

    → (bin, n_files, total_bytes, first_path, last_path), one row per
    planned output file.

    Scale note: this plans over the FILE MANIFEST (per-file metadata —
    even 100 TB of 128 MB files is under a million rows), not the
    data, so the single global-order window is a metadata operation.
    The rewrite itself then processes each bin independently. Callers
    compacting multiple table partitions should add the partition
    columns to ``files`` and plan per partition (partitionBy window)
    so bins never span partition boundaries.
    """
    if target_bytes < 1:
        raise ValueError("plan_compaction: target_bytes must be >= 1")
    w = Window.orderBy(path_col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    # integer div, not float-divide-and-cast: exact at any corpus size
    planned = files.withColumn("__prefix", prefix).withColumn(
        "bin", F.expr(f"__prefix div {int(target_bytes)}")
    )
    return planned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.min(path_col).alias("first_path"),
        F.max(path_col).alias("last_path"),
    )
