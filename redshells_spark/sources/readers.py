"""Sources / sinks — §2.A of SURVEY.md.

Format readers mirroring the reference's example ingests, re-expressed
as declarative scans (schema projection + pushdown) instead of
driver-side line loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_existing_file(
    spark: SparkSession, file_path: str, fmt: str | None = None, **options
) -> DataFrame:
    """Expose a pre-existing file; error if missing (reference
    ``LoadExistingFile``, ``data/load_existing_file.py:5-14``)."""
    if not os.path.exists(file_path):
        raise FileNotFoundError(file_path)
    if fmt is None:
        ext = os.path.splitext(file_path)[1].lstrip(".").lower()
        fmt = {"parquet": "parquet", "csv": "csv", "tsv": "csv", "txt": "text", "json": "json"}.get(
            ext, "parquet"
        )
        if ext == "tsv":
            options.setdefault("sep", "\t")
    return spark.read.format(fmt).options(**options).load(file_path)


def read_criteo_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Header-less Criteo CTR TSV: label + 13 int features + 26
    categorical (reference ``examples/factorization_machine_example.py:43-53``
    synthesizes the column names the same way)."""
    fields = [T.StructField("label", T.IntegerType())]
    fields += [T.StructField(f"I{i}", T.IntegerType()) for i in range(1, 14)]
    fields += [T.StructField(f"C{i}", T.StringType()) for i in range(1, 27)]
    return spark.read.csv(path, sep="\t", schema=T.StructType(fields))


def read_ml100k(spark: SparkSession, path: str) -> DataFrame:
    """MovieLens-100k ``u.data``: whitespace 4-col (user, item, rating,
    ts); drop the timestamp like the reference
    (``examples/graph_convolutional_matrix_completion_example.py:28-37``)."""
    schema = "user_id long, item_id long, rating double, ts string"
    return spark.read.csv(path, sep="\t", schema=schema).drop("ts")


def read_netflix_ratings(spark: SparkSession, path: str) -> DataFrame:
    """Netflix Prize format: ``item:`` header lines followed by
    ``user,rating,date`` rows (reference
    ``examples/matrix_factorization_example.py:30-49`` parses with a
    driver loop).

    Distributed reformulation: read lines with a monotonic line id,
    mark header lines, propagate the last header via a running
    ``last(ignoreNulls)`` window ordered by line id. NB the window is
    unpartitioned — correct but single-reducer; for multi-GB Netflix
    files, split per input file (``input_file_name``) first so each
    file's window is independent."""
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_id", F.monotonically_increasing_id())
    )
    item = F.when(F.col("value").endswith(":"), F.regexp_extract("value", r"^(\d+):$", 1))
    w = Window.partitionBy("file").orderBy("line_id").rowsBetween(Window.unboundedPreceding, 0)
    parsed = (
        lines.withColumn("item_hdr", item)
        .withColumn("item_id", F.last("item_hdr", ignorenulls=True).over(w).cast("long"))
        .filter(F.col("item_hdr").isNull() & (F.col("value") != ""))
        .withColumn("parts", F.split("value", ","))
        .select(
            F.col("parts")[0].cast("long").alias("user_id"),
            F.col("item_id"),
            F.col("parts")[1].cast("double").alias("rating"),
            F.col("parts")[2].alias("date"),
        )
    )
    return parsed
