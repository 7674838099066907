"""Compression-ratio quality signals — the "zlib filter" used by
modern corpus pipelines (Dolma, RedPajama-v2 quality annotations):
machine-generated/repetitive text compresses far better than natural
prose, and encrypted/binary junk barely compresses at all, so the
DEFLATE ratio is a cheap two-sided quality gate.

This is a legitimate Arrow-UDF boundary (the repo's rule: Python only
where JVM expressions genuinely can't express the op — a DEFLATE
encoder qualifies): one ``mapInPandas`` pass, zlib from the stdlib,
fixed compression level so the signal is deterministic for a given
zlib build. No shuffle at all — the operator is a row-local map;
output is corpus-row-bounded.

No SQL oracle (DuckDB has no DEFLATE surface) — correctness is gated
by property tests (tests/test_compress.py): repetitive < natural <
incompressible ordering, partitioning invariance, and exact raw
lengths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from redshells_spark.schema import require_columns

_LEVEL = 6  # zlib default; pinned so the signal is reproducible


def compression_signals(
    docs: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, raw_len, comp_len, ratio): UTF-8 byte length, zlib
    level-6 compressed length, and their ratio (rounded 4; 0-length
    docs get ratio NULL)."""
    require_columns(docs, [id_column, text_column])
    id_field = docs.schema[id_column]
    schema = StructType(
        [
            StructField("doc_id", id_field.dataType),
            StructField("raw_len", LongType()),
            StructField("comp_len", LongType()),
            StructField("ratio", DoubleType()),
        ]
    )
    src = docs.select(
        F.col(id_column).alias("doc_id"), F.col(text_column).alias("__text")
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            raw = pdf["__text"].fillna("").map(lambda s: s.encode("utf-8"))
            raw_len = raw.map(len)
            comp_len = raw.map(lambda b: len(zlib.compress(b, _LEVEL)))
            ratio = (comp_len / raw_len.where(raw_len > 0)).round(4)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw_len.astype("int64"),
                    "comp_len": comp_len.astype("int64"),
                    "ratio": ratio,
                }
            )

    return src.mapInPandas(_batches, schema=schema)
