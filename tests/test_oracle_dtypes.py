"""Registry-wide oracle output-dtype guard.

Round-4 driver regression class: an oracle that leaves an integer
``sum()`` / ``//`` uncast makes DuckDB return HUGEINT (int128), which
the driver's hasher renders as float64 while Spark returns int64 — a
hash mismatch on numerically identical values that ``fetchall()``-based
local verification cannot see. This test walks EVERY registered oracle
with a LIMIT-0 plan (costs milliseconds per oracle, no data scanned)
and asserts no output column is HUGEINT / UHUGEINT / DECIMAL — the
dtypes the driver serializes differently from Spark's long/double.

Any new oracle that aggregates integers must ``CAST(... AS BIGINT)``
its output columns; this test is the guard that keeps the class
extinct (VERDICT r4, next-round task #1).
"""

from __future__ import annotations

import duckdb
import pytest

from redshells_spark.queries import get_oracles

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.001"

BANNED_PREFIXES = ("DECIMAL",)
BANNED_EXACT = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint_or_decimal(con):
    offenders = {}
    for name, sql in get_oracles().items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        bad = [
            (col, str(ty))
            for col, ty in zip(rel.columns, rel.types)
            if str(ty) in BANNED_EXACT or str(ty).startswith(BANNED_PREFIXES)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emit driver-unhashable dtypes (add CAST(... AS BIGINT)): "
        f"{offenders}"
    )
