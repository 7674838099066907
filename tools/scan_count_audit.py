"""Rank registry queries by repeated-subtree pressure: count parquet
scans of the fact tables and Exchange nodes in each query's physical
plan (no execution).

A query whose plan scans the same fact table many times is re-expanding
a shared subtree per consumer (guide §1.2/§5) — the defect family the
round-8 session-2 sweep fixed (weekday_seasonal_outliers 24 scans,
theils_u_matrix 88). This tool finds what is left.

Usage: python tools/scan_count_audit.py [--sf DIR] [--top N] [name ...]
Prints: scans exchanges name  (sorted by scans desc).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("lineitem", "orders", "events", "documents", "embeddings",
         "customer", "part", "supplier")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from redshells_spark import get_spark_session
    from redshells_spark.queries import get_queries

    spark = get_spark_session("scan_count_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    names = args.names or sorted(queries)

    rows = []
    for name in names:
        if name not in queries:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        try:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — audit keeps walking
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        scans = sum(plan.count(f"/{t}.parquet") for t in FACTS)
        exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
        in_mem = plan.count("InMemoryTableScan") + plan.count(
            "Scan ExistingRDD")
        rows.append((scans, exchanges, in_mem, name))

    rows.sort(reverse=True)
    print(f"{'scans':>5} {'exch':>5} {'memRDD':>6}  query")
    for scans, exch, mem, name in rows[: args.top]:
        print(f"{scans:>5} {exch:>5} {mem:>6}  {name}")


if __name__ == "__main__":
    main()
