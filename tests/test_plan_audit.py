"""Unit tests for the plan-audit anti-pattern detector (tools/plan_audit.py).

The full-registry walk is a per-round tool (several minutes); these
tests pin the string-level detection logic so a parser regression
can't silently blind the gate.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_audit import _count_struct_fields, audit_plan  # noqa: E402


def test_count_struct_fields_ignores_nested_commas():
    assert _count_struct_fields("a:int,b:decimal(10,2),c:string") == 3
    assert _count_struct_fields("a:array<struct<x:int,y:int>>,b:int") == 2
    assert _count_struct_fields("") == 0
    assert _count_struct_fields("a:int") == 1


def test_flags_python_row_udf():
    flags = audit_plan("q", "*(1) BatchEvalPython [f(x)#1]")
    assert ("python-row-udf", "BatchEvalPython in plan") in flags


def test_cartesian_allowlist():
    plan = "CartesianProduct\n:- Scan a\n+- Scan b"
    assert audit_plan("some_query", plan)
    assert not audit_plan("cartesian_product_scoring", plan)


def test_wide_scan_only_for_uniform_width_tables():
    def scan(table, body):
        return (
            f"FileScan parquet [] ... /x/{table}.parquet ... "
            f"ReadSchema: struct<{body}>"
        )

    all_lineitem = ",".join(f"c{i}:int" for i in range(11))
    assert audit_plan("q", scan("lineitem", all_lineitem))
    # one column pruned -> no flag
    assert not audit_plan("q", scan("lineitem", all_lineitem.rsplit(",", 1)[0]))
    # documents/embeddings are byte-dominated by one column: never flagged
    assert not audit_plan(
        "q", scan("documents", "doc_id:long,text:string,lang:string,source:string,n_chars:long")
    )


def test_global_window_detection():
    from tools.plan_audit import GLOBAL_WINDOW_OK

    single = (
        "Window [row_number() windowspecdefinition(x ASC)]\n"
        "+- Sort [x ASC], false, 0\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
        "      +- Scan parquet"
    )
    assert ("global-window", "Window fed by Exchange SinglePartition") in audit_plan(
        "some_query", single
    )
    # allow-listed names pass
    assert not audit_plan("exact_auc", single)
    assert "exact_auc" in GLOBAL_WINDOW_OK
    # a partitioned window (hash exchange between Window and input) is fine
    parted = (
        "Window [row_number() windowspecdefinition(g, x ASC)]\n"
        "+- Sort [g ASC, x ASC], false, 0\n"
        "   +- Exchange hashpartitioning(g#1, 32)\n"
        "      +- Exchange SinglePartition\n"
        "         +- Scan parquet"
    )
    assert not audit_plan("some_query", parted)
