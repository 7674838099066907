"""Privacy / data-governance audits: k-anonymity and l-diversity.

Beyond-reference governance operators (the PII *redaction* side lives
in ``text/analysis.py:redact_pii``; this is the release-audit side):
before publishing a dataset, measure how identifiable its rows are
under a set of quasi-identifier columns.

- An *equivalence class* is one combination of quasi-identifier
  values. k-anonymity holds iff every class has ≥ k rows.
- l-diversity additionally requires ≥ l distinct sensitive values per
  class (a k-anonymous class whose members all share one diagnosis
  still leaks it).

Both reduce to ONE groupBy over the quasi-identifiers plus a summary
aggregate — fully distributed, map-side combined, no driver state.
At 100 TB the only care is quasi-identifier cardinality: the shuffle
is keyed by the class tuple, which is exactly the audit's subject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equivalence_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """→ one row per quasi-identifier combination: (quasi…, n_rows
    [, n_sensitive]) where ``n_sensitive`` is the exact distinct count
    of the sensitive column inside the class."""
    if not quasi_cols:
        raise ValueError("equivalence_classes: quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("n_sensitive"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """→ ONE summary row: total classes, k-violating classes, rows at
    risk (members of violating classes) and their share, plus — when
    ``sensitive_col`` is given — classes failing l-diversity.

    ``risk_share`` is rounded to 6 decimals for cross-engine
    reproducibility.
    """
    if k < 1:
        raise ValueError("k_anonymity_audit: k must be >= 1")
    classes = equivalence_classes(df, quasi_cols, sensitive_col)
    viol = (F.col("n_rows") < k).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(viol).alias("k_violating_classes"),
        F.sum(F.col("n_rows") * viol).alias("rows_at_risk"),
        F.round(
            F.sum(F.col("n_rows") * viol) / F.sum("n_rows"), 6
        ).alias("risk_share"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.sum((F.col("n_sensitive") < l).cast("long")).alias("l_violating_classes")
        )
    return classes.agg(*aggs)
