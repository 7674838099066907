"""Exact top-k frequent items via Misra-Gries candidates + recount.

The scale problem: ``groupBy(token).count().orderBy(...).limit(k)``
shuffles EVERY distinct token — at 100 TB of text that is billions of
group keys moved for a 50-row answer. The classic fix (Misra-Gries
1982; SpaceSaving) is a two-phase plan:

1. **Summarize** — one Arrow pass builds a bounded Misra-Gries summary
   (``capacity`` counters) per partition. No shuffle; memory is
   O(capacity) per task no matter how many distinct tokens stream by.
   MG's guarantee: an item's summary undercount is at most
   n_p/(capacity+1), so any item with global count > N/(capacity+1)
   survives in at least one partition's summary — the union of
   summaries is a *certified superset* of every sufficiently-frequent
   item.
2. **Recount** — exactly count ONLY the candidates (broadcast semi-join
   filter, then a groupBy whose shuffle carries candidate tokens only)
   and keep the top k.

The result is EXACT, not approximate — and the operator proves it per
run: if the k-th recounted candidate's true count is not strictly
greater than N/(capacity+1) (the best any non-candidate could hide
with), the certificate fails and the operator refuses loudly rather
than return a silently-maybe-wrong tail. Raise ``capacity`` and rerun.
Because the output is exact counts, the DuckDB oracle is the plain
top-k SQL — the summary mechanics never leak into the answer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def _mg_merge(counters: dict, batch_counts: dict, capacity: int) -> tuple[dict, bool]:
    """Batched Misra-Gries: add the batch's exact counts, then if over
    capacity decrement everything by the (capacity+1)-th largest count,
    dropping non-positive counters (≤ capacity survive). Second return
    says whether a decrement happened (i.e. counts are now lossy)."""
    for tok, cnt in batch_counts.items():
        counters[tok] = counters.get(tok, 0) + int(cnt)
    if len(counters) <= capacity:
        return counters, False
    vals = sorted(counters.values(), reverse=True)
    thresh = vals[capacity]
    return {t: c - thresh for t, c in counters.items() if c > thresh}, True


def top_k_frequent(
    items: DataFrame,
    column: str,
    k: int = 50,
    capacity: int | None = None,
    on_uncertified: str = "raise",
) -> DataFrame:
    """→ (item, cnt) — the k most frequent non-null values of
    ``column``, exact counts, ties broken by item ascending.

    ``capacity`` bounds per-task summary memory; default ``max(64·k,
    1024)`` keeps the exactness certificate comfortable. When the
    certificate fails, ``on_uncertified`` picks the policy:

    - ``"raise"`` (default): refuse loudly;
    - ``"fallback"``: rerun as a plain full groupBy — always exact, at
      the full-vocabulary shuffle cost the fast path avoids;
    - ``"best_effort"``: return the uncertified candidates' top-k
      (may be short of k rows; the head is still exact counts).
    """
    if on_uncertified not in ("raise", "fallback", "best_effort"):
        raise ValueError(f"on_uncertified: unknown policy {on_uncertified!r}")
    require_columns(items, [column])
    if capacity is None:
        capacity = max(64 * k, 1024)
    cap = capacity

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decremented = False
        for pdf in batches:
            vc = pdf[column].dropna().value_counts()
            if len(vc):
                counters, lossy = _mg_merge(counters, vc.to_dict(), cap)
                decremented = decremented or lossy
        # the flag rides on a null-key sentinel row so it survives even
        # when decrements empty the summary entirely (heavy-uniform
        # partitions do this: nothing clears the batch threshold)
        yield pd.DataFrame(
            {
                column: list(counters.keys()) + [None],
                "__exact": [not decremented] * (len(counters) + 1),
            }
        )

    src = items.select(column).filter(F.col(column).isNotNull())
    summaries = src.mapInPandas(
        summarize, schema=f"{column} {dict(items.dtypes)[column]}, __exact boolean"
    )
    # if NO partition ever decremented, the summaries are exact counts
    # over a complete candidate set — the certificate holds trivially
    # (this is every small-data run, and any run where capacity exceeds
    # per-partition distinct counts)
    complete_row = summaries.agg(F.min("__exact").alias("c")).first()
    complete = complete_row["c"] is None or bool(complete_row["c"])
    candidates = summaries.filter(F.col(column).isNotNull()).select(column).dropDuplicates()

    recount = (
        src.join(F.broadcast(candidates), on=column, how="left_semi")
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(column).asc())
    top = (
        recount.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    rows = top.collect()  # ≤ k rows — the answer itself; needed for the certificate

    if not complete and on_uncertified != "best_effort":
        n_total = src.count()
        hide_bound = n_total / (cap + 1)
        kth = rows[-1]["cnt"] if len(rows) >= k else 0
        if kth <= hide_bound:
            if on_uncertified == "fallback":
                # exactness over speed: pay the full-vocabulary shuffle
                return (
                    src.groupBy(column)
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= k)
                    .drop("__rn")
                )
            raise ValueError(
                f"top_k_frequent: exactness certificate failed — k-th count "
                f"{kth} ≤ N/(capacity+1) = {hide_bound:.1f}; a non-candidate "
                f"could outrank the boundary. Raise capacity (now {cap}), or "
                f"pick on_uncertified='fallback'/'best_effort'."
            )
    spark = items.sparkSession
    return spark.createDataFrame(rows, schema=top.schema)
