"""CDC change application (MERGE / upsert-with-deletes).

Beyond-reference warehouse operator: given a base snapshot and a
change stream of (key, version, op, payload) rows, produce the next
snapshot — the semantics of ``MERGE INTO`` with
insert/update/delete, resolved by latest-version-wins per key.

Scale design: the delta is (almost always) orders of magnitude
smaller than the base, so the plan is shaped around that asymmetry —
the only operation touching the base is ONE anti-join on the key of
the compacted delta (broadcastable when the delta's key set is
small); the window, filtering, and op dispatch all happen on the
delta side. The base is never window-sorted or re-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    tie_break: str | None = None,
) -> DataFrame:
    """Compact a change stream to the latest row per key
    (keep-last window; WindowGroupLimit prunes non-latest map-side).
    Pass a unique ``tie_break`` when versions can collide."""
    order = [F.col(version_col).desc()]
    if tie_break is not None:
        order.append(F.col(tie_break).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tie_break: str | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """→ next snapshot = MERGE(base, changes).

    Per key, the latest change (by ``version_col``, then
    ``tie_break``) wins: op == ``delete_op`` removes the key, any
    other op replaces/creates the row with the change's payload
    columns (all ``base`` columns must be present in ``changes``).
    Keys without changes pass through untouched.

    ``broadcast_delta`` broadcasts the compacted delta's key set into
    the anti-join — the right call whenever the delta fits the
    broadcast threshold; disable for giant backfills and let AQE pick
    the join strategy.
    """
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_changes: changes missing base columns {missing}")
    latest = latest_changes(changes, key_cols, version_col, tie_break)
    # NULL-safe op dispatch: a bare `op != delete_op` evaluates to NULL
    # for NULL ops, silently dropping the row from the upsert side while
    # the anti-join still removes its key — a NULL-op change would act
    # as a delete. Treat NULL op as upsert instead.
    upserts = latest.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).select(*base.columns)
    touched = latest.select(*key_cols)
    if broadcast_delta:
        touched = F.broadcast(touched)
    untouched = base.join(touched, on=key_cols, how="left_anti")
    return untouched.unionByName(upserts)
