"""Streaming SCD2: emit validity intervals from a change stream with
``applyInPandasWithState``.

The streaming face of :mod:`redshells_spark.operators.scd`: per key,
track the currently-open (state, valid_from, n_events) run in keyed
state; whenever an arriving event's tracked value differs, CLOSE the
open run — emit (key, state, valid_from, valid_to=new start,
n_events) — and open a new one. Closed intervals stream out as they
happen; only the open run per key lives in the state store
(RocksDB-backed on a real cluster), so output is append-only and
state size scales with distinct keys, not history length.

API note: Spark 4's ``transformWithStateInPandas`` is the designated
successor for this shape, but its Python driver worker needs
``google.protobuf``, which this environment does not ship — so the
operator uses the stable ``applyInPandasWithState`` contract (same
keyed-state semantics, same state-store backend).

Ordering contract (same as :mod:`redshells_spark.streaming.cdc`):
within a micro-batch, rows are sorted here before folding; ACROSS
batches each key's events must arrive time-ordered (the
Kafka-partitioned-by-key deployment). A late event older than the
open run's start is counted in the emitted ``n_late`` column rather
than silently misfolded.

Parity: replaying a full event log through any time-ordered
micro-batching yields exactly the CLOSED intervals of the batch
operator ``scd2_intervals`` (valid_to IS NOT NULL rows) — pinned in
``tests/test_streaming_scd.py``.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "state string, valid_from long, n_events long"
OUTPUT_SCHEMA = (
    "key long, state string, valid_from long, valid_to long, n_events long, n_late long"
)


def _fold_scd2(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    # fold in event order; ties broken by the unique sequence col
    batch = batch.sort_values(["ts", "seq"], kind="mergesort")
    if state.exists:
        cur_state, cur_from, cur_n = state.get
    else:
        cur_state, cur_from, cur_n = None, None, 0
    out: list[tuple] = []
    n_late = 0
    k = key[0]
    for ts, st in zip(batch["ts"].to_list(), batch["state"].to_list()):
        ts = int(ts)
        if cur_state is not None and ts < cur_from:
            n_late += 1  # out-of-order vs the open run: surfaced, not folded
            continue
        if cur_state is None:
            cur_state, cur_from, cur_n = st, ts, 1
        elif st == cur_state:
            cur_n += 1
        else:
            out.append((k, cur_state, cur_from, ts, cur_n, n_late))
            n_late = 0
            cur_state, cur_from, cur_n = st, ts, 1
    state.update((cur_state, cur_from, cur_n))
    if n_late:
        # Surface ANY residual lateness as a marker row (open interval)
        # — not only when no close was emitted: late events landing
        # after the batch's last close would otherwise vanish from the
        # n_late accounting (each close resets the counter).
        out.append((k, cur_state, cur_from, None, cur_n, n_late))
    if out:
        yield pd.DataFrame(
            out, columns=["key", "state", "valid_from", "valid_to", "n_events", "n_late"]
        )


def streaming_scd2(
    changes: DataFrame,
    key_col: str = "key",
    state_col: str = "state",
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> DataFrame:
    """→ append-only stream of CLOSED validity intervals (plus
    late-marker rows). Input needs (key, state, ts, seq) — rename via
    the col args."""
    from pyspark.sql import functions as F

    src = changes.select(
        F.col(key_col).alias("key"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("ts"),
        F.col(seq_col).alias("seq"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _fold_scd2,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
