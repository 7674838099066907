"""Streaming SCD2 e2e: closed intervals from a micro-batched change
stream match the batch scd2_intervals operator; late events surfaced."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshells_spark.operators.scd import scd2_intervals
from redshells_spark.streaming.scd import streaming_scd2

SCHEMA = "key long, state string, ts long, seq long"

# key 1: a,a,b,a -> intervals a[10,30) b[30,40) a[40,open)
# key 2: x -> open only
# key 3: p,q in separate batches -> p[5,25) closed across a batch boundary
BATCHES = [
    [(1, "a", 10, 1), (1, "a", 20, 2), (3, "p", 5, 3)],
    [(1, "b", 30, 4), (2, "x", 5, 5)],
    [(1, "a", 40, 6), (3, "q", 25, 7)],
]


def _run_stream(spark, tmp_path, batches):
    d = tmp_path / "changes"
    d.mkdir()
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}.parquet")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    out = streaming_scd2(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("scd_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return spark.sql("SELECT * FROM scd_stream_out")


def test_streaming_scd2_closed_intervals_match_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path, BATCHES)
    closed = {
        (r["key"], r["state"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in got.filter(F.col("valid_to").isNotNull()).collect()
    }

    all_events = spark.createDataFrame([r for b in BATCHES for r in b], SCHEMA)
    batch_closed = {
        (r["key"], r["state"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in scd2_intervals(all_events, "key", "state", "ts", tie_break="seq")
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert closed == batch_closed
    assert closed == {(1, "a", 10, 30, 2), (1, "b", 30, 40, 1), (3, "p", 5, 25, 1)}
    # no late events in this fixture
    assert got.filter(F.col("n_late") > 0).count() == 0


def test_streaming_scd2_counts_late_events(spark, tmp_path):
    batches = [
        [(1, "a", 100, 1)],
        [(1, "a", 50, 2)],  # older than the open run's start -> late
    ]
    got = _run_stream(spark, tmp_path, batches)
    late = got.filter(F.col("n_late") > 0).collect()
    assert len(late) == 1 and late[0]["n_late"] == 1
    # the open run is untouched by the late event
    assert late[0]["valid_from"] == 100 and late[0]["valid_to"] is None


def test_streaming_scd2_late_and_close_same_batch(spark, tmp_path):
    # n_late accounting when a batch mixes late events with a close:
    # the late event (ts < open run start) folds first (in-batch ts
    # sort), so its count rides the close row — and the residual-late
    # guard (_fold_scd2 emits a marker whenever n_late > 0 remains at
    # batch end, not only when no closes were produced) must not
    # double-count it.
    batches = [
        [(1, "a", 100, 1)],
        [(1, "x", 50, 2), (1, "b", 200, 3)],  # late, then close a[100,200)
    ]
    got = _run_stream(spark, tmp_path, batches)
    rows = got.collect()
    closes = [r for r in rows if r["valid_to"] is not None]
    assert len(closes) == 1
    c = closes[0]
    assert (c["state"], c["valid_from"], c["valid_to"], c["n_late"]) == ("a", 100, 200, 1)
    # exactly once: no extra marker row repeating the same late count
    assert sum(r["n_late"] for r in rows) == 1


def test_fold_scd2_pure_late_batch_marker_unit():
    # unit-level check of the residual-late marker: a batch of only
    # late events (every ts < the open run's start) must emit exactly
    # one open-interval marker carrying the full count, and leave the
    # stored open run untouched. (With the in-batch ts sort, any
    # non-late event closes the run and carries the count on the close
    # row instead — covered by the stream test above.)
    import pandas as pd

    from redshells_spark.streaming.scd import _fold_scd2

    class FakeState:
        exists = True
        get = ("a", 100, 2)

        def update(self, v):
            self.updated = v

    st = FakeState()
    batch = pd.DataFrame(
        {"ts": [50, 60], "seq": [1, 2], "state": ["x", "y"], "key": [1, 1]}
    )
    out = list(_fold_scd2((1,), iter([batch]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["n_late"] == 2 and pd.isna(row["valid_to"])
    assert st.updated == ("a", 100, 2)  # open run untouched
