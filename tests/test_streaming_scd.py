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
