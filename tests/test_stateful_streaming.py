from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from redshells_spark.streaming.events import read_event_stream, run_stream_to_memory
from redshells_spark.streaming.stateful import running_user_stats


def test_running_user_stats_stateful(spark, sf_dir, tmp_path):
    stream_dir = tmp_path / "sstream"
    stream_dir.mkdir()
    src = f"{sf_dir}/events.parquet"
    paths = glob.glob(os.path.join(src, "*.parquet")) if os.path.isdir(src) else [src]
    for i, p in enumerate(paths):
        shutil.copy(p, stream_dir / f"part{i}.parquet")

    stream = read_event_stream(spark, str(stream_dir))
    stats = running_user_stats(stream)
    q = run_stream_to_memory(stats, "user_stats_test", output_mode="update")
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in spark.sql(
                """SELECT user_id, n_events, sum_value FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                     FROM user_stats_test) WHERE rn = 1"""
            ).collect()
        }
        batch = {
            r["user_id"]: (r["n"], r["s"])
            for r in spark.read.parquet(src)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert set(got) == set(batch)
        for uid, (n, s) in batch.items():
            assert got[uid][0] == n
            assert got[uid][1] == pytest.approx(s, rel=1e-9)
    finally:
        q.stop()
