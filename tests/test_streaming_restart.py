"""Checkpoint/restart resilience: a stateful streaming query stopped
and restarted from its checkpoint must produce exactly the batch
result — state (session continuity) carries across the restart, and
the file sink's exactly-once log admits no duplicates or losses."""

from __future__ import annotations

import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from queryengine_spark.queries.base import epoch_us
from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import read_event_stream, streaming_sessionize

GAP_MIN = 30


def _batch_session_ids(events):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = epoch_us("ts")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag(us, 1).over(w).isNull()
            | ((us - F.lag(us, 1).over(w)) > GAP_MIN * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    return flagged.select(
        "user_id", "event_id", F.sum("new_sess").over(wsum).alias("session_id")
    )


def _run_until_done(stream_df, out_dir, ckpt_dir):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_stateful_sessionize_survives_restart(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    mid = e.select(F.percentile(epoch_us("ts"), F.lit(0.5))).collect()[0][0]
    first = e.filter(epoch_us("ts") <= mid)
    second = e.filter(epoch_us("ts") > mid)

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    # run 1: only the first half exists; availableNow drains it and
    # terminates, leaving session state in the checkpoint
    first.coalesce(1).write.mode("append").parquet(watch)
    _run_until_done(
        streaming_sessionize(read_event_stream(spark, watch), GAP_MIN), out, ckpt
    )
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    # run 2: the second half arrives; the RESTARTED query must resume
    # from the checkpoint — processing only the new file, continuing
    # session counters across the boundary
    time.sleep(1.1)  # distinct mtime → deterministic replay order
    second.coalesce(1).write.mode("append").parquet(watch)
    _run_until_done(
        streaming_sessionize(read_event_stream(spark, watch), GAP_MIN), out, ckpt
    )

    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in spark.read.parquet(out).collect()
    }
    all_events = spark.read.parquet(watch)
    want = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in _batch_session_ids(all_events).collect()
    }
    assert len(got) == len(want) > 0  # exactly-once: no dup, no loss
    assert got == want  # sessions continue across the restart
