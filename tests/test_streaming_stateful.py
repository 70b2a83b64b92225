"""applyInPandasWithState sessionization: state must carry session
continuity across micro-batches, and the assignment must equal the
batch window-function sessionization when batches arrive in event-time
order."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from queryengine_spark.queries.base import epoch_us
from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    streaming_sessionize,
)

GAP_MIN = 30


def _batch_session_ids(events):
    """Reference assignment: window-function gap sessionization."""
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


@pytest.fixture(scope="module")
def ordered_events_dir(spark, sf_dir, tmp_path_factory):
    """Two time-range files, written oldest-first so the file source
    replays them in event-time order (sessions cross the boundary)."""
    path = tmp_path_factory.mktemp("ordered_events")
    e = load_table(spark, sf_dir, "events").orderBy("ts")
    mid = e.select(F.percentile(epoch_us("ts"), F.lit(0.5))).collect()[0][0]
    first = e.filter(epoch_us("ts") <= mid)
    second = e.filter(epoch_us("ts") > mid)
    p1, p2 = str(path / "f1"), str(path / "f2")
    first.coalesce(1).write.mode("overwrite").parquet(p1)
    time.sleep(1.1)  # distinct mtimes → deterministic replay order
    second.coalesce(1).write.mode("overwrite").parquet(p2)
    merged = str(path / "merged")
    os.makedirs(merged)
    for i, src in enumerate((p1, p2)):
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                os.link(os.path.join(src, f), os.path.join(merged, f"{i}-{f}"))
                os.utime(os.path.join(merged, f"{i}-{f}"), (time.time() + i, time.time() + i))
    return merged


def test_stateful_sessionize_matches_batch(spark, ordered_events_dir):
    stream = read_event_stream(spark, ordered_events_dir)
    q = run_stream_to_memory(
        streaming_sessionize(stream, GAP_MIN), "sess_state", "append"
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in spark.sql("SELECT * FROM sess_state").collect()
    }
    q.stop()
    batch = spark.read.parquet(ordered_events_dir)
    want = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in _batch_session_ids(batch).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want