"""Out-of-order streaming sessionization: events arrive shuffled
(bounded lateness, the watermark contract) and the watermark+buffer
operator must still produce EXACTLY the batch window-function
assignment — the stream==batch invariant under disorder.

Arrival order is event time plus a deterministic per-event jitter of
up to 1 hour; the operator runs with a 2-hour watermark, so no row is
ever watermark-dropped and every real event must be emitted once the
watermark passes it (heartbeat events push the watermark far past the
real data at the end).
"""

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
    streaming_sessionize_ooo,
)

GAP_MIN = 30
JITTER_US = 3600 * 1_000_000  # 1 h of arrival disorder
N_CHUNKS = 4


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


@pytest.fixture(scope="module")
def shuffled_events_dir(spark, sf_dir, tmp_path_factory):
    """Events replayed in ARRIVAL order = event time + deterministic
    jitter < 1 h (bounded lateness), split into chunk files, followed
    by three far-future heartbeat events that drive the watermark past
    all real data so every buffered session flushes."""
    path = tmp_path_factory.mktemp("ooo_events")
    e = load_table(spark, sf_dir, "events")
    jitter = (F.col("event_id") * F.lit(2654435761)) % F.lit(JITTER_US)
    arr = e.withColumn("arrival_us", epoch_us("ts") + jitter)
    ranked = arr.withColumn(
        "chunk",
        F.ntile(N_CHUNKS).over(Window.orderBy(F.col("arrival_us").asc())),
    )
    max_ts_us = e.select(F.max(epoch_us("ts"))).collect()[0][0]
    merged = str(path / "merged")
    os.makedirs(merged)
    file_idx = 0
    for c in range(1, N_CHUNKS + 1):
        part = ranked.filter(F.col("chunk") == c).drop("arrival_us", "chunk")
        pdir = str(path / f"c{c}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(merged, f"{file_idx:03d}.parquet")
                os.link(os.path.join(pdir, f), dst)
                os.utime(dst, (time.time() + file_idx, time.time() + file_idx))
                file_idx += 1
    # heartbeats: 3 h apart, far beyond max real ts + watermark
    for i in range(3):
        hb_ts = max_ts_us + (i + 1) * 3 * 3600 * 1_000_000
        hb = spark.createDataFrame(
            [(10_000_000 + i, hb_ts, -1, "heartbeat", 0.0, "{}")],
            "event_id long, ts_us long, user_id long, event_type string, value double, props string",
        ).select(
            "event_id",
            # match the events parquet's TIMESTAMP_NTZ so the merged
            # directory has one consistent parquet timestamp type
            F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        pdir = str(path / f"hb{i}")
        hb.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(merged, f"{file_idx:03d}.parquet")
                os.link(os.path.join(pdir, f), dst)
                os.utime(dst, (time.time() + file_idx, time.time() + file_idx))
                file_idx += 1
    return merged


def test_ooo_sessionize_matches_batch(spark, shuffled_events_dir):
    stream = read_event_stream(spark, shuffled_events_dir)
    q = run_stream_to_memory(
        streaming_sessionize_ooo(stream, GAP_MIN, watermark="2 hours"),
        "sess_ooo",
        "append",
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in spark.sql("SELECT * FROM sess_ooo WHERE user_id >= 0").collect()
    }
    q.stop()
    batch = spark.read.parquet(shuffled_events_dir).filter(F.col("user_id") >= 0)
    want = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in _batch_session_ids(batch).collect()
    }
    assert len(want) > 0
    assert got == want


def test_ooo_sessionize_no_duplicate_emission(spark, shuffled_events_dir):
    """Append-mode contract: each event's assignment is emitted
    exactly once across all micro-batches."""
    stream = read_event_stream(spark, shuffled_events_dir)
    q = run_stream_to_memory(
        streaming_sessionize_ooo(stream, GAP_MIN, watermark="2 hours"),
        "sess_ooo_dup",
        "append",
    )
    rows = spark.sql(
        "SELECT event_id, count(*) AS n FROM sess_ooo_dup GROUP BY event_id HAVING count(*) > 1"
    ).collect()
    q.stop()
    assert rows == []
