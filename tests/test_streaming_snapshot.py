"""Streaming latest-per-key snapshot (the streaming twin of the
batch CDC apply): the max-batch_seq snapshot must equal the batch
window reduction, including when micro-batches replay the change
stream OUT of event-time order — the max-seq state fold is
order-independent by construction, and this pins it."""

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
    streaming_latest_snapshot,
)


def _batch_latest(events):
    w = Window.partitionBy("user_id").orderBy(F.col("seq").desc())
    return (
        events.select(
            "user_id", epoch_us("ts").alias("seq"), "event_type", "value"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "seq", "event_type", "value")
    )


@pytest.fixture(scope="module")
def shuffled_events_dir(spark, sf_dir, tmp_path_factory):
    """Three files in NON-chronological replay order (middle third
    last): late-arriving old data must not regress the snapshot."""
    path = tmp_path_factory.mktemp("snap_events")
    e = load_table(spark, sf_dir, "events")
    lo, hi = (
        e.select(
            F.percentile(epoch_us("ts"), F.lit(0.33)),
            F.percentile(epoch_us("ts"), F.lit(0.66)),
        ).collect()[0]
    )
    us = epoch_us("ts")
    chunks = [
        e.filter(us <= lo),  # oldest … replayed first
        e.filter(us > hi),  # newest … replayed second
        e.filter((us > lo) & (us <= hi)),  # middle … replayed LAST
    ]
    merged = str(path / "merged")
    os.makedirs(merged)
    now = time.time()
    for i, chunk in enumerate(chunks):
        p = str(path / f"f{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(p)
        for f in sorted(os.listdir(p)):
            if f.endswith(".parquet"):
                dst = os.path.join(merged, f"{i}-{f}")
                os.link(os.path.join(p, f), dst)
                os.utime(dst, (now + i, now + i))
    return merged


def test_streaming_snapshot_matches_batch(spark, shuffled_events_dir):
    stream = read_event_stream(spark, shuffled_events_dir)
    q = run_stream_to_memory(
        streaming_latest_snapshot(stream), "latest_snap", "append"
    )
    rows = spark.sql(
        """
        SELECT user_id, seq, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY batch_seq DESC) AS rn
          FROM latest_snap) WHERE rn = 1
        """
    ).collect()
    q.stop()
    got = {r["user_id"]: (r["seq"], r["event_type"], r["value"]) for r in rows}
    batch = spark.read.parquet(shuffled_events_dir)
    want = {
        r["user_id"]: (r["seq"], r["event_type"], r["value"])
        for r in _batch_latest(batch).collect()
    }
    assert got == want


def test_state_is_one_row_per_key(spark, shuffled_events_dir):
    """Every batch emits exactly one row per active key — the state
    (and the changelog per batch) is O(keys), never O(events)."""
    stream = read_event_stream(spark, shuffled_events_dir)
    q = run_stream_to_memory(
        streaming_latest_snapshot(stream), "latest_snap2", "append"
    )
    per = spark.sql(
        "SELECT user_id, batch_seq, count(*) AS n FROM latest_snap2 "
        "GROUP BY user_id, batch_seq HAVING count(*) > 1"
    ).collect()
    q.stop()
    assert per == []


def test_snapshot_survives_restart(spark, sf_dir, tmp_path):
    """Kill the query after draining half the stream, restart from
    the checkpoint with the second half present: the final
    max-batch_seq snapshot must equal the batch reduction over ALL
    events — state (per-key winner) crosses the restart, the file
    sink admits no duplicate or lost changelog rows."""
    import time as _t

    from queryengine_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    mid = e.select(F.percentile(epoch_us("ts"), F.lit(0.5))).collect()[0][0]
    first = e.filter(epoch_us("ts") <= mid)
    second = e.filter(epoch_us("ts") > mid)

    watch, out, ckpt = (
        str(tmp_path / "watch"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(watch)

    def run_once():
        q = (
            streaming_latest_snapshot(read_event_stream(spark, watch))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    first.coalesce(1).write.mode("append").parquet(watch)
    run_once()
    _t.sleep(1.1)
    second.coalesce(1).write.mode("append").parquet(watch)
    run_once()

    got = {
        r["user_id"]: (r["seq"], r["event_type"], r["value"])
        for r in spark.sql(
            f"""
            SELECT user_id, seq, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY batch_seq DESC) AS rn
              FROM parquet.`{out}`) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r["user_id"]: (r["seq"], r["event_type"], r["value"])
        for r in _batch_latest(spark.read.parquet(watch)).collect()
    }
    assert got == want and len(got) > 0


def test_null_payload_updates_state_as_none(spark, tmp_path):
    """A change row with NULL value / event_type must flow through
    the state fold as None (matching the batch twin, which carries
    null payloads), not raise TypeError inside applyInPandasWithState
    and kill the query; rows with a NULL seq are unorderable and are
    ignored entirely."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), "click", 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 2), None, None),  # winner, null payload
        (2, dt.datetime(2024, 1, 1, 0, 0, 1), "view", 5.0),
        (2, None, "purchase", 9.0),  # null seq: dropped
    ]
    src = str(tmp_path / "null_events")
    spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    ).coalesce(1).write.parquet(src)

    stream = read_event_stream(spark, src)
    q = run_stream_to_memory(
        streaming_latest_snapshot(stream), "latest_snap_nulls", "append"
    )
    rows_out = spark.sql(
        """
        SELECT user_id, seq, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY batch_seq DESC) AS rn
          FROM latest_snap_nulls) WHERE rn = 1
        """
    ).collect()
    q.stop()
    got = {r["user_id"]: (r["event_type"], r["value"]) for r in rows_out}
    assert got == {1: (None, None), 2: ("view", 5.0)}
