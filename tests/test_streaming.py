"""Structured Streaming: the streaming tumbling-window aggregation
must agree exactly with its batch twin on the same data, and the
streaming dedup must keep exactly one row per content key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-stage the events table as a multi-file parquet directory so
    the file source replays it in several micro-batches."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_streaming_tumbling_equals_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_stream_to_memory(tumbling_counts(stream), "tumbling_test", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(batch).collect()
    }
    q.stop()
    assert got == want
    assert len(want) > 0


def test_streaming_dedup_keeps_one_per_key(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_stream_to_memory(streaming_dedup(stream), "dedup_test", "append")
    got = spark.sql("SELECT content_hash, count(*) AS n FROM dedup_test GROUP BY 1")
    dupes = got.filter(F.col("n") > 1).count()
    total = got.count()
    q.stop()
    assert dupes == 0
    assert total > 0
