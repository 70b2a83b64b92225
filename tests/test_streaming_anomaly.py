"""Streaming anomaly detection must equal the batch twin: the hourly
count fold is additive, so the final (max batch_seq) snapshot must be
IDENTICAL to events_anomaly_window's answer regardless of how events
were split across micro-batches — including an out-of-order split."""

from __future__ import annotations

import os
import time
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from queryengine_spark.queries.addenda import ANOM_K, ANOM_MIN_N, ANOM_WIN
from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    streaming_anomaly_window,
)


def _reference(events_df):
    ev = [
        (r["event_type"], r["bucket"])
        for r in events_df.selectExpr(
            "event_type",
            "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS bucket",
        ).collect()
    ]
    counts = Counter(ev)
    series = defaultdict(list)
    for (et, b), c in sorted(counts.items()):
        series[et].append((b, c))
    out = {}
    for et, rows in series.items():
        for i, (b, c) in enumerate(rows):
            win = [x for _, x in rows[max(0, i - ANOM_WIN) : i]]
            n, s, ss = len(win), sum(win), sum(x * x for x in win)
            flag = int(
                n >= ANOM_MIN_N
                and (n * c - s) ** 2 > ANOM_K * ANOM_K * (n * ss - s * s)
            )
            out[(et, b)] = (c, n, s, ss, flag)
    return out


@pytest.fixture(scope="module")
def shuffled_events_dir(spark, sf_dir, tmp_path_factory):
    """Three files split by user_id % 3 — NOT time-ordered, so hourly
    buckets accumulate across micro-batches out of event-time order."""
    path = tmp_path_factory.mktemp("anom_events")
    e = load_table(spark, sf_dir, "events")
    merged = str(path / "merged")
    os.makedirs(merged)
    for i in range(3):
        p = str(path / f"part{i}")
        e.filter(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in sorted(os.listdir(p)):
            if f.endswith(".parquet"):
                os.link(os.path.join(p, f), os.path.join(merged, f"{i}-{f}"))
                os.utime(
                    os.path.join(merged, f"{i}-{f}"),
                    (time.time() + i, time.time() + i),
                )
    return merged


def test_streaming_anomaly_equals_batch(spark, shuffled_events_dir):
    stream = read_event_stream(spark, shuffled_events_dir)
    q = run_stream_to_memory(
        streaming_anomaly_window(stream), "anom_stream", "append"
    )
    rows = spark.sql("SELECT * FROM anom_stream").collect()
    q.stop()
    assert rows, "stream emitted nothing"
    # final snapshot = max batch_seq per event type
    last_seq = defaultdict(int)
    for r in rows:
        last_seq[r["event_type"]] = max(last_seq[r["event_type"]], r["batch_seq"])
    got = {
        (r["event_type"], r["bucket"]): (
            r["cnt"],
            r["win_n"],
            r["win_sum"],
            r["win_sumsq"],
            r["is_anomaly"],
        )
        for r in rows
        if r["batch_seq"] == last_seq[r["event_type"]]
    }
    want = _reference(spark.read.parquet(shuffled_events_dir))
    assert got == want
    # intermediate snapshots must be internally consistent too:
    # win_sum of a bucket == sum of the 24 preceding cnts in that seq
    per_seq = defaultdict(list)
    for r in rows:
        per_seq[(r["event_type"], r["batch_seq"])].append(r)
    for rs in per_seq.values():
        rs.sort(key=lambda r: r["bucket"])
        for i, r in enumerate(rs):
            win = rs[max(0, i - ANOM_WIN) : i]
            assert r["win_n"] == len(win)
            assert r["win_sum"] == sum(x["cnt"] for x in win)
