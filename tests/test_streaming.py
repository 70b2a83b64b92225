"""Structured Streaming: the streaming tumbling-window aggregation
must agree exactly with its batch twin on the same data, and the
streaming dedup must keep exactly one row per content key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from queryengine_spark.queries.base import epoch_sec
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


@pytest.fixture(scope="module")
def events_dir_ordered(spark, sf_dir, tmp_path_factory):
    """Time-ordered replay: four quarter-range files written
    sequentially (file source processes oldest mtime first), so the
    watermark never retroactively invalidates in-flight rows — the
    realistic arrival order for a log-shipped stream. The plain
    events_dir fixture shuffles time across files, which a 1-hour
    watermark rightly treats as too-late data."""
    import time

    path = str(tmp_path_factory.mktemp("events_stream_ordered"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_ts_s", epoch_sec("ts")
    )
    qs = ev.approxQuantile("_ts_s", [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("_ts_s") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("_ts_s") <= bounds[i + 1])
        part = part.drop("_ts_s")
        part.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)  # distinct mtimes fix the replay order
    return path


def test_streaming_attribution_join_equals_batch(spark, events_dir_ordered, sf_dir):
    """Stream-stream interval join == the batch contract query on the
    same events (inner join: the watermark bounds state; with
    time-ordered arrival it cannot drop valid matches)."""
    from queryengine_spark.queries.eventsq import events_click_purchase_attribution
    from queryengine_spark.streaming import attribution_join

    stream = read_event_stream(spark, events_dir_ordered)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = run_stream_to_memory(
        attribution_join(clicks, purchases), "attr_test", "append"
    )
    got = {
        tuple(r) for r in spark.sql(
            "SELECT user_id, click_id, purchase_id, delay_sec, purchase_value FROM attr_test"
        ).collect()
    }
    q.stop()
    want = {
        tuple(r) for r in events_click_purchase_attribution(spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_static_enrichment_equals_batch(spark, events_dir, sf_dir):
    from queryengine_spark.sources.tables import load_table
    from queryengine_spark.streaming import enrich_events

    dim = load_table(spark, sf_dir, "customer")
    stream = read_event_stream(spark, events_dir)
    q = run_stream_to_memory(
        enrich_events(stream, dim), "enrich_test", "append"
    )
    got = {
        (r["event_id"], r["segment"])
        for r in spark.sql("SELECT event_id, segment FROM enrich_test").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["event_id"], r["segment"])
        for r in enrich_events(batch, dim).collect()
    }
    q.stop()
    assert got == want
    assert len(want) > 0
    # the join actually enriched something (not all UNKNOWN)
    assert any(seg != "UNKNOWN" for _, seg in want)


def test_streaming_attribution_outer_join_equals_batch(spark, events_dir_ordered, sf_dir):
    """LEFT OUTER stream-stream join == the batch left join, on the
    clicks the final watermark has CLOSED (an unmatched click's NULL
    row only emits once the watermark passes click_ts + window;
    clicks near the stream head legitimately stay open when the
    source is exhausted, so both sides are restricted to closed
    clicks)."""
    from queryengine_spark.queries.base import epoch_sec, epoch_us
    from queryengine_spark.streaming import attribution_join_outer

    stream = read_event_stream(spark, events_dir_ordered)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = run_stream_to_memory(
        attribution_join_outer(clicks, purchases), "attr_outer_test", "append"
    )
    got_all = spark.sql(
        "SELECT user_id, click_id, purchase_id, delay_sec, purchase_value "
        "FROM attr_outer_test"
    ).collect()
    q.stop()

    e = spark.read.parquet(events_dir_ordered)
    # closed = click window strictly below the watermark the LAST
    # micro-batch evicts with, which is derived from the batches
    # BEFORE it — i.e. the third quarter-file boundary (the fixture
    # splits at ts quantiles), minus the 1h delay, minus the 30min
    # window, minus a 1s safety margin
    q75_us = e.withColumn("us", epoch_us("ts")).approxQuantile("us", [0.75], 0.0)[0]
    cutoff_us = int(q75_us) - 3600 * 1_000_000 - 30 * 60 * 1_000_000 - 1_000_000
    closed = {
        r["event_id"]
        for r in e.filter(
            (F.col("event_type") == "click") & (epoch_us("ts") < F.lit(cutoff_us))
        ).collect()
    }
    assert len(closed) > 0

    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want_rows = (
        c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
            "left",
        )
        .select(
            F.col("cu").alias("user_id"),
            "click_id",
            "purchase_id",
            (epoch_sec("purchase_ts") - epoch_sec("click_ts")).alias("delay_sec"),
            "purchase_value",
        )
        .collect()
    )
    want = {tuple(r) for r in want_rows if r["click_id"] in closed}
    got = {tuple(r) for r in got_all if r["click_id"] in closed}
    assert got == want
    # the outer semantics actually exercised: some closed clicks are unmatched
    assert any(r[2] is None for r in want)


def test_streaming_dedup_against_history_equals_batch(spark, events_dir_ordered, sf_dir):
    """Bloom-prefiltered historical dedup == batch anti-join + exact
    dedup: stream rows whose content hash is new vs history, one
    survivor per hash. Time-ordered replay: with shuffled arrival the
    2h watermark would rightly drop too-late rows as late data."""
    from queryengine_spark.streaming import streaming_dedup_against_history

    from queryengine_spark.streaming import content_hash

    e_batch = spark.read.parquet(events_dir_ordered)
    hashed = e_batch.withColumn("content_hash", content_hash())
    # history = every 3rd distinct hash, as a content-hash relation
    history = (
        hashed.select("content_hash").distinct()
        .filter(F.crc32(F.col("content_hash")) % 3 == 0)
    )

    stream = read_event_stream(spark, events_dir_ordered)
    q = run_stream_to_memory(
        streaming_dedup_against_history(stream, history),
        "hist_dedup_test",
        "append",
    )
    got_hashes = {
        r["content_hash"]
        for r in spark.sql("SELECT content_hash FROM hist_dedup_test").collect()
    }
    n_got = spark.sql("SELECT count(*) AS n FROM hist_dedup_test").collect()[0]["n"]
    q.stop()

    want_hashes = {
        r["content_hash"]
        for r in hashed.select("content_hash")
        .distinct()
        .join(history, "content_hash", "left_anti")
        .collect()
    }
    assert got_hashes == want_hashes
    assert n_got == len(want_hashes)  # exactly one survivor per new hash
    assert 0 < len(want_hashes) < hashed.select("content_hash").distinct().count()


def test_streaming_dedup_bounded_horizon_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: a duplicate within the
    watermark horizon collapses; after the watermark evicts the key,
    the same content emits again (the bounded-state trade)."""
    import os
    import time

    from queryengine_spark.streaming import streaming_dedup_bounded

    def ev(eid, hours, user, etype, value):
        return (eid, f"2024-01-01 {hours:02d}:00:00", user, etype, value, "{}")

    schema = "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    batches = [
        # t=0h and t=1h: same content, within the 2h horizon
        [ev(1, 0, 7, "click", 1.0), ev(2, 1, 7, "click", 1.0)],
        # watermark pusher: unrelated content far in the future
        [ev(3, 10, 8, "view", 2.0)],
        # second pusher: state EVICTION runs in the batch after the
        # watermark advances (measured), so one more batch must pass
        # before the key is re-emittable
        [ev(9, 12, 9, "view", 3.0)],
        # same content again, 13h later — key evicted -> emits again
        [ev(4, 13, 7, "click", 1.0)],
    ]
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).select(
            "event_id",
            F.to_timestamp_ntz("ts_s").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(watch)
        time.sleep(1.1)
    stream = read_event_stream(spark, watch)
    q = run_stream_to_memory(
        streaming_dedup_bounded(stream, watermark="2 hours"), "dedup_bounded", "append"
    )
    ids = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_bounded").collect()
    )
    q.stop()
    # 1 kept, 2 collapsed (within horizon), pushers kept, 4 kept
    # (re-emitted after eviction — the documented horizon trade)
    assert ids == [1, 3, 4, 9]


def test_streaming_heavy_hitters_superset_and_bounded_state(spark, events_dir):
    """The per-key MG sketch folded across micro-batches must (a) keep
    at most k counters per key, and (b) have every TRUE heavy hitter
    (count > N_key/(k+1), computed exactly in batch) in its final
    snapshot — the guarantee is arrival-order independent, so this is
    the stream==batch contract for a sketch operator."""
    from queryengine_spark.streaming import streaming_heavy_hitters

    k = 50
    stream = read_event_stream(spark, events_dir)
    q = run_stream_to_memory(
        streaming_heavy_hitters(stream, "event_type", "user_id", k=k),
        "hh_test",
        "append",
    )
    rows = spark.sql("SELECT * FROM hh_test").collect()
    q.stop()
    assert rows, "stream emitted nothing"
    # final snapshot = max-seq rows per key
    max_seq = {}
    for r in rows:
        max_seq[r["group_key"]] = max(max_seq.get(r["group_key"], 0), r["seq"])
    snapshot: dict[str, set] = {}
    for r in rows:
        if r["seq"] == max_seq[r["group_key"]]:
            snapshot.setdefault(r["group_key"], set()).add(r["term"])
    for key, terms in snapshot.items():
        assert len(terms) <= k, (key, len(terms))

    batch = spark.read.parquet(events_dir)
    exact = (
        batch.groupBy("event_type", "user_id")
        .count()
        .collect()
    )
    totals: dict[str, int] = {}
    for r in exact:
        totals[r["event_type"]] = totals.get(r["event_type"], 0) + r["count"]
    missed = [
        (r["event_type"], r["user_id"], r["count"])
        for r in exact
        if r["count"] > totals[r["event_type"]] / (k + 1)
        and str(r["user_id"]) not in snapshot.get(r["event_type"], set())
    ]
    assert not missed, f"heavy hitters missing from sketch snapshot: {missed[:5]}"
