"""Streaming soak (round-3 verdict stretch item): both stateful
streaming operators — the per-key Misra-Gries heavy-hitters sketch
and the Bloom-prefiltered dedup against a historical corpus — driven
through >= 20 micro-batches with a checkpoint RESTART induced
mid-run, asserting

- state stays O(k) for the sketch: every per-batch emitted snapshot
  (which IS the state content) holds at most k counters per key, at
  every one of the 22 micro-batches, across the restart;
- state/seq continuity across the restart: the per-key sequence
  number keeps counting past the restart boundary (a lost state
  store would reset it to the second run's batch count);
- stream == batch at the contract level: the final sketch snapshot
  is a superset of the exact heavy hitters over ALL data, and the
  historical dedup emits exactly the batch anti-join's distinct new
  hashes with no duplicate or lost rows across the restart
  (exactly-once file-sink log);
- the Bloom bitmap is fixed-size (m_bits/8 bytes) regardless of
  history cardinality.

Measured state sizes are recorded in docs/SCALE.md.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import (
    content_hash,
    read_event_stream,
    streaming_dedup_against_history,
    streaming_heavy_hitters,
)

N_FILES = 22
RESTART_AFTER = 10
K = 20
#: effectively-infinite watermark: arrival order across the 22 files
#: is not time-ordered (round-robin split), so nothing may be "late"
WM = "3650 days"


@pytest.fixture(scope="module")
def soak_files(spark, sf_dir, tmp_path_factory):
    """events split round-robin into N_FILES single-file parquet
    chunks (maxFilesPerTrigger=1 -> one micro-batch per chunk), plus
    the full batch DataFrame staged alongside for oracles."""
    root = tmp_path_factory.mktemp("soak")
    watch = str(root / "watch")
    os.makedirs(watch)
    e = load_table(spark, sf_dir, "events").withColumn(
        "__chunk", F.pmod(F.col("event_id"), F.lit(N_FILES))
    )
    chunks = []
    for i in range(N_FILES):
        p = os.path.join(watch, f"chunk={i:02d}")
        e.filter(F.col("__chunk") == i).drop("__chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        chunks.append(p)
    return root, chunks


def _drain(stream_df, out_dir: str, ckpt_dir: str) -> None:
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


def _stage(spark, chunks, dst: str) -> None:
    """Symlink-free staging: copy chunk parquet files into the live
    watch dir the streams read (so the 'restart' run sees new files)."""
    import shutil

    for src in chunks:
        name = os.path.basename(src)
        if not os.path.exists(os.path.join(dst, name)):
            shutil.copytree(src, os.path.join(dst, name))


def test_soak_heavy_hitters_restart_bounded_state(spark, soak_files, tmp_path):
    root, chunks = soak_files
    watch = str(tmp_path / "hh_watch")
    out = str(tmp_path / "hh_out")
    ckpt = str(tmp_path / "hh_ckpt")
    os.makedirs(watch)

    # run 1: first RESTART_AFTER chunks only
    _stage(spark, chunks[:RESTART_AFTER], watch)
    _drain(
        streaming_heavy_hitters(
            read_event_stream(spark, watch), "event_type", "user_id", k=K
        ),
        out,
        ckpt,
    )
    run1 = spark.read.parquet(out).collect()
    run1_max_seq = max(r["seq"] for r in run1)
    assert run1_max_seq <= RESTART_AFTER

    # induced restart: remaining chunks arrive, NEW query object, same
    # checkpoint — state must resume
    _stage(spark, chunks, watch)
    _drain(
        streaming_heavy_hitters(
            read_event_stream(spark, watch), "event_type", "user_id", k=K
        ),
        out,
        ckpt,
    )
    rows = spark.read.parquet(out).collect()
    assert rows

    # >= 20 micro-batch folds total, and seq continued past the
    # restart (state loss would cap seq at N_FILES - RESTART_AFTER)
    max_seq: dict[str, int] = {}
    for r in rows:
        max_seq[r["group_key"]] = max(max_seq.get(r["group_key"], 0), r["seq"])
    assert max(max_seq.values()) >= 20
    assert max(max_seq.values()) > N_FILES - RESTART_AFTER

    # O(k) state at EVERY batch: each (key, seq) snapshot <= k rows
    snap_sizes: dict[tuple, int] = {}
    for r in rows:
        kk = (r["group_key"], r["seq"])
        snap_sizes[kk] = snap_sizes.get(kk, 0) + 1
    worst = max(snap_sizes.values())
    assert worst <= K, f"state exceeded k: {worst} > {K}"
    print(
        f"\n[soak] batches={max(max_seq.values())} keys={len(max_seq)} "
        f"worst_snapshot={worst} (k={K}) snapshots={len(snap_sizes)}"
    )

    # superset guarantee vs the exact batch counts over ALL chunks
    final: dict[str, set] = {}
    for r in rows:
        if r["seq"] == max_seq[r["group_key"]]:
            final.setdefault(r["group_key"], set()).add(r["term"])
    batch = spark.read.parquet(watch)
    exact = batch.groupBy("event_type", "user_id").count().collect()
    totals: dict[str, int] = {}
    for r in exact:
        totals[r["event_type"]] = totals.get(r["event_type"], 0) + r["count"]
    missed = [
        (r["event_type"], r["user_id"])
        for r in exact
        if r["count"] > totals[r["event_type"]] / (K + 1)
        and str(r["user_id"]) not in final.get(r["event_type"], set())
    ]
    assert not missed, f"true heavy hitters missing after soak: {missed[:5]}"


def _coarse(df):
    """Bucket value to whole units before hashing: the synthetic
    events are hash-unique on the raw (user, type, value) triple, so
    the soak coarsens the content key to manufacture the duplicate
    structure a dedup soak needs (including across the restart)."""
    return df.withColumn("value", F.floor("value").cast("double"))


def test_soak_history_dedup_restart_exactly_once(spark, soak_files, tmp_path):
    from queryengine_spark.operators.bloom import build_bloom_bitmap

    root, chunks = soak_files
    watch = str(tmp_path / "hd_watch")
    out = str(tmp_path / "hd_out")
    ckpt = str(tmp_path / "hd_ckpt")
    os.makedirs(watch)
    _stage(spark, chunks, watch)
    batch = _coarse(spark.read.parquet(watch))
    hashed = batch.withColumn("content_hash", content_hash())
    history = (
        hashed.select("content_hash").distinct()
        .filter(F.crc32(F.col("content_hash")) % 3 == 0)
    )

    # the soak must actually exercise cross-restart dedup state: some
    # NEW hash occurs both before and after the restart boundary
    first_chunks = {i for i in range(RESTART_AFTER)}
    spans = (
        hashed.join(history, "content_hash", "left_anti")
        .withColumn("__chunk", F.pmod(F.col("event_id"), F.lit(N_FILES)))
        .groupBy("content_hash")
        .agg(F.collect_set("__chunk").alias("cs"))
        .collect()
    )
    crossing = [
        r["content_hash"]
        for r in spans
        if any(c in first_chunks for c in r["cs"])
        and any(c not in first_chunks for c in r["cs"])
    ]
    assert crossing, "corpus has no new hash spanning the restart boundary"

    # fixed-size Bloom state regardless of history cardinality
    m_bits = 1 << 22
    bitmap = build_bloom_bitmap(
        history.select(F.col("content_hash")), "content_hash", m_bits
    )
    assert bitmap.nbytes == m_bits // 8

    # run 1 (first chunks), restart, run 2 (rest) — same checkpoint
    watch1 = str(tmp_path / "hd_watch1")
    os.makedirs(watch1)
    _stage(spark, chunks[:RESTART_AFTER], watch1)
    _drain(
        streaming_dedup_against_history(
            _coarse(read_event_stream(spark, watch1)), history, watermark=WM
        ),
        out,
        ckpt,
    )
    _stage(spark, chunks, watch1)
    _drain(
        streaming_dedup_against_history(
            _coarse(read_event_stream(spark, watch1)), history, watermark=WM
        ),
        out,
        ckpt,
    )

    got = spark.read.parquet(out)
    got_hashes = {r["content_hash"] for r in got.select("content_hash").collect()}
    n_got = got.count()
    want_hashes = {
        r["content_hash"]
        for r in hashed.select("content_hash")
        .distinct()
        .join(history, "content_hash", "left_anti")
        .collect()
    }
    # batch parity AND exactly-once across the restart: one survivor
    # per new hash, nothing lost, nothing duplicated — in particular
    # the boundary-crossing hashes collapsed via restored state
    assert got_hashes == want_hashes
    assert n_got == len(want_hashes)


def test_soak_anomaly_window_restart_equals_batch(spark, soak_files, tmp_path):
    """Round-4 addition: the stateful anomaly stream driven through
    all 22 micro-batches with a mid-run restart. The hourly-count
    fold is additive and the state is the full bucketed series, so
    after the restart the FINAL (max batch_seq per type) snapshot
    must equal the batch twin exactly — any state loss at the restart
    boundary would under-count every bucket that arrived in run 1."""
    from collections import Counter, defaultdict

    from queryengine_spark.queries.addenda import ANOM_K, ANOM_MIN_N, ANOM_WIN
    from queryengine_spark.streaming import streaming_anomaly_window

    root, chunks = soak_files
    watch = str(tmp_path / "an_watch")
    out = str(tmp_path / "an_out")
    ckpt = str(tmp_path / "an_ckpt")
    os.makedirs(watch)

    _stage(spark, chunks[:RESTART_AFTER], watch)
    _drain(streaming_anomaly_window(read_event_stream(spark, watch)), out, ckpt)
    run1_max = max(r["batch_seq"] for r in spark.read.parquet(out).collect())
    assert run1_max <= RESTART_AFTER

    _stage(spark, chunks, watch)
    _drain(streaming_anomaly_window(read_event_stream(spark, watch)), out, ckpt)
    rows = spark.read.parquet(out).collect()

    last_seq: dict[str, int] = {}
    for r in rows:
        last_seq[r["event_type"]] = max(last_seq[r["event_type"]], r["batch_seq"]) \
            if r["event_type"] in last_seq else r["batch_seq"]
    # seq continuity across the restart
    assert max(last_seq.values()) >= 20
    got = {
        (r["event_type"], r["bucket"]): (
            r["cnt"], r["win_n"], r["win_sum"], r["win_sumsq"], r["is_anomaly"]
        )
        for r in rows
        if r["batch_seq"] == last_seq[r["event_type"]]
    }

    # batch reference over ALL chunks
    ev = [
        (r["event_type"], r["bucket"])
        for r in spark.read.option("basePath", watch).parquet(watch).selectExpr(
            "event_type",
            "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS bucket",
        ).collect()
    ]
    counts = Counter(ev)
    series = defaultdict(list)
    for (et, b), c in sorted(counts.items()):
        series[et].append((b, c))
    want = {}
    for et, rws in series.items():
        for i, (b, c) in enumerate(rws):
            win = [x for _, x in rws[max(0, i - ANOM_WIN) : i]]
            n, s, ss = len(win), sum(win), sum(x * x for x in win)
            flag = int(
                n >= ANOM_MIN_N
                and (n * c - s) ** 2 > ANOM_K * ANOM_K * (n * ss - s * s)
            )
            want[(et, b)] = (c, n, s, ss, flag)
    assert got == want
