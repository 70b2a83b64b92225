"""Structured Streaming operators over the events stream.

The reference engine is strictly batch (SURVEY §2.2: streaming =
none); this module is the driver's north-star extension. Batch
semantics of the same aggregations live in queries/eventsq.py — the
tests assert streaming results == batch results on the same data.

Patterns covered:
- tumbling windowed aggregation with a watermark (late-data bound),
- streaming dedup (exact lifetime via dropDuplicates, and
  horizon-bounded via dropDuplicatesWithinWatermark),
- memory-sink runner for deterministic tests.

At scale these run against a Kafka/file source with checkpointing;
the transformations are source-agnostic (they take any streaming
DataFrame with the events schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (one file per micro-batch by default;
    swap for Kafka in production — everything downstream is agnostic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data
    watermark. Works on both streaming and batch DataFrames (same
    plan — the batch run is the correctness oracle)."""
    from queryengine_spark.queries.base import dec_sum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def content_hash() -> "F.Column":
    """The ONE content-hash definition every dedup surface shares.
    to_json(struct(...)) preserves null positions — concat_ws would
    silently drop NULL fields and collide rows that differ only in
    which field is null."""
    return F.md5(F.to_json(F.struct("user_id", "event_type", "value")))


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming EXACT dedup: the first event per content hash ever
    seen survives. Exact lifetime dedup inherently keeps one state
    entry per distinct key — state is O(distinct keys), NOT bounded
    by the watermark (Spark only evicts dedup state when the
    event-time column is part of the key). Where a horizon bound
    matters more than cross-horizon exactness, use
    :func:`streaming_dedup_bounded`."""
    keyed = events.withColumn("content_hash", content_hash())
    return keyed.withWatermark("ts", watermark).dropDuplicates(["content_hash"])


def streaming_dedup_bounded(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Horizon-bounded streaming dedup via
    ``dropDuplicatesWithinWatermark``: duplicates arriving within the
    watermark delay of the first sighting collapse; state for a key
    is dropped once the watermark passes, so the store is bounded by
    the horizon — the trade being that a duplicate recurring AFTER
    the horizon emits again. The right contract for at-least-once
    sources whose duplicates are temporally close (retries, replays);
    exact lifetime dedup is :func:`streaming_dedup`."""
    keyed = events.withColumn("content_hash", content_hash())
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("session_id", LongType(), True),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType(), True),
        StructField("counter", LongType(), True),
    ]
)


def streaming_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    gap-based session assignment per user, with (last event time,
    session counter) carried across micro-batches as typed state.
    Equals the batch window-function sessionization when micro-batches
    arrive in event-time order (asserted in tests); for out-of-order
    arrivals use :func:`streaming_sessionize_ooo`.
    """
    import pandas as pd  # local import: worker-side dependency

    gap_us = gap_minutes * 60 * 1_000_000

    def assign(key, pdf_iter, state):
        if state.exists:
            last_us, counter = state.get
        else:
            last_us, counter = None, 0
        # concatenate before sorting: one key's micro-batch rows can
        # span multiple Arrow chunks, and per-chunk sorting would not
        # be a global (ts, event_id) order
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            us = pdf["ts"].astype("int64") // 1000  # ns → µs
            sessions = []
            for u in us:
                if last_us is None or u - last_us > gap_us:
                    counter += 1
                last_us = int(u)
                sessions.append(counter)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "session_id": pd.Series(sessions, dtype="int64").values,
                }
            )
        state.update((last_us, counter))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_OOO_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType(), True),
        StructField("counter", LongType(), True),
        StructField("buf_ts", ArrayType(LongType()), True),
        StructField("buf_ids", ArrayType(LongType()), True),
    ]
)


def streaming_sessionize_ooo(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Out-of-order-safe gap sessionization: watermark + event buffer.

    Each user's state buffers (ts, event_id) pairs; on every call the
    buffer is sorted and only the prefix with ts < current watermark
    is assigned session ids and EMITTED — by the watermark contract no
    later-arriving row can precede it, so emitted assignments are
    final and equal the batch window-function result regardless of
    arrival order (bounded by the watermark delay; rows later than
    that are dropped by Spark upstream, the standard watermark
    semantics). The un-finalized suffix stays in state, and an
    event-time timeout re-fires the group when the watermark passes
    its buffered events so they flush even if the user never appears
    in another micro-batch.

    State bounds: the event BUFFER is bounded by the watermark
    horizon (only events within ``watermark`` of the stream head are
    ever un-finalized). The per-user (last_us, counter) pair persists
    for the stream's lifetime — O(lifetime-distinct users), the
    inherent cost of per-user monotone session counters (evicting it
    would restart ids and collide with earlier sessions). Where that
    footprint matters, derive the session id from the session's first
    event time instead and evict idle users freely — first-event-time
    ids need no cross-session state.
    """
    import pandas as pd  # local import: worker-side dependency

    gap_us = gap_minutes * 60 * 1_000_000

    def assign(key, pdf_iter, state):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            last_us, counter, buf_ts, buf_ids = state.get
            buf = list(zip(buf_ts or [], buf_ids or []))
        else:
            last_us, counter, buf = None, 0, []
        for pdf in pdf_iter:
            if len(pdf):
                us = pdf["ts"].astype("int64") // 1000  # ns → µs
                buf.extend(zip(us.tolist(), pdf["event_id"].tolist()))
        buf.sort()  # (ts, event_id) — the batch oracle's total order
        out_ids: list[int] = []
        out_sess: list[int] = []
        n_final = 0
        for ts_us, eid in buf:
            if ts_us >= wm_us:
                break
            if last_us is None or ts_us - last_us > gap_us:
                counter += 1
            last_us = ts_us
            out_ids.append(eid)
            out_sess.append(counter)
            n_final += 1
        keep = buf[n_final:]
        state.update(
            (last_us, counter, [t for t, _ in keep], [i for _, i in keep])
        )
        if keep:
            # re-fire when the watermark moves, so the suffix flushes
            # without requiring new rows for this user
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]] * len(out_ids), dtype="int64"),
                    "event_id": pd.Series(out_ids, dtype="int64"),
                    "session_id": pd.Series(out_sess, dtype="int64"),
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_OOO_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def attribution_join(
    clicks: DataFrame, purchases: DataFrame, window_minutes: int = 30,
    watermark: str = "1 hour", how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: click→purchase attribution.
    Each purchase joins every click by the same user in the preceding
    ``window_minutes``. Watermarks on BOTH sides plus the time-range
    join condition bound the state store: clicks are dropped once the
    purchase-side watermark passes click_ts + window (Structured
    Streaming derives the eviction bound from the interval
    condition). Same output columns as the batch
    ``events_click_purchase_attribution`` query — pytest asserts
    stream == batch.

    ``how='leftOuter'``: every click appears — an UNMATCHED click
    emits its NULL-purchase row once the purchase-side watermark
    passes click_ts + window (before that a match could still
    arrive; delayed NULL emission is the defining outer-join
    semantic in Structured Streaming). Same state eviction bound."""
    c = clicks.select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    joined = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
        how,
    )
    from queryengine_spark.queries.base import epoch_sec

    return joined.select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            epoch_sec("purchase_ts") - epoch_sec("click_ts")
        ).alias("delay_sec"),
        "purchase_value",
    )


def attribution_join_outer(
    clicks: DataFrame, purchases: DataFrame, window_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """attribution_join with how='leftOuter' (see its docstring)."""
    return attribution_join(clicks, purchases, window_minutes, watermark, "leftOuter")


def streaming_dedup_against_history(
    events: DataFrame,
    history: DataFrame,
    key_col: str = "content_hash",
    watermark: str = "2 hours",
    m_bits: int = 1 << 22,
) -> DataFrame:
    """Incremental-ingest dedup: keep only stream rows whose content
    hash is NEW vs a historical corpus AND first within the stream —
    the shape an always-on training-data pipeline runs as new crawl
    arrives.

    Per micro-batch the full history is never joined: a fixed-size
    Bloom bitmap of historical keys (built once at plan time by the
    bounded aggregation in operators/bloom.py) filters each batch
    down to definite-new rows plus a small maybe-seen residue, and
    only the residue goes through the stream-static join. Structured
    Streaming has no stream-static LEFT ANTI, so the residual is a
    LEFT OUTER against the (deduplicated, broadcastable) history keys
    with a static-side-NULL filter — the standard anti-join encoding.
    Bloom has no false negatives, so the union is EXACTLY the
    anti-join result; within-stream duplicates then collapse via
    exact dropDuplicates (state O(distinct NEW keys) — see
    streaming_dedup's docstring for the exact-vs-bounded trade)."""
    from queryengine_spark.operators.bloom import (
        DEFAULT_K,
        _positions,
        build_bloom_bitmap,
        might_contain_udf,
    )

    keyed = events.withColumn(key_col, content_hash())
    hist_keys = history.select(F.col(key_col).alias("__hist_key")).distinct()
    bitmap = build_bloom_bitmap(
        hist_keys.select(F.col("__hist_key").alias(key_col)), key_col, m_bits
    )
    bc = events.sparkSession.sparkContext.broadcast(bitmap)
    might_contain = might_contain_udf(bc)

    flagged = keyed.withColumn(
        "__maybe_seen", might_contain(_positions(F.col(key_col), m_bits, DEFAULT_K))
    )
    fresh = flagged.filter(~F.col("__maybe_seen"))
    residue = (
        flagged.filter(F.col("__maybe_seen"))
        .join(
            F.broadcast(hist_keys),
            F.col(key_col) == F.col("__hist_key"),
            "left_outer",
        )
        .filter(F.col("__hist_key").isNull())
        .drop("__hist_key")
    )
    new_rows = fresh.unionByName(residue).drop("__maybe_seen")
    return new_rows.withWatermark("ts", watermark).dropDuplicates([key_col])


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: attach a dimension attribute
    (customer market segment) to an event stream. The static side is
    broadcast — each micro-batch joins against the in-memory dim with
    no shuffle and no state store (stream-static joins are stateless
    by construction; the dim is re-broadcast only when Spark re-plans).
    Works identically on a batch DataFrame — the contract query
    ``events_enriched_segment_counts`` is the batch twin and pytest
    asserts stream == batch."""
    d = F.broadcast(
        dim.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return events.join(d, "user_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )


def run_stream_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "complete"
):
    """Drive a streaming DataFrame into an in-memory table and block
    until all available source data is processed (test harness)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


HH_OUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("term", StringType()),
        StructField("lower_count", LongType()),
        StructField("seq", LongType()),
    ]
)

_HH_STATE_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("seq", LongType(), True),
    ]
)


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "event_type",
    term_col: str = "user_id",
    k: int = 50,
) -> DataFrame:
    """Stateful streaming heavy hitters: one bounded weighted
    Misra-Gries sketch (k counters) per group key, folded across
    micro-batches via applyInPandasWithState — the streaming twin of
    the batch two-pass ``heavy_hitters_exact``
    (operators/curation.py).

    Guarantee (arrival-order independent, so stream == batch at the
    contract level): total decrement across the whole run is at most
    N/(k+1), so any term with overall frequency > N_group/(k+1) has a
    positive final count and is in the candidate set — the emitted
    snapshot is a guaranteed superset of the true heavy hitters, with
    ``lower_count`` a lower bound on the true count. State per key is
    O(k) forever (no watermark needed — the sketch, not retention,
    bounds it). Each batch emits the full current snapshot stamped
    with a per-key sequence number; consumers read the max-seq rows
    (tests do exactly that), or run the exact verify pass of the
    batch twin over the final candidates.
    """
    import pandas as pd  # local import: worker-side dependency

    from queryengine_spark.operators.curation import _mg_insert

    def fold(key, pdf_iter, state):
        if state.exists:
            terms, counts, seq = state.get
            counters = dict(zip(terms, counts))
        else:
            counters, seq = {}, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            vc = pdf[term_col].astype(str).value_counts()
            for t, c in vc.items():
                _mg_insert(counters, t, int(c), k)
        seq += 1
        yield pd.DataFrame(
            {
                "group_key": [str(key[0])] * len(counters),
                "term": list(counters.keys()),
                "lower_count": [int(v) for v in counters.values()],
                "seq": [seq] * len(counters),
            }
        )
        state.update(
            ([str(t) for t in counters], [int(v) for v in counters.values()], seq)
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SNAP_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("seq", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("batch_seq", LongType()),
    ]
)

_SNAP_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("batch_seq", LongType(), True),
    ]
)


def streaming_latest_snapshot(events: DataFrame) -> DataFrame:
    """Streaming materialized snapshot: the latest (by microsecond
    sequence) event per user, maintained across micro-batches — the
    streaming twin of the batch CDC apply
    (``operators/merge.py::apply_cdc``: same latest-seq-wins
    reduction, state instead of a window).

    State per key is ONE row (seq + payload) forever — no watermark
    needed, the reduction itself bounds it; a hot key that changes a
    billion times still holds one row of state. Arrival order is
    irrelevant (max-seq is order-independent), so out-of-order and
    cross-batch replays converge to the identical snapshot — stream
    == batch at the contract level, which the soak test asserts
    through an induced restart.

    Each batch emits the key's CURRENT winner stamped with a per-key
    ``batch_seq``; consumers read the max-``batch_seq`` row per key
    (the usual changelog→snapshot read), applying any tombstone
    policy (e.g. drop rows whose final event_type marks deletion)
    downstream, exactly as the batch twin filters op = 'D'.
    """
    import pandas as pd  # local import: worker-side dependency

    from queryengine_spark.queries.base import epoch_us

    ev = events.select(
        "user_id", epoch_us("ts").alias("seq"), "event_type", "value"
    )

    def fold(key, pdf_iter, state):
        if state.exists:
            seq, etype, value, batch_seq = state.get
        else:
            seq, etype, value, batch_seq = None, None, None, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # Null-safe fold: the batch twin (apply_cdc) carries null
            # payload fields through, so a NULL value/event_type must
            # update state as None rather than raise TypeError inside
            # the state function (which would kill the whole query).
            # Rows with a NULL seq are unorderable — drop them, same
            # as the batch twin's seq-window never ranking them first.
            pdf = pdf[pdf["seq"].notna()]
            if not len(pdf):
                continue
            row = pdf.loc[pdf["seq"].idxmax()]
            if seq is None or int(row["seq"]) > seq:
                seq = int(row["seq"])
                etype = None if pd.isna(row["event_type"]) else str(row["event_type"])
                value = None if pd.isna(row["value"]) else float(row["value"])
        batch_seq += 1
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "seq": [seq],
                "event_type": [etype],
                "value": [value],
                "batch_seq": [batch_seq],
            }
        )
        state.update((seq, etype, value, batch_seq))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SNAP_OUT_SCHEMA,
        stateStructType=_SNAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOM_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", StringType()),
        StructField("cnt", LongType()),
        StructField("win_n", LongType()),
        StructField("win_sum", LongType()),
        StructField("win_sumsq", LongType()),
        StructField("is_anomaly", IntegerType()),
        StructField("batch_seq", LongType()),
    ]
)

_ANOM_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("batch_seq", LongType(), True),
    ]
)


def streaming_anomaly_window(events: DataFrame) -> DataFrame:
    """Streaming twin of ``queries/addenda.py::events_anomaly_window``:
    per event type, fold the hourly count series across micro-batches
    (additive, so arrival order cannot matter) and re-emit the flagged
    snapshot — the trailing-24-bucket integer z²-test
    (n·x − s)² > K²·(n·ss − s²) over the observed bucket series —
    stamped with a per-key batch sequence; consumers read max-seq
    rows (the tests do exactly that).

    State per key is the BUCKETED series — O(hours of history), never
    O(events): a decade of hourly buckets is ~88k (string, long)
    pairs per event type, which is what makes keep-everything viable
    and the stream==batch equality exact (no eviction horizon to
    diverge under). If the bucket domain were unbounded (e.g.
    per-user keys), bound it the way ``streaming_dedup_bounded``
    does — evict below a watermark and document the horizon.
    """
    import pandas as pd  # local import: worker-side dependency

    from queryengine_spark.queries.addenda import ANOM_K, ANOM_MIN_N, ANOM_WIN

    ev = events.select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
    )

    def fold(key, pdf_iter, state):
        if state.exists:
            buckets, counts, batch_seq = state.get
            series = dict(zip(buckets, counts))
        else:
            series, batch_seq = {}, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            for b, c in pdf["bucket"].value_counts().items():
                series[str(b)] = series.get(str(b), 0) + int(c)
        batch_seq += 1
        out = {k: [] for k in (
            "event_type", "bucket", "cnt", "win_n", "win_sum", "win_sumsq",
            "is_anomaly", "batch_seq",
        )}
        items = sorted(series.items())
        for i, (b, c) in enumerate(items):
            win = [x for _, x in items[max(0, i - ANOM_WIN) : i]]
            n, s, ss = len(win), sum(win), sum(x * x for x in win)
            dev = n * c - s
            flag = int(n >= ANOM_MIN_N and dev * dev > ANOM_K * ANOM_K * (n * ss - s * s))
            out["event_type"].append(str(key[0]))
            out["bucket"].append(b)
            out["cnt"].append(c)
            out["win_n"].append(n)
            out["win_sum"].append(s)
            out["win_sumsq"].append(ss)
            out["is_anomaly"].append(flag)
            out["batch_seq"].append(batch_seq)
        yield pd.DataFrame(out)
        state.update(
            ([b for b, _ in items], [int(c) for _, c in items], batch_seq)
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_append_to_pq_index(
    vectors: DataFrame, id_col: str, vec_col: str, path: str
):
    """Streaming ingestion into the persistent IVF-PQ artifact (r6):
    each micro-batch is encoded with the artifact's FROZEN training
    state and appended to the cell-partitioned code relation
    (operators/annindex.py::append_to_pq_index — FAISS add()
    semantics; quantizer drift is a reindex decision, never an
    ingest side effect). foreachBatch is the right shape because the
    sink is an idempotent-by-content parquet append keyed by the
    batch's ids, and encoding is a bounded map-side pass — no
    streaming state at all. Returns the started query
    (availableNow trigger: drains what exists, then stops)."""
    from queryengine_spark.operators.annindex import append_to_pq_index

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_pq_index(batch_df, id_col, vec_col, path)

    return (
        vectors.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_append_to_minhash_index(
    docs: DataFrame, id_col: str, text_col: str, path: str
):
    """Streaming ingestion into the persistent MinHash band-bucket
    dedup index (r7 — the dedup twin of
    :func:`stream_append_to_pq_index`, completing the ingest-time
    dedup story): each micro-batch is hashed with the ARTIFACT's
    frozen parameters (meta carries n_hashes/band_size/shingle_n —
    changing them is a reindex decision, never an ingest side effect)
    and its band-bucket rows are appended to the bucket-prefix-
    partitioned relation. foreachBatch is the right shape because the
    sink append is idempotent AT THE FLAG LEVEL by set semantics
    (duplicate bucket rows cannot change any DISTINCT/semi-join
    outcome in incremental_flags_from_index) and hashing is a bounded
    map-side pass — no streaming state at all. Returns the started
    query (availableNow trigger: drains what exists, then stops)."""
    from queryengine_spark.operators.annindex import append_to_minhash_index

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_minhash_index(batch_df, id_col, text_col, path)

    return (
        docs.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_gate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: list,
    path: str,
    n_buckets: int = 65536,
):
    """Streaming quality gate (r8 — verdict item 7): score each
    micro-batch of documents against the FROZEN trained classifier
    weights (operators/curation.py::serve_feature_classifier — one
    broadcast-weights join over the hashed feature relation) and
    append (id, n_feats, trained_margin, trained_label) to the
    parquet gate log, so quality filtering runs at ingest exactly
    like the dedup and ANN index twins. foreachBatch is the right
    shape because scoring is a stateless per-document map+broadcast
    pass with frozen weights (retraining is a refit decision, never
    an ingest side effect) and the sink append is idempotent by id.
    Returns the started query (availableNow trigger: drains what
    exists, then stops)."""
    from queryengine_spark.operators.curation import serve_feature_classifier

    def _score(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        serve_feature_classifier(
            batch_df, id_col, text_col, weights, n_buckets
        ).write.mode("append").parquet(path)

    return (
        docs.writeStream.foreachBatch(_score)
        .trigger(availableNow=True)
        .start()
    )

def stream_warc_wet_gate(
    shards: DataFrame,
    weights: list,
    path: str,
    n_buckets: int = 65536,
):
    """The FULL CommonCrawl ingest path as a stream (r9 — verdict
    item 7): each micro-batch of raw WARC shards goes container →
    real record walk (multi-member RFC 1952 + header grammar) → HTTP
    header strip (sources/warc.py::warc_wet_payloads — the WET
    producer) → HTML text extraction (the same Column chain the
    batch query certifies) → frozen-weight quality gate
    (operators/curation.py::serve_feature_classifier), appended to
    the parquet gate log. foreachBatch because every step is a
    stateless per-record map with broadcast weights; the sink append
    is idempotent by (shard_id, rec_idx). Returns the started query
    (availableNow trigger: drains what exists, then stops).

    Output columns: shard_id, rec_idx, fmt, uri_hash, text plus the
    gate's n_feats / trained_margin / trained_label."""
    from queryengine_spark.operators.curation import serve_feature_classifier
    from queryengine_spark.queries.curation2 import html_clean_text
    from queryengine_spark.sources.warc import warc_wet_payloads

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        wet = warc_wet_payloads(batch_df).withColumn(
            "text", html_clean_text(F.col("html"))
        )
        scored = serve_feature_classifier(
            wet.withColumn(
                "rid", F.col("shard_id") * 1_000_000 + F.col("rec_idx")
            ),
            "rid",
            "text",
            weights,
            n_buckets,
        )
        (
            wet.withColumn(
                "rid", F.col("shard_id") * 1_000_000 + F.col("rec_idx")
            )
            .select("rid", "shard_id", "rec_idx", "fmt", "uri_hash", "text")
            .join(scored.withColumnRenamed("id", "rid"), "rid")
            .drop("rid")
            .write.mode("append")
            .parquet(path)
        )

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )

def stream_warc_cdx(shards: DataFrame, path: str):
    """Incremental CDX indexing at ingest (r9): each micro-batch of
    raw WARC shards runs the span-tracking record walk
    (sources/warc.py::warc_cdx_records) and appends its CDX rows to
    the parquet index — how a crawler keeps its capture index current
    as segments land, without re-reading old shards. foreachBatch
    because indexing is a stateless per-shard map; the sink append is
    idempotent by (shard_id, rec_idx). Returns the started query
    (availableNow trigger)."""
    from queryengine_spark.sources.warc import warc_cdx_records

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        warc_cdx_records(batch_df).write.mode("append").parquet(path)

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )



def stream_archive_members(shards: DataFrame, path: str):
    """Incremental WebDataset-shard ingestion (r10 — the archive
    twin of :func:`stream_warc_cdx`): each micro-batch of raw
    tar/tgz/tbz/txz/zip/tzst/jzst shards runs the real container walk
    (sources/archives.py::archive_members — ustar checksum walk /
    central-directory walk / from-scratch zstd unwrap, all seven
    codec paths) and appends the
    member relation to parquet — how a training pipeline ingests
    shard drops as they land, without re-reading old shards.
    foreachBatch because member fan-out is a stateless per-shard
    map; the sink append is idempotent by (shard_id, ordinal).
    Returns the started query (availableNow trigger: drains what
    exists, then stops)."""
    from queryengine_spark.sources.archives import archive_members

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        archive_members(batch_df).write.mode("append").parquet(path)

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pos_threshold: float = 0.30,
):
    """Incremental hard-negative mining (r11 — the contrastive-
    training twin): each micro-batch of NEW anchor vectors is mined
    against the static corpus (operators/knn.py::
    hard_negative_mining — presumed-positive exclusion + top-k) and
    the per-anchor negative sets append to parquet — how an
    embedding-training pipeline keeps its negative pool fresh as
    anchors stream in. foreachBatch because mining is stateless per
    anchor given the corpus snapshot; the sink append is idempotent
    by (query_id, rn). Returns the started query (availableNow
    trigger)."""
    from queryengine_spark.operators.knn import hard_negative_mining

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hard_negative_mining(
            batch_df, corpus, id_col, vec_col,
            k=k, pos_threshold=pos_threshold,
        ).write.mode("append").parquet(path)

    return (
        anchors.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_tfrecord_examples(shards: DataFrame, path: str):
    """Incremental TFRecord ingestion (r11): each micro-batch of
    framed shards runs the CRC32C + wire-format walk
    (sources/tfrecord.py::tfrecord_examples) and appends the
    per-example relation to parquet. foreachBatch; idempotent append
    by (shard_id, rec_idx). Returns the started query (availableNow
    trigger)."""
    from queryengine_spark.sources.tfrecord import tfrecord_examples

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tfrecord_examples(batch_df).write.mode("append").parquet(path)

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_sqlite_rows(shards: DataFrame, path: str):
    """Incremental SQLite-dump ingestion (r11 — the database twin of
    :func:`stream_avro_records`): each micro-batch of serialized
    database files runs the from-scratch page walk
    (sources/sqlitefile.py::sqlite_rows) and appends the per-row
    relation to parquet — how a pipeline drains app-data dumps as
    they land. foreachBatch; idempotent append by (shard_id, rid).
    Returns the started query (availableNow trigger)."""
    from queryengine_spark.sources.sqlitefile import sqlite_rows

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sqlite_rows(batch_df).write.mode("append").parquet(path)

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_avro_records(shards: DataFrame, path: str):
    """Incremental Avro OCF ingestion (r11 — the record-container
    twin of :func:`stream_pdf_text`): each micro-batch of raw OCF
    shard payloads runs the real container walk (sources/avro.py::
    avro_records — schema resolution, varint decode, block/sync
    validation, null/deflate/snappy codecs) and appends the
    per-record relation to parquet — how a pipeline drains Kafka
    archive dumps as they land. foreachBatch because decoding is a
    stateless per-shard map; the sink append is idempotent by
    (shard_id, rec_idx). Returns the started query (availableNow
    trigger: drains what exists, then stops)."""
    from queryengine_spark.sources.avro import avro_records

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        avro_records(batch_df).write.mode("append").parquet(path)

    return (
        shards.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )


def stream_pdf_text(docs: DataFrame, path: str):
    """Incremental PDF text extraction (r11 — the document twin of
    :func:`stream_archive_members`): each micro-batch of raw PDF
    payloads runs the real document walk (sources/pdf.py::
    pdf_text_stats — startxref/xref//Prev chain, FlateDecode,
    Tj/TJ tokenizer) and appends the per-page text-stats relation to
    parquet — how a crawl pipeline extracts text from document drops
    as they land. foreachBatch because extraction is a stateless
    per-document map; the sink append is idempotent by
    (doc_id, page_idx). Returns the started query (availableNow
    trigger: drains what exists, then stops)."""
    from queryengine_spark.sources.pdf import pdf_text_stats

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pdf_text_stats(batch_df).write.mode("append").parquet(path)

    return (
        docs.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .start()
    )
