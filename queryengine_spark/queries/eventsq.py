"""Event-stream analytics (batch semantics with DuckDB oracles; the
same logic runs incrementally in queryengine_spark.streaming via
Structured Streaming — tested in tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.queries.base import dec_sum, epoch_sec, epoch_us, t

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def events_tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour window per event type: count, exact-decimal
    value sum, distinct users. Window start crosses the engine
    boundary as a formatted string (timestamp-type neutral)."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization, BOTH formulations in one composite
    (r6 fold of events_session_window_native — COVERAGE.md rotation
    note; both legs still execute inside this one hash):

    - leg 'wf': lag + running sum of session-start flags, then
      per-session rollup (microsecond integer arithmetic);
    - leg 'native': Spark's BUILT-IN session_window operator (one
      hash-aggregate with window merging — the code path Structured
      Streaming uses for streaming sessions). Note the built-in's
      merge rule: an event extends a session iff ts < prev_ts + gap,
      i.e. a gap EXACTLY equal to 30 min starts a NEW session — one
      tick stricter than leg wf's diff > gap; the oracle mirrors each
      leg's own rule.

    Legs union on a shared padded schema, distinguished by ``leg``."""
    wf = _sessionize_wf(spark, sf).select(
        F.lit("wf").alias("leg"),
        "user_id",
        "session_id",
        "session_start",
        F.lit(None).cast("string").alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("duration_us").cast("bigint").alias("duration_us"),
        F.lit(None).cast("double").alias("sum_value"),
    )
    native = _sessionize_native(spark, sf).select(
        F.lit("native").alias("leg"),
        "user_id",
        F.lit(None).cast("bigint").alias("session_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lit(None).cast("bigint").alias("duration_us"),
        "sum_value",
    )
    return wf.unionByName(native)


def _sessionize_wf(spark: SparkSession, sf: str) -> DataFrame:
    """Window-function leg: lag + running sum of session-start flags,
    then per-session rollup. Microsecond arithmetic so both engines
    compare the same integers."""
    e = t(spark, sf, "events").withColumn("us", epoch_us("ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("us", 1).over(w).isNull()
            | ((F.col("us") - F.lag("us", 1).over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, event_id, ts, us,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MAX(us) - MIN(us) AS duration_us,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start
FROM sess
GROUP BY user_id, session_id
"""

#: r6 composite oracle: both legs on the shared padded schema
SESSIONIZE_SUITE_SQL = """
WITH wf_leg AS ({wf}),
native_leg AS ({native})
SELECT 'wf' AS leg, user_id, CAST(session_id AS BIGINT) AS session_id,
       session_start, CAST(NULL AS VARCHAR) AS session_end,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(duration_us AS BIGINT) AS duration_us,
       CAST(NULL AS DOUBLE) AS sum_value
FROM wf_leg
UNION ALL
SELECT 'native' AS leg, user_id, CAST(NULL AS BIGINT) AS session_id,
       session_start, session_end,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(NULL AS BIGINT) AS duration_us,
       CAST(sum_value AS DOUBLE) AS sum_value
FROM native_leg
"""


def _sessionize_native(spark: SparkSession, sf: str) -> DataFrame:
    """Built-in session_window leg (see events_sessionize docstring
    for the merge-rule subtlety)."""
    e = t(spark, sf, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", fmt).alias("session_start"),
            F.date_format("sw.end", fmt).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS sum_value
FROM sess
GROUP BY user_id, sid
"""


def events_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """OVERLAPPING (sliding) windows via the built-in window operator:
    2-hour windows advancing every hour, so each event lands in two
    windows — the shape hourly-refreshed trailing metrics use. The
    oracle expands each event to its two hour-aligned window starts."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SLIDING_SQL = """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS sum_value
FROM (
  SELECT event_type, value,
         unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS ws
  FROM events
)
GROUP BY ws, event_type
"""


def events_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured scalar surface AND dirty-data resilience in one
    per-event-type relation (r5 fold of the former
    events_json_malformed_audit into this query — both legs still run
    and feed the hash):

    - clean leg: JSON path extraction ($.k) from the events props
      column, aggregated per event type (n, sum/min/max);
    - audit leg: the same extraction over a stream where every 13th
      payload gets planted garbage (the synthetic props are all
      well-formed). Spark's Jackson-based get_json_object returns
      NULL on malformed input instead of failing the job; the audit
      counts parse failures and sums only the valid values — the
      triage a real ingest runs before tightening a schema. The
      corruption hits the PREFIX because Jackson is lenient about
      trailing garbage but rejects a broken document start. Oracle
      guards with json_valid() since DuckDB's extraction errors on
      invalid JSON rather than returning NULL."""
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    dirty = F.when(
        F.col("event_id") % 13 == 0, F.concat(F.lit("}{"), F.col("props"))
    ).otherwise(F.col("props"))
    kd = F.get_json_object(dirty, "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k_value"), kd.alias("k_dirty"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_value").alias("sum_k"),
            F.min("k_value").alias("min_k"),
            F.max("k_value").alias("max_k"),
            F.sum(F.col("k_dirty").isNull().cast("int")).cast("bigint").alias("n_malformed"),
            F.sum("k_dirty").alias("sum_valid_k"),
        )
    )


JSON_SQL = """
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INT) AS k,
         CASE WHEN json_valid(CASE WHEN event_id % 13 = 0
                                   THEN '}{' || props ELSE props END)
              THEN CAST(json_extract_string(props, '$.k') AS INT) END AS kd
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS INT) AS min_k,
       CAST(MAX(k) AS INT) AS max_k,
       CAST(SUM(CASE WHEN kd IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
       CAST(SUM(kd) AS BIGINT) AS sum_valid_k
FROM parsed GROUP BY event_type
"""


def shipping_delay_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Date arithmetic across a join: days between order date and ship
    date, summarized per order priority."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("delay_days"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("delay_days").alias("total_delay_days"),
        F.max("delay_days").alias("max_delay_days"),
    )


SHIPPING_DELAY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_lines,
       CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS total_delay_days,
       CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INT) AS max_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def events_asof_last_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (no Spark built-in — operators/asof.py): each click
    event annotated with the user's most recent purchase at or before
    it. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from queryengine_spark.operators.asof import as_of_join

    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = as_of_join(clicks, purchases, ["user_id"], "ts", "ts", ["value"])
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("click_ts"),
        F.date_format("asof_ts", fmt).alias("last_purchase_ts"),
        F.col("asof_value").alias("last_purchase_value"),
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts,
       p.value AS last_purchase_value
FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
"""


def events_range_join_active_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Range join with no equi key (operators/rangejoin.py): for every
    error event, how many sessions (any user) were active at that
    instant. Oracle: plain inequality join (DuckDB IEJoin)."""
    from queryengine_spark.operators.rangejoin import point_in_interval_join

    e = t(spark, sf, "events").withColumn("us", epoch_us("ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("us", 1).over(w).isNull()
            | ((F.col("us") - F.lag("us", 1).over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        flagged.withColumn("session_id", F.sum("new_sess").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("start_us"), (F.max("us") + 1).alias("end_us"))
        .select("start_us", "end_us")
    )
    errors = (
        e.filter(F.col("event_type") == "error").select("event_id", F.col("us").alias("pt_us"))
    )
    joined = point_in_interval_join(
        errors, sess, "pt_us", "start_us", "end_us",
        bucket_width=3_600_000_000, how="left",
    )
    return joined.groupBy("event_id").agg(
        F.count("start_us").alias("n_active_sessions")
    )


RANGE_JOIN_SQL = f"""
WITH ev AS (SELECT *, epoch_us(ts) AS us FROM events),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us, 1) OVER w IS NULL
                OR us - lag(us, 1) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess_events AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
sess AS (
  SELECT MIN(us) AS start_us, MAX(us) + 1 AS end_us
  FROM sess_events GROUP BY user_id, session_id
),
errors AS (SELECT event_id, us AS pt_us FROM ev WHERE event_type = 'error')
SELECT e.event_id, COUNT(s.start_us) AS n_active_sessions
FROM errors e LEFT JOIN sess s ON s.start_us <= e.pt_us AND e.pt_us < s.end_us
GROUP BY e.event_id
"""


def events_click_purchase_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Click→purchase attribution: every (click, purchase) pair for
    the same user with the purchase inside (click_ts, click_ts+30min].
    Batch twin of the streaming stream-stream interval join
    (streaming.attribution_join — pytest asserts stream==batch).
    The per-user time-bounded pairing is the bounded-state shape:
    equi-join on user_id with the interval as a join residual, never
    a time-unbounded cross product."""
    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = clicks.join(
        purchases,
        (F.col("cu") == F.col("pu"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    return joined.select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            epoch_sec("purchase_ts") - epoch_sec("click_ts")
        ).alias("delay_sec"),
        "purchase_value",
    )


CLICK_PURCHASE_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


def events_enriched_segment_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/::enrich_events): event counts per (event_type,
    customer market segment). The dim side is broadcast — no shuffle
    for the join, one partial-agg shuffle for the rollup."""
    from queryengine_spark.streaming import enrich_events

    e = t(spark, sf, "events")
    c = t(spark, sf, "customer")
    return (
        enrich_events(e, c)
        .groupBy("event_type", "segment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


ENRICH_SQL = """
SELECT e.event_type,
       COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type, segment
"""


_MULTIRES_BODY = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS is_day_level
FROM events
GROUP BY GROUPING SETS
  ((date_trunc('day', ts), date_trunc('hour', ts), event_type),
   (date_trunc('day', ts), event_type))
"""
# Spark date_format == DuckDB strftime for these patterns; GROUPING()
# marks the coarse rows (hour = NULL) so both resolutions coexist in
# one relation, hypertable-continuous-aggregate style.
_MULTIRES_SPARK = _MULTIRES_BODY.replace(
    "strftime(date_trunc('day', ts), '%Y-%m-%d')",
    "date_format(date_trunc('day', ts), 'yyyy-MM-dd')",
).replace(
    "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')",
    "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')",
)


def events_multires_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-
    aggregate shape): hourly AND daily event counts per type from ONE
    scan via GROUPING SETS — a single hash aggregate emits both
    granularities, instead of two scans or a re-aggregation stage.
    At 100 TB the day rows are map-side-combined the same way the
    hour rows are."""
    t(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(_MULTIRES_SPARK)


QUERIES = {
    "events_tumbling_hourly": (events_tumbling_hourly, TUMBLING_SQL),
    "events_enriched_segment_counts": (events_enriched_segment_counts, ENRICH_SQL),
    "events_multires_rollup": (events_multires_rollup, _MULTIRES_BODY),
    "events_click_purchase_attribution": (
        events_click_purchase_attribution,
        CLICK_PURCHASE_SQL,
    ),
    # r6 fold: events_session_window_native is a LEG of the
    # events_sessionize composite now (both formulations, one hash)
    "events_sessionize": (
        events_sessionize,
        SESSIONIZE_SUITE_SQL.format(wf=SESSIONIZE_SQL, native=SESSION_WINDOW_SQL),
    ),
    "events_sliding_window": (events_sliding_window, SLIDING_SQL),
    # r5 fold: the malformed-payload audit is part of
    # events_json_extract now (same legs, one scan)
    "events_json_extract": (events_json_extract, JSON_SQL),
    "shipping_delay_stats": (shipping_delay_stats, SHIPPING_DELAY_SQL),
    "events_asof_last_purchase": (events_asof_last_purchase, ASOF_SQL),
    "events_range_join_active_sessions": (
        events_range_join_active_sessions,
        RANGE_JOIN_SQL,
    ),
}
