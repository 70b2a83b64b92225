"""Event-stream analytics (batch semantics with DuckDB oracles; the
same logic runs incrementally in queryengine_spark.streaming via
Structured Streaming — tested in tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.queries.base import dec_sum, t

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
    """Gap-based sessionization (30-min inactivity): lag + running sum
    of session-start flags, then per-session rollup. Microsecond
    arithmetic so both engines compare the same integers."""
    e = t(spark, sf, "events").withColumn("us", F.unix_micros("ts"))
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


QUERIES = {
    "events_tumbling_hourly": (events_tumbling_hourly, TUMBLING_SQL),
    "events_sessionize": (events_sessionize, SESSIONIZE_SQL),
}
