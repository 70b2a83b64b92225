"""Shared helpers for the driver-contract queries.

Cross-engine float discipline: Spark's ``round()`` and double→DECIMAL
casts go through Java BigDecimal's shortest-string representation,
while DuckDB rounds the binary double — they disagree on half-way
inputs (e.g. a double printing as 37704.575 rounds up in Spark, down
in DuckDB). The only bit-exact portable formulation is pure IEEE
arithmetic: ``floor(x * 10^n + 0.5) / 10^n``, which both engines
evaluate identically for every double. All rounded outputs and all
double aggregations in this package use that form — aggregations sum
the floor-scaled BIGINTs (exact, order-independent) and divide once
at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.sources.tables import load_table

__all__ = [
    "F",
    "dec_avg",
    "dec_sum",
    "epoch_sec",
    "epoch_us",
    "fround",
    "sql_fround",
    "sql_fsum",
    "t",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for a TIMESTAMP_NTZ column, matching
    DuckDB's ``epoch_us`` on the same parquet value. ``F.unix_micros``
    only accepts TIMESTAMP_LTZ, and an NTZ→LTZ cast goes through the
    session time zone — this formulation is tz-independent."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
        _c(col).cast("timestamp_ntz"),
    )


def epoch_sec(col: Column | str) -> Column:
    """Whole seconds since epoch (floor) for a timestamp column —
    the NTZ-safe replacement for ``ts.cast('long')``, and the exact
    twin of DuckDB's second-boundary counting in ``date_diff``:
    floor(p)−floor(c) == date_diff('second', c, p)."""
    return F.timestamp_diff(
        "SECOND",
        F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
        _c(col).cast("timestamp_ntz"),
    )


def dec_sum(col: Column | str, alias: str, n: int = 4) -> Column:
    """Order-independent double sum: floor-scale each value to an
    exact BIGINT at 10^-n resolution, sum exactly, divide once."""
    s = 10**n
    scaled = F.floor(_c(col) * F.lit(float(s)) + F.lit(0.5)).cast("bigint")
    return (F.sum(scaled) / F.lit(float(s))).alias(alias)


def dec_avg(col: Column | str, alias: str, n: int = 4) -> Column:
    s = 10**n
    scaled = F.floor(_c(col) * F.lit(float(s)) + F.lit(0.5)).cast("bigint")
    return (F.sum(scaled) / F.lit(float(s)) / F.count(F.lit(1))).alias(alias)


def sql_fround(x: str, n: int) -> str:
    """DuckDB-side twin of :func:`fround`."""
    s = 10**n
    return f"floor(({x}) * {s}.0 + 0.5) / {s}.0"


def sql_fsum(x: str, n: int = 4) -> str:
    """DuckDB-side twin of :func:`dec_sum` (sans alias)."""
    s = 10**n
    return f"SUM(CAST(floor(({x}) * {s}.0 + 0.5) AS BIGINT)) / {s}.0"
