"""Driver-contract query registry (SURVEY.md §2.2 coverage map).

Each entry couples a Spark DataFrame query (``(spark, sf_dir) ->
DataFrame``) with the equivalent ANSI SQL for the DuckDB oracle.
``None`` oracle → genuinely non-SQL-expressible (e.g. the
partial_ratio refine stage); the driver then records a rows-only
check.

Cross-engine parity rules used throughout (so value-hashes match):
- every computed column is aliased identically on both sides;
- double aggregations sum floor-scaled BIGINTs (``dec_sum`` /
  ``dec_avg`` in ``queries/base.py``: scale by 10^4, floor, SUM the
  integers, divide once) — exact and order-independent, where Spark
  partial aggregation order could otherwise flip low-order float
  bits;
- integer aggregates are cast to BIGINT on both sides (DuckDB's
  SUM(INTEGER) would otherwise return HUGEINT);
- timestamps cross the boundary as formatted strings or DATEs;
- every top-k / limit has a total order (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from queryengine_spark.queries import (
    dedup,
    eventsq,
    fuzzy,
    knn,
    multimodal,
    pipelines,
    relational,
    relational2,
    textstats,
    tpch_extra,
    udx,
)

_MODULES = (
    relational,
    relational2,
    tpch_extra,
    fuzzy,
    dedup,
    knn,
    textstats,
    eventsq,
    multimodal,
    udx,
    pipelines,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        for name, (fn, _sql) in m.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        for name, (_fn, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
