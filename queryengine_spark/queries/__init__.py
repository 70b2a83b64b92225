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
    addenda,
    analytics,
    archives,
    ccingest,
    curation,
    curation2,
    dedup,
    etlq,
    eventsq,
    fuzzy,
    knn,
    knn2,
    ml,
    multimodal,
    multimodal2,
    pipelines,
    relational,
    relational2,
    textstats,
    tpch_extra,
    udx,
    urlsq,
)
from queryengine_spark.queries.certification import LAST_CERTIFIED

#: module order is the within-tier tiebreak for the stalest-first sort
#: below: when several queries share a last-certified round, the
#: LLM-pipeline / custom-operator surface (highest divergence risk)
#: outranks plain relational SQL.
_MODULES = (
    fuzzy,
    dedup,
    knn,
    eventsq,
    multimodal,
    udx,
    pipelines,
    textstats,
    # new round-3 curation/ANN queries register AFTER the queries the
    # round-3 driver window must certify (VERDICT r2 item 1) — they
    # take their first driver row in round 4's rotation
    curation,
    knn2,
    multimodal2,
    # round-4 analytics pack (BM25 / CMS / HLL / PageRank / profile)
    analytics,
    # round-4 ML/curation pack (distributed k-means, MMR, DSIR)
    ml,
    # round-4 snapshot maintenance (CDC apply, SCD2 history)
    etlq,
    # round-4 late additions (sequence packing, MAD outliers, shard
    # audit, cross-source overlap) — registered last within the r0
    # tier so the 46 queries awaiting their first driver row keep
    # their window slots; these four take the tier's remaining 4
    curation2,
    relational,
    relational2,
    tpch_extra,
    # round-5 URL/domain curation pack
    urlsq,
    # round-6 archive-shard source (WebDataset tar/zip ingestion)
    archives,
    # round-10 end-to-end CommonCrawl composite (WARC -> CDX -> WET
    # -> gate -> dedup -> packing)
    ccingest,
    # ALWAYS LAST: late additions that must not displace queries
    # still waiting for their first driver row (see addenda.py)
    addenda,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _registry_order() -> list:
    """(module, name, fn, sql) tuples, STALEST CERTIFICATION FIRST.

    The driver's correctness gate oracles the first 50 entries of
    ``queries()`` in dict order, so registration order decides which
    queries get a fresh driver row each round. Sorting by the last
    round whose driver hash row still certifies the current code
    (``certification.LAST_CERTIFIED``; reworked queries are voided
    back to 0) rotates the 50-row window across the full registered
    surface automatically, bounded by the staleness guard in
    scripts/update_certification.py.
    Regenerate the map each round: scripts/update_certification.py.
    """
    entries = []
    for m in _MODULES:
        for name, (fn, sql) in m.QUERIES.items():
            entries.append((m, name, fn, sql))
    return sorted(
        range(len(entries)),
        key=lambda i: (LAST_CERTIFIED.get(entries[i][1], 0), i),
    ), entries


def all_queries() -> dict[str, QueryFn]:
    order, entries = _registry_order()
    out: dict[str, QueryFn] = {}
    for i in order:
        _m, name, fn, _sql = entries[i]
        assert name not in out, f"duplicate query name {name}"
        out[name] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    order, entries = _registry_order()
    out: dict[str, str] = {}
    for i in order:
        _m, name, _fn, sql = entries[i]
        if sql is not None:
            # a callable sql is a LAZY oracle builder (e.g. the BPE
            # oracle trains its merge table from the oracle corpus at
            # build time) — resolved only here, so queries()/bench
            # never pay for it
            out[name] = sql() if callable(sql) else sql
    return out
