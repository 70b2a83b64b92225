"""Snapshot-maintenance driver-contract queries
(operators/merge.py): CDC upsert/delete apply and SCD2 validity
intervals — the MERGE INTO / dimension-history surface, expressed on
plain parquet.

The CDC change batch is synthesized DETERMINISTICALLY from the
orders table itself (update every %10 key's totalprice at seq 1,
delete every %100==7 key at seq 2) so the oracle can rebuild the
identical batch with plain SQL — no side-channel input files, and
the arithmetic (+1000.0 on a parquet double) is one exact IEEE add.
The SCD2 stream is the events table keyed by user with
microsecond-epoch sequence numbers ((user_id, ts) is unique in the
test corpus — asserted cheaply by the row_number total order itself:
a duplicate would make the collapse nondeterministic and the hash
gate would catch it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.operators.merge import apply_cdc, scd2_history
from queryengine_spark.queries.base import epoch_us, t

#: CDC synthesis: every %UPD_MOD-th key updated at seq 1,
#: every %DEL_MOD==DEL_REM-th deleted at seq 2
UPD_MOD = 10
DEL_MOD = 100
DEL_REM = 7
UPD_DELTA = 1000.0


def etl_apply_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE-shaped CDC apply: one key shuffle, WindowGroupLimit
    per-key reduction, delete tombstones honored."""
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    upd = (
        o.filter(F.col("o_orderkey") % UPD_MOD == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(UPD_DELTA))
        .withColumn("seq", F.lit(1).cast("bigint"))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        o.filter(F.col("o_orderkey") % DEL_MOD == DEL_REM)
        .withColumn("seq", F.lit(2).cast("bigint"))
        .withColumn("op", F.lit("D"))
    )
    return apply_cdc(o, upd.unionByName(dele), ["o_orderkey"], "seq")


APPLY_CDC_SQL = f"""
WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  CAST(-1 AS BIGINT) AS _seq, 'I' AS _op FROM orders),
c1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
              o_totalprice + {UPD_DELTA} AS o_totalprice,
              CAST(1 AS BIGINT) AS _seq, 'U' AS _op
       FROM orders WHERE o_orderkey % {UPD_MOD} = 0),
c2 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              CAST(2 AS BIGINT) AS _seq, 'D' AS _op
       FROM orders WHERE o_orderkey % {DEL_MOD} = {DEL_REM}),
u AS (SELECT * FROM b UNION ALL SELECT * FROM c1 UNION ALL SELECT * FROM c2),
r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
           ORDER BY _seq DESC) AS rn FROM u)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM r WHERE rn = 1 AND _op <> 'D'
"""


def etl_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 dimension history of each user's event_type: consecutive
    repeats collapsed (gaps-and-islands), validity =
    [effective_from, effective_to) in epoch micros, open interval =
    current version. One shuffle, two windows over one sort."""
    e = t(spark, sf, "events").select(
        "user_id", epoch_us("ts").alias("seq"), "event_type"
    )
    return scd2_history(e, ["user_id"], "seq", "event_type")


SCD2_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS seq, event_type FROM events),
g AS (SELECT user_id, seq, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY seq ASC) AS rn,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY seq ASC) AS prev
      FROM e),
changed AS (SELECT user_id, seq, event_type FROM g
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
SELECT user_id, event_type,
       seq AS effective_from,
       lead(seq) OVER (PARTITION BY user_id ORDER BY seq ASC) AS effective_to,
       CAST(CASE WHEN lead(seq) OVER (PARTITION BY user_id ORDER BY seq ASC)
                 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM changed
"""


def etl_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Data reconciliation: full-outer diff of the pre-CDC snapshot
    against the applied one, classified added/removed/changed/
    unchanged with exact per-class counts and a key checksum — the
    report a pipeline runs after every merge to prove the change
    batch did exactly what it claimed. Null-safe payload compare
    (IS DISTINCT FROM); one key-partitioned join."""
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    snap = etl_apply_cdc(spark, sf)
    # Presence is a literal flag stamped on each side BEFORE the
    # full-outer join — classifying on payload-column nullness would
    # misread a row whose payload is legitimately all-NULL as absent
    # (and a NULL o_custkey could dodge 'removed'). The flag is only
    # NULL when the join side itself is missing.
    b = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("b_present"),
        F.col("o_custkey").alias("b_ck"),
        F.col("o_orderstatus").alias("b_st"),
        F.col("o_totalprice").alias("b_tp"),
    )
    s = snap.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("s_present"),
        F.col("o_custkey").alias("s_ck"),
        F.col("o_orderstatus").alias("s_st"),
        F.col("o_totalprice").alias("s_tp"),
    )
    j = b.join(s, "k", "full_outer")
    changed = (
        ~F.col("b_ck").eqNullSafe(F.col("s_ck"))
        | ~F.col("b_st").eqNullSafe(F.col("s_st"))
        | ~F.col("b_tp").eqNullSafe(F.col("s_tp"))
    )
    ctype = (
        F.when(F.col("s_present").isNull(), "removed")
        .when(F.col("b_present").isNull(), "added")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return (
        j.withColumn("change_type", ctype)
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
    )


def _snapshot_diff_sql() -> str:
    body = APPLY_CDC_SQL.strip()
    assert body.startswith("WITH ")
    ctes, final = body.split("\nSELECT ", 1)
    return f"""
{ctes},
snap AS (SELECT {final}),
j AS (SELECT coalesce(b.o_orderkey, s.o_orderkey) AS k,
             CASE WHEN b.o_orderkey IS NOT NULL THEN 1 END AS b_present,
             CASE WHEN s.o_orderkey IS NOT NULL THEN 1 END AS s_present,
             b.o_custkey AS b_ck, b.o_orderstatus AS b_st,
             b.o_totalprice AS b_tp,
             s.o_custkey AS s_ck, s.o_orderstatus AS s_st,
             s.o_totalprice AS s_tp
      FROM orders b FULL OUTER JOIN snap s ON b.o_orderkey = s.o_orderkey),
cls AS (SELECT k,
        CASE WHEN s_present IS NULL THEN 'removed'
             WHEN b_present IS NULL THEN 'added'
             WHEN b_ck IS DISTINCT FROM s_ck
                  OR b_st IS DISTINCT FROM s_st
                  OR b_tp IS DISTINCT FROM s_tp THEN 'changed'
             ELSE 'unchanged' END AS change_type
        FROM j)
SELECT change_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS key_checksum
FROM cls GROUP BY change_type
"""


QUERIES = {
    "etl_apply_cdc": (etl_apply_cdc, APPLY_CDC_SQL),
    "etl_scd2_history": (etl_scd2_history, SCD2_SQL),
    "etl_snapshot_diff": (etl_snapshot_diff, _snapshot_diff_sql()),
}
