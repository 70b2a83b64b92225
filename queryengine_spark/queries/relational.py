"""Relational operator surface (SURVEY §2.2): scans, projections,
filters, equi/semi/anti/theta joins, aggregations, windows, set ops,
sorts/limits, rollup/cube/grouping sets, scalar functions.

The reference engine has none of these beyond its fuzzy pipeline —
this is the generic analytics surface the driver contract requires,
expressed as declarative DataFrame plans (Catalyst does pushdown /
join selection / group-limit) with DuckDB-parity SQL oracles.
Float handling follows queries/base.py's bit-exact discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.operators.topk import grouped_topk
from queryengine_spark.queries.base import dec_avg, dec_sum, fround, sql_fround, sql_fsum, t

_REV = "l_extendedprice * (1 - l_discount)"


# --- scans / projection / filter -------------------------------------------

def scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """Filter + projection with per-row arithmetic; filters and the
    3-column read schema reach the parquet scan (PushedFilters)."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            fround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        )
    )


SCAN_FILTER_PROJECT_SQL = f"""
SELECT l_orderkey, l_linenumber,
       {sql_fround(_REV, 2)} AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
"""


def source_tsv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Reference S2 source as a contract query: stage region as a
    TSV-with-header file, read it back through the S2 reader, recover
    the typed rows. The oracle reads the original parquet — a
    mismatch anywhere in the write→read roundtrip (separator quoting,
    header handling, type recovery) breaks the hash."""
    import os

    from queryengine_spark.sources.text import read_tsv

    r = t(spark, sf, "region")
    stage = f"/tmp/qe-stage-tsv-{os.path.basename(os.path.normpath(sf))}"
    r.select("r_regionkey", "r_name").coalesce(1).write.mode("overwrite").option(
        "sep", "\t"
    ).option("header", True).csv(stage)
    back = read_tsv(spark, stage)
    return back.select(
        F.col("r_regionkey").cast("bigint").alias("r_regionkey"), "r_name"
    )


SOURCE_TSV_SQL = "SELECT r_regionkey, r_name FROM region"


def source_pipe_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Reference S3 source as a contract query: stage nation as a
    names.dmp-style pipe-delimited dump (field 1 = the name, padded
    like the taxonomy dump), read it back through the S3 reader."""
    import os

    from queryengine_spark.sources.text import read_pipe_names

    n = t(spark, sf, "nation")
    stage = f"/tmp/qe-stage-pipe-{os.path.basename(os.path.normpath(sf))}"
    lines = n.select(
        F.concat(
            F.col("n_nationkey").cast("string"),
            F.lit("|\t"),
            F.col("n_name"),
            F.lit("\t|scientific name|"),
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(stage)
    return read_pipe_names(spark, stage)


SOURCE_PIPE_SQL = "SELECT n_name AS name FROM nation"


def source_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JSONL interchange roundtrip (the format corpus pipelines ship):
    stage supplier as hive-partitioned JSON-lines, read back with an
    EXPLICIT schema (no inference scan), recover the typed rows."""
    import os

    from queryengine_spark.sources.text import read_jsonl, write_jsonl

    s = t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    stage = f"/tmp/qe-stage-jsonl-{os.path.basename(os.path.normpath(sf))}"
    write_jsonl(s, stage, partition_by=["s_nationkey"])
    back = read_jsonl(
        spark, stage, schema="s_suppkey bigint, s_name string, s_nationkey int"
    )
    # partition column comes back from the directory names as its
    # inferred type — normalize
    return back.select(
        "s_suppkey", "s_name", F.col("s_nationkey").cast("bigint").alias("s_nationkey")
    )


SOURCE_JSONL_SQL = "SELECT s_suppkey, s_name, s_nationkey FROM supplier"


def source_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ORC columnar roundtrip: stage part through ORC, read back,
    recover typed rows (same pushdown machinery as parquet)."""
    import os

    from queryengine_spark.sources.text import read_orc, write_orc

    p = t(spark, sf, "part").select("p_partkey", "p_name", "p_retailprice")
    stage = f"/tmp/qe-stage-orc-{os.path.basename(os.path.normpath(sf))}"
    write_orc(p, stage)
    return read_orc(spark, stage)


SOURCE_ORC_SQL = "SELECT p_partkey, p_name, p_retailprice FROM part"


def source_roundtrips(spark: SparkSession, sf: str) -> DataFrame:
    """ALL four staged write→read source roundtrips (S2 TSV, S3 pipe,
    JSONL, ORC) folded into one contract query (round-3 verdict item
    7 — registry staleness trim). Each format stages through its own
    writer+reader exactly as the individual queries did; the union
    normalizes to (fmt, k, name, x) so one hash covers every
    separator/quoting/header/type-recovery path. NULLs mark fields a
    format doesn't carry (pipe yields names only; tsv has no numeric
    payload column)."""
    tsv = source_tsv_roundtrip(spark, sf).select(
        F.lit("tsv").alias("fmt"),
        F.col("r_regionkey").alias("k"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("double").alias("x"),
    )
    pipe = source_pipe_roundtrip(spark, sf).select(
        F.lit("pipe").alias("fmt"),
        F.lit(None).cast("bigint").alias("k"),
        F.col("name"),
        F.lit(None).cast("double").alias("x"),
    )
    jsonl = source_jsonl_roundtrip(spark, sf).select(
        F.lit("jsonl").alias("fmt"),
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("double").alias("x"),
    )
    orc = source_orc_roundtrip(spark, sf).select(
        F.lit("orc").alias("fmt"),
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast("double").alias("x"),
    )
    return tsv.unionByName(pipe).unionByName(jsonl).unionByName(orc)


SOURCE_ROUNDTRIPS_SQL = """
SELECT 'tsv' AS fmt, r_regionkey AS k, r_name AS name, CAST(NULL AS DOUBLE) AS x FROM region
UNION ALL
SELECT 'pipe', NULL, n_name, NULL FROM nation
UNION ALL
SELECT 'jsonl', s_suppkey, s_name, CAST(s_nationkey AS DOUBLE) FROM supplier
UNION ALL
SELECT 'orc', p_partkey, p_name, p_retailprice FROM part
"""


def distinct_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct (reference A1 generalized)."""
    return t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --- aggregations ------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: grouped sums/averages/counts
    with map-side partial aggregation."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_fsum('l_quantity')} AS sum_qty,
       {sql_fsum('l_extendedprice')} AS sum_base_price,
       {sql_fsum(_REV)} AS sum_disc_price,
       {sql_fsum(_REV + ' * (1 + l_tax)')} AS sum_charge,
       {sql_fsum('l_quantity')} / COUNT(*) AS avg_qty,
       {sql_fsum('l_extendedprice')} / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6-shaped filter-heavy single aggregate: the pushdown
    showcase (all predicates reach the scan)."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = f"""
SELECT {sql_fsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


def agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        dec_avg("c_acctbal", "avg_bal"),
    )


COUNT_DISTINCT_SQL = f"""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       {sql_fsum('c_acctbal')} / COUNT(*) AS avg_bal
FROM customer GROUP BY c_mktsegment
"""


def agg_having(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped aggregate with post-aggregation filter (HAVING)."""
    o = t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


HAVING_SQL = f"""
SELECT o_custkey, COUNT(*) AS n_orders,
       {sql_fsum('o_totalprice')} AS spend
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
"""


def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, bit-identical on the same doubles).
    At 100 TB swap for approx_percentile with a documented error
    bound — exact percentile requires a per-group sort."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_price"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


PERCENTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50_price,
       quantile_cont(o_totalprice, 0.95) AS p95_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("l_quantity", "sum_qty"))
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {sql_fsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


GROUPING_SETS_SQL = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
"""


def agg_grouping_suite(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP + CUBE + GROUPING SETS in one tagged relation (r5 fold
    of agg_rollup / agg_cube / agg_grouping_sets — all three grouping
    operators still run on their original tables and feed the hash;
    the certification window covers them in one row). Legs are
    coerced to a common (src, g1, g2, n, sum_qty) shape; sum_qty only
    exists on the rollup leg."""
    roll = (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("l_quantity", "sum_qty"))
        .select(
            F.lit("rollup").alias("src"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "n",
            "sum_qty",
        )
    )
    cube = (
        t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("cube").alias("src"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "n",
            F.lit(None).cast("double").alias("sum_qty"),
        )
    )
    t(spark, sf, "customer").createOrReplaceTempView("customer")
    gs = spark.sql(
        """
        SELECT 'grouping_sets' AS src, c_mktsegment AS g1,
               CAST(c_nationkey AS STRING) AS g2, COUNT(*) AS n,
               CAST(NULL AS DOUBLE) AS sum_qty
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )
    return roll.unionByName(cube).unionByName(gs)


GROUPING_SUITE_SQL = f"""
SELECT 'rollup' AS src, l_returnflag AS g1, l_linestatus AS g2,
       COUNT(*) AS n, {sql_fsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube', o_orderstatus, o_orderpriority, COUNT(*), CAST(NULL AS DOUBLE)
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'grouping_sets', c_mktsegment, CAST(c_nationkey AS VARCHAR),
       COUNT(*), CAST(NULL AS DOUBLE)
FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
"""


# --- joins -------------------------------------------------------------------

def join_broadcast_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Star join: fact ⋈ broadcast dims (explicit broadcast hints —
    customer/nation stay far under the broadcast threshold here)."""
    o, c, n = (t(spark, sf, x) for x in ("orders", "customer", "nation"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "volume"))
    )


JOIN_BROADCAST_SQL = f"""
SELECT n_name, COUNT(*) AS n_orders,
       {sql_fsum('o_totalprice')} AS volume
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → fact joins → grouped
    revenue → deterministic top-10."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    rev = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {sql_fsum(_REV)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join (customer and supplier in the
    same nation), region-filtered, grouped revenue."""
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n, c, s = (t(spark, sf, x) for x in ("nation", "customer", "supplier"))
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = t(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       {sql_fsum(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi: customers having at least one 'F' order."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti: customers with no 'P' order."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def join_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Equi + theta residual: lineitems whose quantity exceeds the
    part's size, per brand."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


JOIN_THETA_SQL = f"""
SELECT p_brand, COUNT(*) AS n_lines,
       {sql_fsum(_REV)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


def join_outer_order_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_OUTER_SQL = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# --- windows -----------------------------------------------------------------

def window_topk_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group top-k via row_number (WindowGroupLimit pushdown)."""
    o = t(spark, sf, "orders")
    return grouped_topk(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        rank_col="rn",
        keep_rank=True,
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
FROM orders
QUALIFY rn <= 3
"""


def window_running_total(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum with an explicit frame (rows unbounded preceding),
    floor-scaled so cumulative values hash identically."""
    o = t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = F.floor(F.col("o_totalprice") * F.lit(10000.0) + F.lit(0.5)).cast("bigint")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w) / F.lit(10000.0)).alias("running_spend"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0 AS running_spend
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead: per-user inter-event value delta."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        fround(F.col("value") - F.lag("value", 1).over(w), 6).alias("value_delta"),
    )


WINDOW_LAG_SQL = f"""
SELECT user_id, event_id,
       {sql_fround("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)", 6)} AS value_delta
FROM events
"""


def window_rank_dense(spark: SparkSession, sf: str) -> DataFrame:
    """rank + dense_rank over part retail prices per brand."""
    p = t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


WINDOW_RANK_SQL = """
SELECT p_brand, p_partkey,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS price_rank,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS price_dense_rank
FROM part
"""


def window_basic_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Running frame-sum + lag delta + rank/dense_rank in one tagged
    relation (r5 fold of window_running_total / window_lag_delta /
    window_rank_dense — each leg unchanged on its original table and
    window; legs coerced to a common (src, k1, k2, v, v2) shape)."""
    run = window_running_total(spark, sf).select(
        F.lit("running_total").alias("src"),
        F.col("o_custkey").cast("string").alias("k1"),
        F.col("o_orderkey").cast("bigint").alias("k2"),
        F.col("running_spend").alias("v"),
        F.lit(None).cast("double").alias("v2"),
    )
    lag = window_lag_delta(spark, sf).select(
        F.lit("lag_delta").alias("src"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("event_id").cast("bigint").alias("k2"),
        F.col("value_delta").alias("v"),
        F.lit(None).cast("double").alias("v2"),
    )
    rnk = window_rank_dense(spark, sf).select(
        F.lit("rank_dense").alias("src"),
        F.col("p_brand").alias("k1"),
        F.col("p_partkey").cast("bigint").alias("k2"),
        F.col("price_rank").cast("double").alias("v"),
        F.col("price_dense_rank").cast("double").alias("v2"),
    )
    return run.unionByName(lag).unionByName(rnk)


WINDOW_SUITE_SQL = f"""
SELECT 'running_total' AS src, CAST(o_custkey AS VARCHAR) AS k1,
       CAST(o_orderkey AS BIGINT) AS k2,
       SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0 AS v,
       CAST(NULL AS DOUBLE) AS v2
FROM orders
UNION ALL
SELECT 'lag_delta', CAST(user_id AS VARCHAR), CAST(event_id AS BIGINT),
       {sql_fround("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)", 6)},
       CAST(NULL AS DOUBLE)
FROM events
UNION ALL
SELECT 'rank_dense', p_brand, CAST(p_partkey AS BIGINT),
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS DOUBLE),
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS DOUBLE)
FROM part
"""


# --- set ops -----------------------------------------------------------------

def setop_union(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SETOP_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SETOP_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


SETOP_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_suite(spark: SparkSession, sf: str) -> DataFrame:
    """UNION (distinct) / INTERSECT / EXCEPT over the same two inputs
    in one op-tagged relation (r5 fold of setop_union /
    setop_intersect / setop_except — all three set operators still
    execute and feed the hash)."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.union(s).distinct().withColumn("op", F.lit("union"))
        .unionByName(c.intersect(s).withColumn("op", F.lit("intersect")))
        .unionByName(c.subtract(s).withColumn("op", F.lit("except")))
    )


SETOP_SUITE_SQL = """
SELECT nationkey, 'union' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'except' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT s_nationkey FROM supplier)
"""


# --- sorts / limits ----------------------------------------------------------

def sort_limit_top10(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-10 (TakeOrderedAndProject — no full sort at scale)."""
    o = t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --- scalar function gallery -------------------------------------------------

def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """String / date / math / conditional scalar surface in one
    projection (all JVM built-ins, whole-stage codegen)."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_code"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.concat_ws("-", "o_orderstatus", F.col("o_orderkey").cast("string")).alias("status_key"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        fround("o_totalprice", 1).alias("price_r1"),
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("price_bucket"),
        F.abs(F.col("o_totalprice") - 100000).alias("dist_from_100k"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
    )


SCALAR_SQL = f"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_code,
       lower(o_orderstatus) AS status_lower,
       o_orderstatus || '-' || CAST(o_orderkey AS VARCHAR) AS status_key,
       o_orderkey % 7 AS key_mod7,
       {sql_fround('o_totalprice', 1)} AS price_r1,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_bucket,
       abs(o_totalprice - 100000) AS dist_from_100k,
       CAST(length(o_orderpriority) AS INT) AS prio_len
FROM orders
"""


# --- subqueries (Catalyst decorrelation) ------------------------------------

def subquery_scalar_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery: parts priced above their brand's
    average (decorrelated by Catalyst into an aggregate + join)."""
    t(spark, sf, "part").createOrReplaceTempView("part")
    # exact-decimal avg (order-independent) so the correlated threshold
    # is bit-identical across engines — see queries/base.py discipline
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p1
        WHERE p_retailprice >
              (SELECT SUM(CAST(floor(p_retailprice * 10000.0 + 0.5) AS BIGINT))
                      / 10000.0 / COUNT(*) * 1.2
               FROM part p2 WHERE p2.p_brand = p1.p_brand)
        """
    )


SUBQUERY_SCALAR_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p1
WHERE p_retailprice >
      (SELECT SUM(CAST(floor(p_retailprice * 10000.0 + 0.5) AS BIGINT))
              / 10000.0 / COUNT(*) * 1.2
       FROM part p2 WHERE p2.p_brand = p1.p_brand)
"""


def subquery_in(spark: SparkSession, sf: str) -> DataFrame:
    """IN-subquery (compiles to a semi join): orders of customers in
    the AUTOMOBILE segment."""
    t(spark, sf, "orders").createOrReplaceTempView("orders")
    t(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'AUTOMOBILE')
        """
    )


SUBQUERY_IN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'AUTOMOBILE')
"""


def q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-shaped: outer join + two-level aggregation —
    distribution of customers by order count."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


QUERIES = {
    "scan_filter_project": (scan_filter_project, SCAN_FILTER_PROJECT_SQL),
    # the four per-format roundtrips are folded into one composite
    # (registry staleness trim, r3 verdict item 7); the individual
    # builders remain above as its stages
    "source_roundtrips": (source_roundtrips, SOURCE_ROUNDTRIPS_SQL),
    "distinct_flag_status": (distinct_flag_status, DISTINCT_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "agg_count_distinct": (agg_count_distinct, COUNT_DISTINCT_SQL),
    "agg_having": (agg_having, HAVING_SQL),
    "agg_percentiles": (agg_percentiles, PERCENTILES_SQL),
    # r5 fold: rollup/cube/grouping-sets run inside one tagged
    # relation now (each leg unchanged on its original table)
    "agg_grouping_suite": (agg_grouping_suite, GROUPING_SUITE_SQL),
    "join_broadcast_dims": (join_broadcast_dims, JOIN_BROADCAST_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "join_semi": (join_semi, JOIN_SEMI_SQL),
    "join_anti": (join_anti, JOIN_ANTI_SQL),
    "join_theta": (join_theta, JOIN_THETA_SQL),
    "join_outer_order_counts": (join_outer_order_counts, JOIN_OUTER_SQL),
    "window_topk_orders_per_customer": (window_topk_orders_per_customer, WINDOW_TOPK_SQL),
    # r5 fold: the three basic window queries run inside one tagged
    # relation now (same windows on their original tables)
    "window_basic_suite": (window_basic_suite, WINDOW_SUITE_SQL),
    # r5 fold: the three set operators run inside one tagged relation
    "setop_suite": (setop_suite, SETOP_SUITE_SQL),
    "sort_limit_top10": (sort_limit_top10, SORT_LIMIT_SQL),
    "scalar_functions": (scalar_functions, SCALAR_SQL),
    "subquery_scalar_correlated": (subquery_scalar_correlated, SUBQUERY_SCALAR_SQL),
    "subquery_in": (subquery_in, SUBQUERY_IN_SQL),
    "q13_order_count_distribution": (q13_order_count_distribution, Q13_SQL),
}
