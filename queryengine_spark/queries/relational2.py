"""Second relational pack — SQL surface shapes round 1 didn't cover:
pivot (wide aggregation), RANGE-frame windows (value-based frames, not
ROWS), correlated EXISTS / NOT EXISTS, and lateral position-explode.

Scale notes:
- pivot compiles to ONE hash aggregate with a conditional-sum per
  pivot value (no per-value scan, no shuffle beyond the groupBy);
- the RANGE frame sorts within each customer partition once — same
  cost as a ROWS frame, the frame bound is evaluated on the sorted
  run;
- EXISTS/NOT EXISTS decorrelate to one left-semi + one left-anti
  hash join (Catalyst ExistenceJoin), both broadcastable when the
  filtered orders side is small;
- posexplode is a generator in the projection — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.plans import spread
from queryengine_spark.queries.base import t

#: fixed pivot domain — explicit values keep the output schema stable
#: (a discovery pass would also force an extra job at scale)
RETURN_FLAGS = ("A", "N", "R")


def pivot_returnflag_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue by ship year pivoted to one column per return flag.
    The floor-scaled-BIGINT sums (queries/base.py discipline) are
    pivoted, then divided once per output column — exact and
    order-independent."""
    li = t(spark, sf, "lineitem")
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0 + 0.5
    ).cast("bigint")
    wide = (
        li.select(
            F.year(F.col("l_shipdate")).cast("int").alias("ship_year"),
            "l_returnflag",
            scaled.alias("s"),
        )
        .groupBy("ship_year")
        .pivot("l_returnflag", list(RETURN_FLAGS))
        .agg(F.sum("s"))
    )
    return wide.select(
        "ship_year",
        *[
            (F.col(f"`{flag}`") / 10000.0).alias(f"rev_{flag.lower()}")
            for flag in RETURN_FLAGS
        ],
    )


PIVOT_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
         FILTER (WHERE l_returnflag = 'A') / 10000.0 AS rev_a,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
         FILTER (WHERE l_returnflag = 'N') / 10000.0 AS rev_n,
       SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT))
         FILTER (WHERE l_returnflag = 'R') / 10000.0 AS rev_r
FROM lineitem
GROUP BY ship_year
"""


def window_range_30d_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Per order: the customer's total spend over the trailing 30
    days — a RANGE frame (value-based, day units) rather than a ROWS
    frame, so same-day orders are peers and gaps in the date sequence
    are honored. One sort per customer partition."""
    o = t(spark, sf, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    scaled = F.floor(F.col("o_totalprice") * 10000.0 + 0.5).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        (F.sum(scaled).over(w) / 10000.0).alias("spend_30d"),
    )


RANGE_FRAME_SQL = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) / 10000.0 AS spend_30d
FROM orders
"""


_EXISTS_BODY = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
"""


def subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS: customers with an urgent order
    and no finished order. Catalyst decorrelates to a left-semi plus
    a left-anti join on c_custkey."""
    t(spark, sf, "customer").createOrReplaceTempView("customer")
    t(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_BODY)


EXISTS_SQL = _EXISTS_BODY


#: token positions surfaced per document
LATERAL_FIRST_N = 5


def lateral_posexplode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Position-aware lateral expansion: the first ``LATERAL_FIRST_N``
    tokens of each document with their 0-based position — Spark's
    posexplode generator (pure projection, zero shuffles); the oracle
    is an index-carrying list_transform + unnest."""
    d = spread(t(spark, sf, "documents"))
    toks = tokenize_ws(F.lower(F.col("text")))
    return d.select(
        "doc_id", F.posexplode(F.slice(toks, 1, LATERAL_FIRST_N))
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), F.col("col").alias("tk"))


# shared with every other DuckDB tokenizer twin — one source of truth
# for the cross-engine-critical literal (queries/textstats.py)
from queryengine_spark.queries.textstats import _TOKS

_TOKS_LOW = _TOKS.format(c="lower(text)")

LATERAL_SQL = f"""
WITH d AS (SELECT doc_id, ({_TOKS_LOW})[1:{LATERAL_FIRST_N}] AS sl FROM documents),
u AS (SELECT doc_id,
             unnest(list_transform(sl, (x, i) -> {{'pos': i - 1, 'tk': x}})) AS s
      FROM d)
SELECT doc_id, CAST(s.pos AS INT) AS pos, s.tk AS tk FROM u
"""


def window_distribution_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window functions over customers per market
    segment: quartile (ntile), percent_rank, cume_dist, and the
    segment's richest customer (first_value over the full frame).
    percent_rank/cume_dist are exact integer ratios — engine-portable
    without float discipline. Total order via the c_custkey tiebreak."""
    c = t(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first_value(F.col("c_custkey")).over(wf).alias("richest_custkey"),
    )


WINDOW_DIST_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(c_custkey) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS richest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


#: lineitem measure columns melted to long form
UNPIVOT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def unpivot_lineitem_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (melt): the four lineitem measures as (metric, val)
    long-form rows — pivot's inverse, a pure 1→4 projection generator
    with zero shuffles. Restricted to one order-week to keep the
    contract result bounded."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-01-08")
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(UNPIVOT_METRICS),
        variableColumnName="metric",
        valueColumnName="val",
    ).select(
        "l_orderkey", F.col("l_linenumber").cast("int").alias("l_linenumber"),
        "metric", "val",
    )


UNPIVOT_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber, metric, val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
      FROM lineitem
      WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-01-08')
UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
"""


def agg_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles (functions/sketches.py):
    p50/p95/p99 lower-bucket bounds of extended price per return flag
    — the approximate-quantile shape that scales (fixed per-group
    state, one partial-aggregated pass) where exact percentiles need a
    per-group sort, with integer-exact cross-engine parity that
    interpolating approx quantiles can never give."""
    from queryengine_spark.functions.sketches import histogram_quantiles

    return histogram_quantiles(
        t(spark, sf, "lineitem"), "l_returnflag", "l_extendedprice"
    )


def _hist_sql() -> str:
    from queryengine_spark.functions.sketches import sql_histogram_quantiles

    return sql_histogram_quantiles("lineitem", "l_returnflag", "l_extendedprice")


QUERIES = {
    "pivot_returnflag_revenue": (pivot_returnflag_revenue, PIVOT_SQL),
    "unpivot_lineitem_metrics": (unpivot_lineitem_metrics, UNPIVOT_SQL),
    "agg_histogram_quantiles": (agg_histogram_quantiles, _hist_sql()),
    "window_distribution_funcs": (window_distribution_funcs, WINDOW_DIST_SQL),
    "window_range_30d_spend": (window_range_30d_spend, RANGE_FRAME_SQL),
    "subquery_exists": (subquery_exists, EXISTS_SQL),
    "lateral_posexplode_tokens": (lateral_posexplode_tokens, LATERAL_SQL),
}
