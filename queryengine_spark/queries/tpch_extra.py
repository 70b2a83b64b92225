"""Extended TPC-H-pattern relational coverage (round 2).

The driver's tables are TPC-H-lite (no partsupp; several columns
trimmed), so each query keeps the *shape* of its TPC-H namesake —
the join topology, aggregation pattern, and subquery class — adapted
to the available columns. All follow queries/base.py's bit-exact
float discipline and alias columns identically to their oracles.

Scale notes (local[32] is the test rig, not the target): every join
below either broadcasts a dimension (nation/region/part filters) or
shuffles on a high-cardinality key with map-side partial aggregation;
no query collects to the driver; correlated subqueries are expressed
as joins/windows so Catalyst de-correlates rather than re-executing
per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.queries.base import dec_avg, dec_sum, fround, sql_fround, sql_fsum, t

_REV = "l_extendedprice * (1 - l_discount)"


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi): orders in a half-year
    window having at least one lineitem shipped >60 days after the
    order date, counted per priority. (The real Q4 uses
    commitdate/receiptdate, absent here.)"""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = t(spark, sf, "lineitem")
    qual = li.alias("l2")
    return (
        o.join(
            qual,
            (F.col("o_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l2.l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow between two nations (supplier
    nation ≠ customer nation, both directions) per ship year."""
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf, "supplier")
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    names = ("NATION_2", "NATION_5")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == names[0]) & (F.col("cust_nation") == names[1]))
            | ((F.col("supp_nation") == names[1]) & (F.col("cust_nation") == names[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {sql_fsum(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_5')
   OR (n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_2')
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
"""


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue
    within its region, per order year. Ratio of two exact scaled
    sums → identical doubles on both engines."""
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n_all = t(spark, sf, "nation")
    s = t(spark, sf, "supplier")
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    # customers in the region define the market; supplier nation
    # defines the share numerator
    cn = n_all.join(F.broadcast(r), n_all.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    sn = n_all.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("s_nation"))
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0) + F.lit(0.5)
    ).cast("bigint")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            scaled.alias("vol"),
            F.when(F.col("s_nation") == "NATION_3", scaled).otherwise(F.lit(0)).alias("nat_vol"),
        )
    )
    return base.groupBy("o_year").agg(
        (F.sum("nat_vol") / F.sum("vol")).alias("mkt_share")
    )


Q8_SQL = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(floor(({_REV}) * 10000.0 + 0.5) AS BIGINT) AS vol,
         CASE WHEN n2.n_name = 'NATION_3'
              THEN CAST(floor(({_REV}) * 10000.0 + 0.5) AS BIGINT)
              ELSE 0 END AS nat_vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT o_year, SUM(nat_vol) / SUM(vol) AS mkt_share
FROM base GROUP BY o_year
"""


def q9_profit_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → supply cost proxied by
    p_retailprice): per supplier-nation, per order year, profit on
    parts whose name contains a token."""
    n = t(spark, sf, "nation")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dec_sum(amount, "profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_fsum("l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity")} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in one quarter (group → global top-k, TakeOrderedAndProject)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-04-01"))
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_fsum(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1998-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue share in one month — ratio of
    two exact scaled sums (single row)."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    p = t(spark, sf, "part")
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0) + F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.when(F.col("p_type") == "PROMO", scaled).otherwise(F.lit(0)).alias("promo"),
            scaled.alias("total"),
        )
        .agg((F.lit(100.0) * F.sum("promo") / F.sum("total")).alias("promo_revenue_pct"))
    )


Q14_SQL = f"""
SELECT 100.0 * SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(floor(({_REV}) * 10000.0 + 0.5) AS BIGINT)
                        ELSE 0 END)
             / SUM(CAST(floor(({_REV}) * 10000.0 + 0.5) AS BIGINT)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01' AND l_shipdate < TIMESTAMP '1998-04-01'
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum 3-month revenue.
    The max-equality compares EXACT scaled BIGINTs (a double compare
    could disagree across engines); revenue is scaled back only in
    the projection."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = t(spark, sf, "supplier")
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0) + F.lit(0.5)
    ).cast("bigint")
    rev = li.select(F.col("l_suppkey").alias("supplier_no"), scaled.alias("sc")).groupBy(
        "supplier_no"
    ).agg(F.sum("sc").alias("sc_total"))
    mx = rev.agg(F.max("sc_total").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("sc_total") == F.col("mx"))
    return (
        top.join(s, top.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("sc_total") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) AS sc_total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, sc_total / 10000.0 AS total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE sc_total = (SELECT MAX(sc_total) FROM rev)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is
    below 20% of their part's average, for one brand — the correlated
    scalar-average expressed as a join so it de-correlates."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ak"))
        .agg(dec_avg("l_quantity", "avg_qty"))
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
    )
    return joined.agg(
        dec_sum("l_extendedprice", "total_extprice"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q17_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS ak,
         SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) / 10000.0 / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT SUM(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS total_extprice,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
JOIN avg_q ON l_partkey = ak
WHERE l_quantity < 0.2 * avg_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single order exceeds a
    quantity threshold (HAVING over a join → semi-join back)."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 150.0)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            fround("o_totalprice", 2).alias("o_totalprice_r"),
            "sum_qty",
        )
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) / 10000.0 > 150.0
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       {sql_fround("o_totalprice", 2)} AS o_totalprice_r,
       sum_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_bracketed_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR-of-ANDs bracket predicate
    over part attributes × lineitem quantity (one join, disjunctive
    residual filter)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 35))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q19_SQL = f"""
SELECT {sql_fsum(_REV)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the mean
    positive balance with NO orders after a date — scalar subquery
    (broadcast 1-row) + anti join, grouped by a derived segment."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
    pos = c.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(dec_avg("c_acctbal", "ab"))
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return rich.groupBy(
        (F.col("c_custkey") % 7).cast("int").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_sum("c_acctbal", "totacctbal"),
    )


Q22_SQL = """
WITH ab AS (
  SELECT SUM(CAST(floor(c_acctbal * 10000.0 + 0.5) AS BIGINT)) / 10000.0 / count(*) AS v
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_custkey % 7 AS INT) AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       SUM(CAST(floor(c_acctbal * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS totacctbal
FROM customer, ab
WHERE c_acctbal > ab.v
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY CAST(c_custkey % 7 AS INT)
"""


QUERIES = {
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_profit_by_nation": (q9_profit_by_nation, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q19_bracketed_revenue": (q19_bracketed_revenue, Q19_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
}
