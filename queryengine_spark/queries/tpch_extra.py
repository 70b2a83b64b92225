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


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp → lineitem is the part-supplier
    bridge): for each size-15 part, the EUROPE supplier(s) offering
    the minimum unit cost (min l_extendedprice/l_quantity over that
    supplier's shipments). The correlated MIN subquery becomes a
    per-part window min; the equality compares doubles both engines
    derived by the identical per-row division + MIN, so bits agree.
    Top 100 by (s_acctbal DESC, n_name, s_name, p_partkey)."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf, "part").filter(F.col("p_size") == 15)
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", F.col("n_name").alias("nation"),
            "p_partkey", "p_name", fround("unit_cost", 6).alias("unit_cost_r"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT c.*, s_acctbal, s_name, n_name, p_partkey, p_name,
         MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM cost c
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN part ON l_partkey = p_partkey AND p_size = 15
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name,
       floor(unit_cost * 1000000.0 + 0.5) / 1000000.0 AS unit_cost_r
FROM eu WHERE unit_cost = min_cost
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue via one nation's suppliers,
    kept where the part exceeds a fixed fraction of that nation's
    total (scalar subquery → broadcast 1-row). The fraction test is
    an exact integer compare on scaled BIGINTs (value·1000 > total),
    so no float threshold can disagree across engines."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0) + F.lit(0.5)
    ).cast("bigint")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("l_partkey", scaled.alias("sc"))
    )
    value = base.groupBy("l_partkey").agg(F.sum("sc").alias("val_sc"))
    total = base.agg(F.sum("sc").alias("tot_sc"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("val_sc") * 1000 > F.col("tot_sc"))
        .select("l_partkey", (F.col("val_sc") / F.lit(10000.0)).alias("value"))
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT) AS sc
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM supplier
                JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
                WHERE s_suppkey = l_suppkey)
)
SELECT l_partkey, SUM(sc) / 10000.0 AS value
FROM base
GROUP BY l_partkey
HAVING SUM(sc) * 1000 > (SELECT SUM(sc) FROM base)
"""


def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode → l_returnflag is the grouping
    surrogate): lineitems shipped ≥90 days after their order during
    1997, counted per flag split into high/low order priority — the
    CASE-sum pivot of the original."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).alias("high_line_count"),
            F.sum(1 - hi).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


def q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → distinct lineitem pairs): distinct
    supplier count per (brand, type, size) for a size set, excluding
    one brand, the PROMO type class, and negative-balance suppliers
    (the complaint NOT-IN surrogate, an anti join)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


def q20_excess_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped more of a
    'red' part in 1997 than half that part's per-supplier average —
    the correlated availqty test becomes two aggregations joined on
    part, compared exactly in integers (sq·2·n_suppliers > total)."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = t(spark, sf, "part").filter(F.col("p_name").startswith("red"))
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_4")
    qsc = F.floor(F.col("l_quantity") * F.lit(10000.0) + F.lit(0.5)).cast("bigint")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey", qsc.alias("qsc"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qsc").alias("sq"))
    )
    per_part = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("tot"), F.count(F.lit(1)).alias("nsupp")
    )
    qualifying = (
        shipped.join(per_part, shipped.l_partkey == per_part.pk)
        .filter(F.col("sq") * 2 * F.col("nsupp") > F.col("tot"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey AS pk, SUM(sq) AS tot, COUNT(*) AS nsupp FROM shipped GROUP BY l_partkey
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
WHERE s_suppkey IN (SELECT DISTINCT l_suppkey FROM shipped
                    JOIN per_part ON l_partkey = pk
                    WHERE sq * 2 * nsupp > tot)
ORDER BY s_name
"""


def q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates → late :=
    shipped >60 days after order): suppliers who were the ONLY late
    supplier in a multi-supplier failed order, counted by distinct
    order. The EXISTS / NOT-EXISTS double correlation decorrelates
    into one per-order aggregate joined back — Catalyst executes one
    pass over lineitem instead of two correlated probes."""
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    waiting = (
        lo.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate >= o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey AS ok,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM lo GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) w
JOIN per_order ON l_orderkey = ok
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_late_shipments": (q12_late_shipments, Q12_SQL),
    "q16_supplier_count": (q16_supplier_count, Q16_SQL),
    "q20_excess_shipments": (q20_excess_shipments, Q20_SQL),
    "q21_waiting_supplier": (q21_waiting_supplier, Q21_SQL),
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
