"""Shuffle-control utilities: bucketed joins eliminate the exchange,
salted joins preserve semantics on skewed keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queryengine_spark.plans import salted_join, write_bucketed
from queryengine_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    write_bucketed(o, "orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(c, "customer_b", ["c_custkey"], 8, sort_cols=["c_custkey"])
    joined = spark.table("orders_b").join(
        spark.table("customer_b"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # sanity: same result as plain join
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    assert joined.count() == plain


def test_partition_pruning(spark, sf_dir, tmp_path_factory):
    """Hive-style partitioned writes prune at planning time: a filter
    on the partition column must show up as PartitionFilters and scan
    only the matching directories."""
    path = str(tmp_path_factory.mktemp("events_part"))
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    e.write.mode("overwrite").partitionBy("event_date").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters:")[1].splitlines()[0]
    want = e.filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want > 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), o, ["o_orderkey"], n_salts=4
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["l_orderkey"], r["n"]) for r in plain.collect()}
    b = {(r["o_orderkey"], r["n"]) for r in salted.collect()}
    assert a == b

def test_spread_sees_through_file_packing(spark, tmp_path):
    """Many TINY files are NOT a parallel scan: Spark's file packing
    (maxPartitionBytes/openCostInBytes) coalesces them into few scan
    partitions, so spread() must estimate SPLITS, not count files.
    40 near-empty files pack into ~2 splits at the default 128 MB —
    the old len(inputFiles) >= target check would have skipped the
    fan-out here and left the downstream explode on two cores."""
    from queryengine_spark.plans import spread

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = str(tmp_path / "tiny")
    spark.range(0, max(40, target + 8), 1, max(40, target + 8)).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= target  # the trap spread must not fall into
    assert spread(df).rdd.getNumPartitions() == target


def test_spread_skips_genuinely_parallel_scan(spark, sf_dir):
    """partitions=1 makes any file scan 'already parallel enough':
    spread must return the input unchanged (no defensive shuffle)."""
    from queryengine_spark.plans import spread

    df = load_table(spark, sf_dir, "lineitem")
    assert spread(df, partitions=1) is df
