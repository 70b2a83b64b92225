"""point_in_interval_join: equivalence with the naive theta join on
random data, outer-join semantics, and edge buckets."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from queryengine_spark.operators.rangejoin import point_in_interval_join


def test_equals_theta_join_randomized(spark):
    rng = random.Random(99)
    pts = [(i, rng.randint(0, 1000)) for i in range(120)]
    ivs = []
    for j in range(60):
        s = rng.randint(0, 950)
        ivs.append((j, s, s + rng.randint(0, 120)))  # includes empty intervals
    p = spark.createDataFrame(pts, ["pid", "x"])
    i = spark.createDataFrame(ivs, ["iid", "s", "e"])
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(p, i, "x", "s", "e", bucket_width=64).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in p.crossJoin(i)
        .filter((F.col("s") <= F.col("x")) & (F.col("x") < F.col("e")))
        .collect()
    }
    assert got == want


def test_left_join_keeps_unmatched_points(spark):
    p = spark.createDataFrame([(1, 5), (2, 500)], ["pid", "x"])
    i = spark.createDataFrame([(1, 0, 10)], ["iid", "s", "e"])
    rows = {
        r["pid"]: r["iid"]
        for r in point_in_interval_join(p, i, "x", "s", "e", 8, how="left").collect()
    }
    assert rows == {1: 1, 2: None}


def test_boundary_semantics(spark):
    # half-open [s, e): point == s matches, point == e does not,
    # bucket-aligned ends must not leak into the next bucket
    p = spark.createDataFrame([(1, 0), (2, 16), (3, 15)], ["pid", "x"])
    i = spark.createDataFrame([(1, 0, 16)], ["iid", "s", "e"])
    got = {
        r["pid"]
        for r in point_in_interval_join(p, i, "x", "s", "e", bucket_width=16).collect()
    }
    assert got == {1, 3}