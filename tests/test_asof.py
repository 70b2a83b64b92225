"""as_of_join edge cases: exact-time tie (rt == t matches), no prior
right row (NULLs), interleaved keys, left rows preserved exactly."""

from __future__ import annotations

from queryengine_spark.operators.asof import as_of_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 8, "c"), (2, 5, "d"), (3, 7, "e")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 6, 50.0), (4, 1, 9.0)],
        ["k", "rt", "v"],
    )
    out = {
        (r["k"], r["t"]): (r["asof_rt"], r["asof_v"])
        for r in as_of_join(left, right, ["k"], "t", "rt", ["v"]).collect()
    }
    assert len(out) == 5  # every left row exactly once
    assert out[(1, 8)] == (8, 100.0)    # rt == t matches (<=)
    assert out[(1, 10)] == (8, 100.0)   # latest prior
    assert out[(1, 20)] == (15, 200.0)
    assert out[(2, 5)] == (None, None)  # right exists but only later
    assert out[(3, 7)] == (None, None)  # key absent on right


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame([(1, 9, 1.5, "x")], ["k", "rt", "v", "s"])
    row = as_of_join(left, right, ["k"], "t", "rt", ["v", "s"]).collect()[0]
    assert (row["asof_rt"], row["asof_v"], row["asof_s"]) == (9, 1.5, "x")