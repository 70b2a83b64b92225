"""Cross-engine parity primitives, tested directly against DuckDB on
randomized inputs — every oracle hash in the contract suite rests on
these three: fround (bit-exact rounding), hash_fraction (md5 → (0,1)
double), and dec_sum (order-independent double aggregation).
Includes adversarial half-way doubles where Spark's round()/DECIMAL
casts would already disagree."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.functions.sketches import hash_fraction, sql_hash_fraction
from queryengine_spark.queries.base import dec_sum, sql_fround, sql_fsum


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _values() -> list[float]:
    rng = np.random.default_rng(7)
    vals = list(rng.uniform(-1e6, 1e6, 400))
    vals += list(rng.uniform(-1, 1, 200))
    # adversarial: doubles that PRINT as exact half-way decimals
    vals += [round(x, 5) + 5e-7 for x in rng.uniform(0, 1000, 200)]
    vals += [37704.575, 0.5, -0.5, 2.675, -2.675, 0.0, 123456.123455]
    return [float(v) for v in vals]


def test_fround_matches_duckdb(spark, duck):
    vals = _values()
    for n in (2, 4, 6):
        got = (
            spark.createDataFrame([(v,) for v in vals], ["x"])
            .select(fround("x", n).alias("r"))
            .toPandas()["r"]
            .tolist()
        )
        want = [
            r[0]
            for r in duck.execute(
                f"SELECT {sql_fround('x', n)} FROM vals_df"
            ).fetchall()
        ]
        assert got == want, f"n={n}"


@pytest.fixture(autouse=True, scope="module")
def _register_vals(duck):
    import pandas as pd

    vals_df = pd.DataFrame({"x": _values()})
    duck.register("vals_df", vals_df)
    yield


def test_hash_fraction_matches_duckdb(spark, duck):
    terms = [f"value-{i}" for i in range(500)]
    got = (
        spark.createDataFrame([(t,) for t in terms], ["s"])
        .select(hash_fraction("md5(s)").alias("f"))
        .toPandas()["f"]
        .tolist()
    )
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {sql_hash_fraction('md5(s)')} FROM "
            "(SELECT unnest(?) AS s)",
            [terms],
        ).fetchall()
    ]
    assert got == want
    assert all(0.0 <= f < 1.0 for f in got)


def test_dec_sum_order_and_engine_independent(spark, duck):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    a = df.repartition(1).agg(dec_sum("x", "s")).collect()[0]["s"]
    b = df.repartition(32).agg(dec_sum("x", "s")).collect()[0]["s"]
    assert a == b  # partial-aggregation order cannot matter
    want = duck.execute(f"SELECT {sql_fsum('x')} FROM vals_df").fetchall()[0][0]
    assert a == want


def test_epoch_helpers_match_duckdb(spark, duck, sf_dir):
    """epoch_us / epoch_sec (queries/base.py) vs DuckDB's epoch_us and
    second-boundary date_diff on the real events timestamps — the
    primitives every event-time oracle now rests on (events.ts reads
    as TIMESTAMP_NTZ)."""
    from queryengine_spark.queries.base import epoch_sec, epoch_us

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (
        e.select("event_id", epoch_us("ts").alias("us"), epoch_sec("ts").alias("s"))
        .orderBy("event_id")
        .limit(2000)
        .collect()
    )
    want = duck.execute(
        f"""SELECT event_id, epoch_us(ts) AS us,
                   date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS s
            FROM '{sf_dir}/events.parquet' ORDER BY event_id LIMIT 2000"""
    ).fetchall()
    assert [(r["event_id"], r["us"], r["s"]) for r in got] == want
