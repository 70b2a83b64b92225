"""Production-threshold selectivity of the embedding near-dup LSH
(round-2 verdict stretch item).

The contract query runs at threshold 0.35 with 3 bits x 8 tables —
deliberately weak so the synthetic isotropic corpus yields non-empty,
oracle-checkable output; at that setting the bucket union is nearly
all-pairs. At PRODUCTION near-dup thresholds (>= 0.9, near-parallel
vectors) the sign-test agreement per bit is ~0.92, so MORE bits and
a few tables bucket far more selectively: this test plants 200 true
near-dups (cos ~0.97) in an isotropic background and pins the
7-bit x 4-table operating point — recall >= 0.9 of the planted pairs
while the candidate volume stays under 5% of all-pairs (measured
0.96 recall at 3.2%; the 0.35-contract config is ~100% candidates).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from queryengine_spark.operators.dedup import embedding_neardup_pairs_lsh
from queryengine_spark.operators.knn import lsh_bucket

N_BASE = 1800
N_DUP = 200
DIM = 64
THRESHOLD = 0.9
N_BITS = 7
N_TABLES = 4


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:N_DUP] + 0.03 * rng.normal(size=(N_DUP, DIM))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    pts = np.vstack([base, dup])
    truth = {
        (i, N_BASE + i)
        for i in range(N_DUP)
        if float(base[i] @ dup[i]) >= THRESHOLD
    }
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    n = N_BASE + N_DUP
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)], schema
    ).cache()
    return df, truth


def test_prod_threshold_recall_and_selectivity(planted):
    df, truth = planted
    assert len(truth) >= N_DUP * 0.9  # the plant actually worked

    got = embedding_neardup_pairs_lsh(
        df, "vec_id", "embedding",
        threshold=THRESHOLD, n_bits=N_BITS, dim=DIM, n_tables=N_TABLES,
    )
    rows = {(r["id_a"], r["id_b"]) for r in got.collect()}
    recall = len(rows & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} at threshold {THRESHOLD}"

    # candidate volume: within-bucket pairs summed over tables must be
    # a small fraction of all-pairs — the whole point of more bits at
    # high thresholds
    n = df.count()
    all_pairs = n * (n - 1) // 2
    e = df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cand = 0
    for t in range(N_TABLES):
        g = (
            e.select(lsh_bucket(F.col("v"), N_BITS, DIM, offset=t * N_BITS).alias("bk"))
            .groupBy("bk")
            .count()
            .collect()
        )
        cand += sum(r["count"] * (r["count"] - 1) // 2 for r in g)
    frac = cand / all_pairs
    assert frac <= 0.05, f"candidate fraction {frac:.4f} — buckets too coarse"
