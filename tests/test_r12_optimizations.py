"""r12 optimization-round equivalence pins: every internals change
made for performance must produce bit-identical results to the shape
it replaced. These tests pin the two changes whose old/new plans
differ most — the shared-prefix PQ suite path and the payload-narrowed
edit-distance join (the suffix-array lead() rewrite is already pinned
by tests/test_suffix.py's n-gram-reference and forced-re-rank tests,
and pipeline_cc_ingest's window-min dedup by its DuckDB oracle
hash)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from queryengine_spark.operators.editdist import edit_distance_join
from queryengine_spark.operators.knn import ivf_pq_topk, ivf_pq_topk_both

DIM = 64
PQ_KW = dict(
    n_cells=8, nprobe=3, sample_n=128, train_iters=2,
    m=16, ksub=64, dim=DIM, pq_sample_n=256,
)
K = 3
RERANK_R = 8


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(20260817)
    pts = rng.normal(size=(400, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))], schema
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pq_both_matches_per_leg_topk(spark, vecs):
    """ivf_pq_topk_both's two outputs must be row-identical to the two
    independent ivf_pq_topk calls knn_pq_suite previously made — the
    shared train/encode/scoring prefix is a pure execution-plan
    change."""
    from pyspark.sql import functions as F

    queries = vecs.filter(F.col("vec_id") % 25 == 0)
    adc_old = ivf_pq_topk(queries, vecs, "vec_id", "embedding", k=K, **PQ_KW)
    rer_old = ivf_pq_topk(
        queries, vecs, "vec_id", "embedding", k=K, rerank_r=RERANK_R, **PQ_KW
    )
    adc_new, rer_new = ivf_pq_topk_both(
        queries, vecs, "vec_id", "embedding", k=K, rerank_r=RERANK_R, **PQ_KW
    )
    assert _rows(adc_new) == _rows(adc_old)
    assert _rows(rer_new) == _rows(rer_old)
    assert adc_new.columns == adc_old.columns
    assert rer_new.columns == rer_old.columns


def test_edit_join_reattach_handles_duplicate_ids_and_rows(spark):
    """The r12 payload-narrowed shape re-attaches terms by id after
    the candidate distinct. Pin the edge cases that distinct used to
    absorb in the old carried-term shape: exact duplicate input rows
    (must not double pairs) and one id bound to two different terms
    (both terms' matches must appear)."""
    left = spark.createDataFrame(
        [(1, "color"), (1, "color"), (2, "colour"), (2, "kolor")],
        ["id", "term"],
    )
    right = spark.createDataFrame(
        [(10, "colors"), (10, "colors"), (11, "dolor")], ["id", "term"]
    )
    got = sorted(
        tuple(r)
        for r in edit_distance_join(
            left, right, "id", "term", "id", "term", max_dist=1
        ).collect()
    )
    # color→colors (ins, d=1), color→dolor (sub, d=1), kolor→dolor
    # (sub, d=1); colour→colors and kolor→colors are d=2 (excluded).
    # The duplicate (1,'color') and (10,'colors') rows must not
    # double any pair, and BOTH of id 2's terms are matched.
    assert got == [
        (1, 10, 1),
        (1, 11, 1),
        (2, 11, 1),
    ]


def test_edit_join_brute_force_equivalence_after_narrowing(spark):
    """Random-vocabulary completeness check of the narrowed shape at
    d=2 (the brute-force pin the module's documentation points at)."""
    import itertools
    import random

    rnd = random.Random(20260817)
    vocab = [
        "".join(rnd.choice("abcd") for _ in range(rnd.randint(2, 6)))
        for _ in range(40)
    ]
    left = spark.createDataFrame(list(enumerate(vocab)), ["id", "term"])
    right = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(vocab)], ["id", "term"]
    )
    got = {
        (r["q_id"], r["r_id"], r["dist"])
        for r in edit_distance_join(
            left, right, "id", "term", "id", "term", max_dist=2
        ).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (i, 100 + j, lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(vocab), enumerate(vocab)
        )
        if lev(a, b) <= 2
    }
    assert got == want
