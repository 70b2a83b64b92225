"""Trained-IVF justification harness (round-2 verdict item #4).

On a CLUSTERED corpus — the case IVF exists for — k-means-trained
centroids must recover the cluster structure well enough that probing
a quarter of the cells finds (almost) all true neighbors, which
untrained smallest-id seed centroids cannot do reliably. The corpus
is deterministic (seeded numpy): 16 well-separated Gaussian clusters
in 64 dims, unit-norm points, cluster sizes deliberately unequal so
seed-based quantizers (which sample ids, not density) misplace cells.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from queryengine_spark.operators.knn import brute_force_topk, ivf_topk

N_CLUSTERS = 16
DIM = 64
N_POINTS = 2000
K = 3
NPROBE = 4


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(20260814)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # skewed cluster sizes: two hot clusters hold ~40% of the corpus
    weights = np.array([6.0, 5.0] + [1.0] * (N_CLUSTERS - 2))
    assign = rng.choice(N_CLUSTERS, size=N_POINTS, p=weights / weights.sum())
    pts = centers[assign] + 0.15 * rng.normal(size=(N_POINTS, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, [float(x) for x in pts[i]]) for i in range(N_POINTS)]
    return spark.createDataFrame(rows, schema).cache()


def _recall(bf, approx):
    hits = (
        bf.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .count()
    )
    total = bf.count()
    return hits / total


def test_trained_ivf_recall_on_clustered_corpus(clustered):
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    trained = ivf_topk(
        q, clustered, "vec_id", "embedding",
        k=K, n_cells=N_CLUSTERS, nprobe=NPROBE, sample_n=256, train_iters=3,
    )
    recall = _recall(bf, trained)
    # nprobe/n_cells = 4/16 = 0.25 of the cells probed
    assert recall >= 0.8, f"trained IVF recall@{K} = {recall:.3f} < 0.8"


def test_trained_beats_untrained_seeds(clustered):
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    trained = ivf_topk(
        q, clustered, "vec_id", "embedding",
        k=K, n_cells=N_CLUSTERS, nprobe=NPROBE, sample_n=256, train_iters=3,
    )
    untrained = ivf_topk(
        q, clustered, "vec_id", "embedding",
        k=K, n_cells=N_CLUSTERS, nprobe=NPROBE, sample_n=256, train_iters=0,
    )
    r_trained = _recall(bf, trained)
    r_untrained = _recall(bf, untrained)
    assert r_trained > r_untrained, (
        f"training must pay for itself on clustered data: "
        f"trained={r_trained:.3f} untrained={r_untrained:.3f}"
    )
