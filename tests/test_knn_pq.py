"""IVF-PQ justification harness (mirrors test_knn_ivf_clustered):
on a clustered corpus, the PQ16×8 + exact-re-rank path must recover
(nearly) the IVF-Flat recall while the scoring join moves only
16-byte codes plus 32 full vectors per query; ADC-only ranking is
measurably noisy inside tight clusters — documented, and the reason
the re-rank variant is the shipped configuration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from queryengine_spark.operators.knn import brute_force_topk, ivf_pq_topk, ivf_topk

N_CLUSTERS = 16
DIM = 64
N_POINTS = 2000
K = 3
NPROBE = 4
PQ_KW = dict(
    n_cells=N_CLUSTERS, nprobe=NPROBE, sample_n=256, train_iters=3,
    m=16, ksub=256, dim=DIM, pq_sample_n=1024,
)


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(20260814)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
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
    return hits / bf.count()


def test_pq_rerank_recovers_ivf_recall(clustered):
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    rerank = ivf_pq_topk(
        q, clustered, "vec_id", "embedding", k=K, rerank_r=32, **PQ_KW
    )
    recall = _recall(bf, rerank)
    # measured 0.993 shortlist containment; assert with slack
    assert recall >= 0.9, f"PQ+rerank recall@{K} = {recall:.3f} < 0.9"


def test_adc_only_is_noisy_inside_clusters(clustered):
    """Documents the quantization physics the re-rank exists for:
    8-bit codes over RAW vectors cannot rank within a tight cluster
    (all members collapse onto near-identical codes), so raw-vector
    ADC recall must be visibly below the re-ranked path. Pinned to
    residual=False — the r6 residual default fixes exactly this."""
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    adc = ivf_pq_topk(
        q, clustered, "vec_id", "embedding", k=K, residual=False, **PQ_KW
    )
    rerank = ivf_pq_topk(
        q, clustered, "vec_id", "embedding", k=K, rerank_r=32, **PQ_KW
    )
    r_adc, r_rer = _recall(bf, adc), _recall(bf, rerank)
    assert r_rer > r_adc, (r_rer, r_adc)


def test_residual_encoding_lifts_adc_recall(clustered):
    """The r6 FAISS-semantics change, measured: PQ over coarse
    residuals must beat PQ over raw vectors at ADC-only ranking on
    the clustered corpus — residuals spread across the codebook's
    dynamic range where raw cluster members collapse together."""
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    raw = ivf_pq_topk(
        q, clustered, "vec_id", "embedding", k=K, residual=False, **PQ_KW
    )
    res = ivf_pq_topk(q, clustered, "vec_id", "embedding", k=K, **PQ_KW)
    r_raw, r_res = _recall(bf, raw), _recall(bf, res)
    assert r_res > r_raw, (r_res, r_raw)


def test_pq_matches_ivf_flat_on_same_shortlist(clustered):
    """Re-ranked PQ and IVF-Flat share cells and nprobe, so their
    recall should essentially coincide (the 32-deep shortlist rarely
    drops a true neighbor)."""
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    bf = brute_force_topk(q, clustered, "vec_id", "embedding", k=K)
    flat = ivf_topk(
        q, clustered, "vec_id", "embedding",
        k=K, n_cells=N_CLUSTERS, nprobe=NPROBE, sample_n=256, train_iters=3,
    )
    rerank = ivf_pq_topk(
        q, clustered, "vec_id", "embedding", k=K, rerank_r=32, **PQ_KW
    )
    assert _recall(bf, flat) - _recall(bf, rerank) <= 0.05


def test_wrong_dim_vector_dropped(spark):
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(60)]
    rows.append((99, [1.0] * 10))
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    q = df.filter(F.col("vec_id") % 20 == 0)
    out = ivf_pq_topk(
        q, df, "vec_id", "embedding", k=K,
        n_cells=4, nprobe=2, sample_n=32, train_iters=1,
        m=8, ksub=8, dim=DIM, pq_sample_n=32,
    )
    assert out.filter(F.col("neighbor_id") == 99).count() == 0


def test_bad_rows_in_sample_window_do_not_crash(spark):
    """Round-3 review fix: NULL / wrong-length vectors among the
    SMALLEST ids (the training-sample window) must be silently
    skipped by both quantizer trainings, not crash the collect —
    existing null-tests only planted bad rows at huge ids."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    rng = np.random.default_rng(21)
    rows = [(0, None), (1, [1.0] * 5)]  # bad rows INSIDE the window
    rows += [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(2, 80)]
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    q = df.filter(F.col("vec_id") % 20 == 0)
    out = ivf_pq_topk(
        q, df, "vec_id", "embedding", k=K,
        n_cells=4, nprobe=2, sample_n=32, train_iters=1,
        m=8, ksub=8, dim=DIM, pq_sample_n=32, rerank_r=8,
    )
    ids = {r["neighbor_id"] for r in out.collect()}
    assert 1 not in ids  # wrong-dim vector never a neighbor
    flat = ivf_topk(
        q, df, "vec_id", "embedding", k=K, n_cells=4, nprobe=2,
        sample_n=32, train_iters=1,
    )
    assert flat.count() > 0  # and IVF-Flat trains fine too


def test_dim_not_divisible_by_m_raises_loudly(spark):
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    rng = np.random.default_rng(22)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(20)], schema
    )
    with pytest.raises(AssertionError, match="split evenly"):
        ivf_pq_topk(
            df, df, "vec_id", "embedding", k=K,
            n_cells=4, nprobe=2, sample_n=16, train_iters=1,
            m=12, ksub=8, dim=DIM, pq_sample_n=16,
        )
