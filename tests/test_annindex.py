"""Persistent IVF-PQ index artifact: the write→read roundtrip must
preserve the trained state exactly, the read-path query must produce
BIT-IDENTICAL results to in-session training, and the codes relation
must be laid out partitioned by cell (the IVF inverted list at the
file level)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from queryengine_spark.operators.annindex import (
    ivf_pq_topk_from_index,
    read_pq_index,
    write_pq_index,
)
from queryengine_spark.operators.knn import (
    _collect_vec_sample,
    ivf_pq_topk,
    kmeans_centroids_int,
    pq_train_codebooks,
)
from queryengine_spark.sources.tables import load_table

PARAMS = dict(n_cells=8, m=8, ksub=16, dim=64, sample_n=64, pq_sample_n=128, train_iters=2)


def test_roundtrip_preserves_trained_state(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    write_pq_index(e, "vec_id", "embedding", path, **PARAMS)
    idx = read_pq_index(spark, path)

    sample = _collect_vec_sample(e, "vec_id", "embedding", 128, dim=64)
    cents = kmeans_centroids_int(sample[:64], 8, 2)
    books = pq_train_codebooks(sample[:128], 8, 16, 2, 64)
    assert idx["meta"] == {"n_cells": 8, "m": 8, "ksub": 16, "dim": 64}
    assert idx["cents"] == cents
    assert idx["books"] == books


def test_codes_partitioned_by_cell(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    write_pq_index(e, "vec_id", "embedding", path, **PARAMS)
    cells = sorted(
        d for d in os.listdir(os.path.join(path, "codes")) if d.startswith("cell=")
    )
    assert len(cells) >= 2  # inverted list exists as directories
    # every encoded candidate appears exactly once across the cells
    n = spark.read.parquet(os.path.join(path, "codes")).count()
    assert n == e.count()


def test_read_path_matches_in_session_training(spark, sf_dir, tmp_path):
    """Bit-identical parity, both ADC-only and with exact re-rank."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "idx")
    write_pq_index(e, "vec_id", "embedding", path, **PARAMS)
    idx = read_pq_index(spark, path)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    adc_mem = ivf_pq_topk(queries, e, "vec_id", "embedding", k=3, nprobe=2, **PARAMS)
    adc_idx = ivf_pq_topk_from_index(queries, idx, "vec_id", "embedding", k=3, nprobe=2)
    assert rows(adc_mem) == rows(adc_idx) and len(rows(adc_idx)) > 0

    rer_mem = ivf_pq_topk(
        queries, e, "vec_id", "embedding", k=3, nprobe=2, rerank_r=8, **PARAMS
    )
    rer_idx = ivf_pq_topk_from_index(
        queries, idx, "vec_id", "embedding", k=3, nprobe=2, rerank_r=8, candidates=e
    )
    assert rows(rer_mem) == rows(rer_idx) and len(rows(rer_idx)) > 0
