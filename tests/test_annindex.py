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
    # r6: books are trained on coarse residuals (cents=...)
    books = pq_train_codebooks(sample[:128], 8, 16, 2, 64, cents=cents)
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


def test_incremental_append_equals_full_scoring(spark, sf_dir, tmp_path):
    """FAISS add() semantics: build on half the corpus, append the
    other half encoded with the ORIGINAL training state — queries
    over the updated artifact must equal in-session scoring over the
    full corpus using that same original state (codebooks are frozen
    by contract; drift is a reindex decision)."""
    from queryengine_spark.operators.annindex import append_to_pq_index
    from queryengine_spark.operators.knn import pq_score_rank

    e = load_table(spark, sf_dir, "embeddings")
    first = e.filter(F.col("vec_id") % 2 == 0)
    second = e.filter(F.col("vec_id") % 2 == 1)
    queries = e.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "idx")

    write_pq_index(first, "vec_id", "embedding", path, **PARAMS)
    append_to_pq_index(second, "vec_id", "embedding", path)
    idx = read_pq_index(spark, path)
    got = ivf_pq_topk_from_index(queries, idx, "vec_id", "embedding", k=3, nprobe=2)

    # reference: same frozen training state, full corpus scored in-session
    from queryengine_spark.operators.knn import ivf_cells_int_udf, pq_codes_udf

    assign1 = ivf_cells_int_udf(idx["cents"], 1)
    codes = pq_codes_udf(idx["books"], cents=idx["cents"])
    coded = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v"),
        F.element_at(assign1(F.col("embedding")), 1).alias("cell"),
    ).select(
        "neighbor_id", "cell", codes(F.col("v"), F.col("cell")).alias("codes")
    ).filter(F.col("codes").isNotNull())
    want = pq_score_rank(
        queries, coded, idx["cents"], idx["books"], "vec_id", "embedding",
        k=3, nprobe=2, rerank_r=None, cand_vecs=None,
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(got) == rows(want) and len(rows(got)) > 0
    # and the appended ids are actually searchable
    assert spark.read.parquet(f"{path}/codes").count() == e.count()


# --- r6: persistent SRP-LSH index artifact -----------------------------------


def test_lsh_roundtrip_preserves_planes(spark, sf_dir, tmp_path):
    from queryengine_spark.operators.annindex import (
        read_lsh_index,
        write_lsh_index,
    )
    from queryengine_spark.operators.knn import srp_planes

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh")
    write_lsh_index(e, "vec_id", "embedding", path, n_bits=8, n_tables=4, nnz=16, dim=64)
    idx = read_lsh_index(spark, path)
    assert idx["meta"] == {"n_bits": 8, "n_tables": 4, "nnz": 16, "dim": 64}
    # the artifact's planes are bit-identical to the generator's
    assert idx["planes"] == srp_planes(32, dim=64, nnz=16)


def test_lsh_buckets_partitioned_by_bucket(spark, sf_dir, tmp_path):
    from queryengine_spark.operators.annindex import write_lsh_index

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh")
    write_lsh_index(e, "vec_id", "embedding", path, n_bits=4, n_tables=2, nnz=16, dim=64)
    parts = [
        d for d in os.listdir(os.path.join(path, "buckets"))
        if d.startswith("bucket=")
    ]
    assert parts, "bucket relation must be hive-partitioned by bucket"


def test_lsh_read_path_matches_in_session(spark, sf_dir, tmp_path):
    from queryengine_spark.operators.annindex import (
        read_lsh_index,
        srp_topk_from_index,
        write_lsh_index,
    )
    from queryengine_spark.operators.knn import srp_bucketed_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    kw = dict(n_bits=8, n_tables=16, nnz=16, dim=64)
    insess = srp_bucketed_topk(
        queries, e, "vec_id", "embedding", k=3, probe=1, **kw
    )
    path = str(tmp_path / "lsh")
    write_lsh_index(e, "vec_id", "embedding", path, **kw)
    idx = read_lsh_index(spark, path)
    fromidx = srp_topk_from_index(queries, idx, "vec_id", "embedding", k=3, probe=1)
    a = sorted(tuple(r) for r in insess.collect())
    b = sorted(tuple(r) for r in fromidx.collect())
    assert a == b and a


def test_lsh_incremental_append_equals_full(spark, sf_dir, tmp_path):
    """Build on half the corpus, append the other half: queries over
    the appended index must equal the index built on the full corpus
    in one shot (planes are fixed, so encode order can't matter)."""
    from queryengine_spark.operators.annindex import (
        append_to_lsh_index,
        read_lsh_index,
        srp_topk_from_index,
        write_lsh_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    kw = dict(n_bits=8, n_tables=16, nnz=16, dim=64)
    full_path = str(tmp_path / "full")
    write_lsh_index(e, "vec_id", "embedding", full_path, **kw)
    inc_path = str(tmp_path / "inc")
    write_lsh_index(
        e.filter(F.col("vec_id") % 2 == 0), "vec_id", "embedding", inc_path, **kw
    )
    append_to_lsh_index(
        e.filter(F.col("vec_id") % 2 == 1), "vec_id", "embedding", inc_path
    )
    a = sorted(
        tuple(r)
        for r in srp_topk_from_index(
            queries, read_lsh_index(spark, full_path), "vec_id", "embedding",
            k=3, probe=1,
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in srp_topk_from_index(
            queries, read_lsh_index(spark, inc_path), "vec_id", "embedding",
            k=3, probe=1,
        ).collect()
    )
    assert a == b and a


def test_corpus_fingerprint_changes_on_touch(tmp_path):
    from queryengine_spark.operators.annindex import corpus_fingerprint

    f = tmp_path / "data.parquet"
    f.write_bytes(b"abc")
    fp1 = corpus_fingerprint(str(f))
    assert corpus_fingerprint(str(f)) == fp1  # stable
    os.utime(f, ns=(1, 2))  # mtime change = regenerated corpus
    assert corpus_fingerprint(str(f)) != fp1


# --- r6 stretch: persistent MinHash band-bucket index ------------------------


def test_minhash_index_parity_with_in_session(spark, sf_dir, tmp_path):
    """Flags from the artifact == the in-session
    incremental_minhash_flags on the same history/batch split."""
    from queryengine_spark.operators.annindex import (
        incremental_flags_from_index,
        read_minhash_index,
        write_minhash_index,
    )
    from queryengine_spark.operators.curation import incremental_minhash_flags

    d = load_table(spark, sf_dir, "documents")
    kw = dict(n_hashes=8, band_size=4, shingle_n=3)
    insess = incremental_minhash_flags(
        d, "doc_id", "text", is_new=F.col("doc_id") % 5 == 0, **kw
    )
    path = str(tmp_path / "mh")
    write_minhash_index(
        d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", path, **kw
    )
    idx = read_minhash_index(spark, path)
    fromidx = incremental_flags_from_index(
        d.filter(F.col("doc_id") % 5 == 0), idx, "doc_id", "text"
    )
    a = sorted(tuple(r) for r in insess.collect())
    b = sorted(tuple(r) for r in fromidx.collect())
    assert a == b and a
    assert any(r[1] == 1 or r[2] == 1 for r in a), "no dup flags — vacuous"


def test_minhash_index_append_and_idempotent_reingest(spark, sf_dir, tmp_path):
    """History built in two appends == one shot; re-appending the
    same batch changes NO flags (set semantics — safe re-ingest after
    a failed pipeline run)."""
    from queryengine_spark.operators.annindex import (
        append_to_minhash_index,
        incremental_flags_from_index,
        read_minhash_index,
        write_minhash_index,
    )

    d = load_table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    kw = dict(n_hashes=8, band_size=4, shingle_n=3)

    one = str(tmp_path / "one")
    write_minhash_index(hist, "doc_id", "text", one, **kw)

    two = str(tmp_path / "two")
    write_minhash_index(hist.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", two, **kw)
    append_to_minhash_index(hist.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", two)

    def flags(path):
        idx = read_minhash_index(spark, path)
        return sorted(
            tuple(r)
            for r in incremental_flags_from_index(
                batch, idx, "doc_id", "text"
            ).collect()
        )

    a, b = flags(one), flags(two)
    assert a == b and a
    # idempotent re-ingest: append an already-ingested slice again
    append_to_minhash_index(hist.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", two)
    assert flags(two) == a


def test_minhash_index_partitioned_by_prefix(spark, sf_dir, tmp_path):
    from queryengine_spark.operators.annindex import write_minhash_index

    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "mh")
    write_minhash_index(d, "doc_id", "text", path, n_hashes=8, band_size=4, shingle_n=3)
    parts = [
        p for p in os.listdir(os.path.join(path, "buckets")) if p.startswith("bp=")
    ]
    assert parts, "bucket relation must be partitioned by bucket prefix"
    # prefix values are 2 hex chars -> bounded directory count
    assert all(len(p) == len("bp=") + 2 for p in parts)


# ----------------------------------------------------------- SQ8 (r8)


def test_sq8_roundtrip_matches_in_session(spark, sf_dir, tmp_path):
    """write → read → query from the SQ8 artifact must be
    BIT-IDENTICAL to in-session ivf_sq8_topk with the same params
    (the same claim the driver hash certifies on knn_sq8's index
    leg, pinned here at unit scale)."""
    from queryengine_spark.operators.annindex import (
        ivf_sq8_topk_from_index,
        read_sq8_index,
        write_sq8_index,
    )
    from queryengine_spark.operators.knn import ivf_sq8_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "sq8")
    write_sq8_index(e, "vec_id", "embedding", path, n_cells=8, sample_n=64,
                    train_iters=2)
    idx = read_sq8_index(spark, path)
    got = sorted(
        tuple(r)
        for r in ivf_sq8_topk_from_index(
            queries, idx, "vec_id", "embedding", k=3, nprobe=2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_sq8_topk(
            queries, e, "vec_id", "embedding", k=3, n_cells=8, nprobe=2,
            sample_n=64, train_iters=2,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_sq8_append_uses_frozen_state(spark, sf_dir, tmp_path):
    """append encodes with the ARTIFACT's centroids + scalar ranges
    (FAISS add() semantics): write(first) + append(second) must equal
    encoding the union with the artifact's frozen training state —
    and the codes relation stays cell-partitioned."""
    from queryengine_spark.operators.annindex import (
        append_to_sq8_index,
        read_sq8_index,
        write_sq8_index,
    )
    from queryengine_spark.operators.knn import sq8_encode

    e = load_table(spark, sf_dir, "embeddings")
    first = e.filter(F.col("vec_id") % 2 == 0)
    second = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "sq8a")
    write_sq8_index(first, "vec_id", "embedding", path, n_cells=8,
                    sample_n=64, train_iters=2)
    idx0 = read_sq8_index(spark, path)
    append_to_sq8_index(second, "vec_id", "embedding", path)

    got = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    want = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in sq8_encode(
            e, "vec_id", "embedding", idx0["cents"], idx0["vmin"],
            idx0["vdiff"],
        ).collect()
    )
    assert got == want and len(got) == e.count()
    parts = [
        p for p in os.listdir(os.path.join(path, "codes"))
        if p.startswith("cell=")
    ]
    assert parts, "codes relation must be partitioned by cell"
