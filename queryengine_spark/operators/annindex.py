"""Persistent IVF-PQ index artifact — the build-once/query-many
shape real ANN deployments use (FAISS writes an index file; the Spark
equivalent is a parquet layout).

Layout under ``<path>/``:

- ``meta/``       one row: (n_cells, m, ksub, dim) — the geometry a
  reader needs to validate compatibility before touching data;
- ``centroids/``  coarse quantizer: (cid, c array<bigint>) — k·dim
  scaled ints, the same bounded state the trainer held;
- ``codebooks/``  PQ codebooks: (sub, cid, c array<bigint>);
- ``codes/``      the searchable relation, hive-PARTITIONED BY CELL:
  (neighbor_id, codes array<int>) under ``cell=N/`` directories — a
  query probing ``nprobe`` cells reads only those directories
  (partition pruning is the IVF inverted list, expressed at the file
  layout level).

Why this matters at 100 TB: training is a one-time artifact cost —
the per-query path (``ivf_pq_topk_from_index``) does NO sample
collect and NO Lloyd iterations, it reads two tiny parquet tables
into broadcast-sized driver state and joins the probed cells of the
16-byte-code relation. Results are BIT-IDENTICAL to in-session
:func:`operators.knn.ivf_pq_topk` with the same parameters because
both run the shared :func:`operators.knn.pq_score_rank` tail over
the same integer centroids/codebooks (pinned by
tests/test_annindex.py's roundtrip + parity tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.operators.knn import (
    _collect_vec_sample,
    ivf_cells_int_udf,
    kmeans_centroids_int,
    pq_codes_udf,
    pq_score_rank,
    pq_train_codebooks,
)


def write_pq_index(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_cells: int = 16,
    m: int = 16,
    ksub: int = 256,
    dim: int = 64,
    sample_n: int = 256,
    pq_sample_n: int = 1024,
    train_iters: int = 3,
) -> None:
    """Train (bounded smallest-id samples, identical to the
    in-session path) and persist the full index artifact."""
    spark = candidates.sparkSession
    sample = _collect_vec_sample(
        candidates, id_col, vec_col, max(sample_n, pq_sample_n, n_cells, ksub), dim=dim
    )
    cents = kmeans_centroids_int(sample[:sample_n], n_cells, train_iters)
    books = pq_train_codebooks(sample[:pq_sample_n], m, ksub, train_iters, dim)
    assign1 = ivf_cells_int_udf(cents, 1)
    codes = pq_codes_udf(books)
    enc = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
        codes(F.col(vec_col)).alias("codes"),
    ).filter(F.col("codes").isNotNull())
    enc.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, c array<bigint>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(s, i, c) for s, book in enumerate(books) for i, c in enumerate(book)],
        "sub int, cid int, c array<bigint>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame(
        [(n_cells, m, ksub, dim)], "n_cells int, m int, ksub int, dim int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_to_pq_index(
    new_batch: DataFrame, id_col: str, vec_col: str, path: str
) -> None:
    """Incremental ingest — the other half of build-once/query-many:
    encode a NEW batch with the EXISTING centroids/codebooks (no
    retraining; quantizer drift is a reindex decision, not an ingest
    side effect — FAISS add() semantics) and append its codes to the
    cell-partitioned relation. Queries over the updated index equal
    in-session scoring over the unioned corpus with the original
    training state (tests/test_annindex.py pins it)."""
    spark = new_batch.sparkSession
    idx = read_pq_index(spark, path)
    assign1 = ivf_cells_int_udf(idx["cents"], 1)
    codes = pq_codes_udf(idx["books"])
    enc = new_batch.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
        codes(F.col(vec_col)).alias("codes"),
    ).filter(F.col("codes").isNotNull())
    enc.write.mode("append").partitionBy("cell").parquet(f"{path}/codes")


def read_pq_index(spark: SparkSession, path: str) -> dict:
    """Load the artifact: centroids/codebooks into driver state
    (k·dim and m·ksub·sub ints — broadcast-sized by construction,
    the exact state the trainer produced), codes stay a DataFrame."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    cents_rows = spark.read.parquet(f"{path}/centroids").collect()
    cents = [list(r["c"]) for r in sorted(cents_rows, key=lambda r: r["cid"])]
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    books: list[list[list[int]]] = [[] for _ in range(meta["m"])]
    for r in sorted(book_rows, key=lambda r: (r["sub"], r["cid"])):
        books[r["sub"]].append(list(r["c"]))
    codes = spark.read.parquet(f"{path}/codes").select(
        "neighbor_id", F.col("cell").cast("int").alias("cell"), "codes"
    )
    return {
        "meta": {k: int(meta[k]) for k in ("n_cells", "m", "ksub", "dim")},
        "cents": cents,
        "books": books,
        "codes": codes,
    }


def ivf_pq_topk_from_index(
    queries: DataFrame,
    index: dict,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 4,
    rerank_r: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Answer top-k from the persisted artifact — zero retraining,
    zero sample collects; same scoring tail (and therefore the same
    bits) as the in-session path. ``candidates`` is the full-vector
    relation for the exact re-rank (only rerank_r rows per query are
    ever fetched from it)."""
    cand_vecs = None
    if candidates is not None:
        cand_vecs = candidates.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    return pq_score_rank(
        queries,
        index["codes"],
        index["cents"],
        index["books"],
        id_col,
        vec_col,
        k=k,
        nprobe=nprobe,
        rerank_r=rerank_r,
        cand_vecs=cand_vecs,
    )
