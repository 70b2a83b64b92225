"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query set ⋈ candidate set (queries broadcast when small), cosine as
  a JVM column expression, per-query top-k via WindowGroupLimit.
- lsh_bucketed_topk: the scale path — sign-test LSH buckets (element
  comparisons as hyperplane surrogates, deterministic and
  engine-portable), join restricted to equal buckets, so each query
  scores ~n/2^bits candidates instead of n. Recall < 1 by design;
  raise n_bits for bigger corpora, or probe neighboring buckets.

At 100 TB the candidate side stays partitioned by bucket (no
broadcast); the bucket join is an equi-join AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.functions.similarity import cosine_similarity
from queryengine_spark.operators.topk import grouped_topk


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rn),
    self-pairs excluded, ties broken by neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def lsh_bucket(
    vec_col: Column | str, n_bits: int = 4, dim: int = 64, offset: int = 0
) -> Column:
    """Sign-test LSH bucket id in [0, 2^n_bits): bit i compares
    element offset+i+1 against element offset+i+1+dim/2 (1-based).
    Deterministic, no arithmetic on floats (comparison only), portable
    to any SQL engine. Distinct ``offset`` values give independent
    hash tables (multi-probe recall boosting)."""
    assert offset + n_bits <= dim // 2, "bucket bits exceed vector half"
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    half = dim // 2
    total = F.lit(0)
    for i in range(n_bits):
        bit = (
            F.element_at(v, offset + i + 1) > F.element_at(v, offset + i + 1 + half)
        ).cast("int")
        total = total + bit * F.lit(2 ** (n_bits - 1 - i))
    return total


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. (query_id, neighbor_id, bucket, cosine, rn)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, n_bits, dim).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(vec_col, n_bits, dim).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", "bucket",
        fround("cosine", 6).alias("cosine"), "rn",
    )
