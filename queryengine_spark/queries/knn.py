"""Similarity-search driver-contract queries over ``embeddings``
(64-dim float vectors): exact brute-force cosine top-k and the
LSH-bucketed approximate variant, both with DuckDB oracles (the
cosine is the same ordered double dot-product on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.operators.knn import brute_force_topk, lsh_bucketed_topk
from queryengine_spark.queries.base import t

K_BRUTE = 5
K_LSH = 3
N_BITS = 4
DIM = 64

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(queries, e, "vec_id", "embedding", k=K_BRUTE)


KNN_BRUTE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         {_COS.format(a='qv', b='v')} AS cos
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
FROM scored
QUALIFY rn <= {K_BRUTE}
"""


def knn_lsh(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return lsh_bucketed_topk(
        queries, e, "vec_id", "embedding", k=K_LSH, n_bits=N_BITS, dim=DIM
    )


def _bucket_sql(v: str) -> str:
    half = DIM // 2
    terms = []
    for i in range(N_BITS):
        w = 2 ** (N_BITS - 1 - i)
        terms.append(
            f"(CASE WHEN {v}[{i + 1}] > {v}[{i + 1 + half}] THEN {w} ELSE 0 END)"
        )
    return " + ".join(terms)


KNN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  CAST({_bucket_sql('embedding')} AS INT) AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.bucket,
         {_COS.format(a='q.qv', b='e.v')} AS cos
  FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, bucket,
       floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
FROM scored
QUALIFY rn <= {K_LSH}
"""


QUERIES = {
    "knn_bruteforce": (knn_bruteforce, KNN_BRUTE_SQL),
    "knn_lsh": (knn_lsh, KNN_LSH_SQL),
}
