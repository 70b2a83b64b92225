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


def knn_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall of the LSH-bucketed ANN against brute-force ground truth
    (top-3, same query set): the evaluation loop that justifies — or
    vetoes — the approximate path at scale."""
    e = t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    bf = brute_force_topk(queries, e, "vec_id", "embedding", k=K_LSH)
    lsh = lsh_bucketed_topk(queries, e, "vec_id", "embedding", k=K_LSH, n_bits=N_BITS, dim=DIM)
    hits = (
        bf.select("query_id", "neighbor_id")
        .join(lsh.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return (
        bf.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_found", F.lit(0)).alias("n_found"),
            (F.coalesce("n_found", F.lit(0)) / F.lit(K_LSH)).alias("recall"),
        )
    )


KNN_RECALL_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  CAST({_bucket_sql('embedding')} AS INT) AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id % 50 = 0),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_COS.format(a='q.qv', b='e.v')} DESC, e.vec_id ASC) AS rn
    FROM q JOIN e ON e.vec_id <> q.query_id
  ) WHERE rn <= {K_LSH}
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_COS.format(a='q.qv', b='e.v')} DESC, e.vec_id ASC) AS rn
    FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id
  ) WHERE rn <= {K_LSH}
),
hits AS (
  SELECT bf.query_id, COUNT(*) AS n_found
  FROM bf WHERE EXISTS (SELECT 1 FROM lsh
                        WHERE lsh.query_id = bf.query_id
                          AND lsh.neighbor_id = bf.neighbor_id)
  GROUP BY bf.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_found, 0) AS BIGINT) AS n_found,
       COALESCE(h.n_found, 0) / {K_LSH} AS recall
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN hits h ON q.query_id = h.query_id
"""


QUERIES = {
    "knn_bruteforce": (knn_bruteforce, KNN_BRUTE_SQL),
    "knn_lsh": (knn_lsh, KNN_LSH_SQL),
    "knn_lsh_recall": (knn_lsh_recall, KNN_RECALL_SQL),
}
