"""Ranked text retrieval: BM25 scoring over a whitespace-token
inverted index — the lexical-search half of a training-data /
retrieval pipeline (the embedding half lives in operators/knn.py).

Spark shape (100 TB story): the query's terms are a tiny constant —
they ride the plan as a literal array, so the token explode is
filtered to query terms BEFORE any shuffle (the per-term postings
shrink to O(df)); document frequencies and corpus stats are one-row /
per-term aggregates broadcast back into the scoring join; the final
top-k is a TakeOrderedAndProject (no global sort). Nothing driver-
side, no UDFs — every expression is JVM whole-stage codegen.

Cross-engine float discipline (see queries/base.py): per-(doc, term)
scores are floor-scaled to BIGINT micro-units and SUMMED AS INTEGERS
(order-independent), divided once at the end. The default idf is the
log-free rational Robertson variant ``(N + 1)/(df + 0.5)`` — ln() is
NOT IEEE-specified and may differ in the last bit between the JVM
and libm, so the contract scoring stays inside +,-,*,/ which are.
``log_idf=True`` switches to the standard Lucene
``ln(1 + (N - df + 0.5)/(df + 0.5))`` for production use where
cross-engine bit-equality is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws

#: BM25 shape parameters (Robertson/Sparck Jones defaults)
K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    log_idf: bool = False,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25.

    Returns (doc_id, n_hit_terms, score) ordered by score DESC,
    doc_id ASC; ``score`` is exact micro-unit arithmetic (BIGINT sum
    / 1e6) so ties and ordering are engine-portable.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_ws(F.lower(F.col(text_col))).alias("toks"),
    )
    lens = toks.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    # corpus stats: one row, broadcast into the scoring join
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    hits = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_by_term = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = (
        hits.join(F.broadcast(df_by_term), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    n = F.col("n_docs").cast("double")
    avgdl_inv = n / F.col("sum_dl").cast("double")  # 1/avgdl, one division
    if log_idf:
        idf = F.log(
            F.lit(1.0)
            + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
    else:
        idf = (n + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(0.5))
    tf_part = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl * avgdl_inv)
    )
    contrib = F.floor(idf * tf_part * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
        F.sum(contrib).alias("score_u"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_hit_terms",
            (F.col("score_u") / F.lit(1e6)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
