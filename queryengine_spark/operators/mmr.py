"""Maximal Marginal Relevance (Carbonell & Goldstein 1998) result
diversification over an embedding column — the standard post-filter
on a retrieval shortlist when near-duplicate corpus entries would
otherwise fill every top-k slot (exactly the failure mode of a
near-dup-heavy training corpus).

Greedy MMR is inherently sequential (step t scores every remaining
candidate against the t−1 already-selected results), which looks
hostile to a declarative engine — but k is a small fixed constant,
so the loop UNROLLS into k static DataFrame stages: each stage is an
anti-join (drop selected), a groupBy-max over the precomputed
shortlist×selected similarity pairs (redundancy), and a
WindowGroupLimit argmax. No UDF holds state; no driver loop touches
data — the "iteration" lives in the plan, Catalyst optimizes across
stages, and the whole thing is one job.

Scale: all pairwise similarity work happens INSIDE the per-query
shortlist (m candidates → m·(m−1) pairs per query, m ≈ 10-50), never
across the corpus — the expensive part stays the ANN shortlist
producer, which is the bucketed/broadcast machinery in
``operators/knn.py``. The shortlist and pair relations are
lazily checkpointed so the k unrolled stages reuse them instead of
re-deriving the cosine kernel k times.

Determinism: relevance and redundancy are the package's standard
left-associated float64 cosine (bit-identical across engines); the
MMR combine ``(λ·rel − (1−λ)·red)`` is evaluated as
``(lam_num·rel − (lam_den−lam_num)·red) / lam_den`` with small
integer literals — single IEEE multiplies/divide, bit-exact on any
engine — and every argmax carries a neighbor-id tiebreak, so the
DuckDB oracle's unrolled CTE chain matches hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.functions.similarity import cosine_similarity
from queryengine_spark.operators.topk import grouped_topk


def mmr_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    shortlist_m: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Diversified top-k: exact-cosine shortlist of ``shortlist_m``
    per query, then ``k`` unrolled greedy MMR selections with
    λ = lam_num/lam_den. Step 1 is pure relevance (mmr = rel, the
    usual convention); steps 2..k maximize
    ``(lam_num·rel − (lam_den−lam_num)·red) / lam_den`` where red =
    max similarity to the already-selected set. Returns
    (query_id, neighbor_id, step, mmr)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rel", cosine_similarity("q_vec", "c_vec"))
    )
    short = (
        grouped_topk(
            scored,
            ["query_id"],
            [F.col("rel").desc(), F.col("neighbor_id").asc()],
            shortlist_m,
        )
        .select("query_id", "neighbor_id", "rel", "c_vec")
        .localCheckpoint(eager=False)
    )
    s1 = short.select(
        "query_id", F.col("neighbor_id").alias("a"), F.col("c_vec").alias("va")
    )
    s2 = short.select(
        "query_id", F.col("neighbor_id").alias("b"), F.col("c_vec").alias("vb")
    )
    pair = (
        s1.join(s2, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select("query_id", "a", "b", cosine_similarity("va", "vb").alias("sim"))
        .localCheckpoint(eager=False)
    )
    sel = grouped_topk(
        short,
        ["query_id"],
        [F.col("rel").desc(), F.col("neighbor_id").asc()],
        1,
    ).select(
        "query_id",
        "neighbor_id",
        F.lit(1).alias("step"),
        F.col("rel").alias("mmr"),
    )
    rel_w = float(lam_num)
    red_w = float(lam_den - lam_num)
    den = float(lam_den)
    for step in range(2, k + 1):
        sel_ids = sel.select("query_id", "neighbor_id")
        cand = short.join(sel_ids, ["query_id", "neighbor_id"], "left_anti")
        red = (
            pair.join(
                sel_ids.withColumnRenamed("neighbor_id", "b"), ["query_id", "b"]
            )
            .groupBy("query_id", "a")
            .agg(F.max("sim").alias("red"))
            .select("query_id", F.col("a").alias("neighbor_id"), "red")
        )
        mmr = (F.lit(rel_w) * F.col("rel") - F.lit(red_w) * F.col("red")) / F.lit(den)
        pick = grouped_topk(
            cand.join(red, ["query_id", "neighbor_id"]).withColumn("mmr", mmr),
            ["query_id"],
            [F.col("mmr").desc(), F.col("neighbor_id").asc()],
            1,
        ).select("query_id", "neighbor_id", F.lit(step).alias("step"), "mmr")
        sel = sel.unionByName(pick)
    return sel.select(
        "query_id",
        "neighbor_id",
        F.col("step").cast("int").alias("step"),
        fround("mmr", 6).alias("mmr"),
    )
