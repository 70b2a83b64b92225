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


#: reciprocal-rank-fusion constant (the standard Cormack et al. 60)
RRF_C = 60
#: RRF contributions as exact integer units: RRF_SCALE // (C + rank)
RRF_SCALE = 1_000_000_000


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    doc_id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_stride: int = 50,
    query_cap: int = 3_200,
    leg_k: int = 20,
    k: int = 10,
    df_cap_num: int = 4,
    df_cap_den: int = 5,
) -> DataFrame:
    """HYBRID retrieval (r11): BM25 lexical ranking fused with vector
    cosine ranking by reciprocal-rank fusion — the standard two-leg
    architecture of modern RAG search stacks (score-scale-free, so
    the legs need no calibration).

    Corpus = documents ∩ embeddings on id (docs carrying both text
    and a vector); queries = the repo's shared bounded eval sample
    (every ``query_stride``-th id under ``query_cap``). Per query:
    the top-``leg_k`` by exact cosine, the top-``leg_k`` by BM25 over
    the query doc's own DISTINCT terms (terms with corpus df >
    ``df_cap_num/df_cap_den`` of the corpus are dropped — the
    stopword guard that bounds the inverted join at scale; the 4/5
    default is tuned to the driver's narrow-vocabulary synthetic
    corpus, where almost every term sits near df ≈ 0.78·N — real
    Zipfian corpora would run 1/5 or lower), then
    RRF: Σ legs ``RRF_SCALE // (RRF_C + rank)`` — integer-exact in
    both engines — and the fused top-``k``.

    Spark shape (100 TB story): the lexical leg is a term-inverted
    equi-join whose volume is Σ_t qdf(t)·df(t), bounded by the hot-
    term cap; df/stats are aggregate-sized broadcasts; per-leg and
    fused top-k are WindowGroupLimit ranks. The vector leg here is
    the bounded-eval brute twin (queries are a capped sample — the
    same contract as knn_ann_suite's ground-truth leg); a production
    deployment substitutes any ANN leg (IVF/LSH from operators/
    knn.py) — RRF only consumes (query, neighbor, rank).

    Output: (query_id, neighbor_id, rrf_u, rn, in_vec, in_lex),
    rrf_u the integer fusion units, rn the fused rank, in_* flags
    for which legs proposed the neighbor.
    """
    from pyspark.sql import Window

    from queryengine_spark.operators.knn import brute_force_topk

    corpus = docs.select(
        F.col(doc_id_col).alias("id"),
        F.col(text_col).alias("text"),
    ).join(
        emb.select(
            F.col(vec_id_col).alias("id"), F.col(vec_col).alias("vec")
        ),
        "id",
    )
    queries = corpus.filter(
        (F.col("id") % query_stride == 0) & (F.col("id") < query_cap)
    )

    # ---- vector leg: exact cosine top-leg_k over the shared corpus
    vleg = brute_force_topk(
        queries.select("id", "vec"),
        corpus.select("id", "vec"),
        "id",
        "vec",
        k=leg_k,
    ).select("query_id", "neighbor_id", F.col("rn").alias("rn_v"))

    # ---- lexical leg: per-query BM25 over the query doc's terms
    toks = corpus.select(
        "id", tokenize_ws(F.lower(F.col("text"))).alias("toks")
    )
    lens = toks.select("id", F.size("toks").cast("bigint").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dtok = (
        toks.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfs = dtok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qterms = toks.join(
        queries.select("id"), "id"
    ).select(
        F.col("id").alias("query_id"),
        F.explode(F.array_distinct("toks")).alias("term"),
    )
    # stopword guard BEFORE the postings join: df·den ≤ num·n_docs
    kept = (
        qterms.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("df") * F.lit(df_cap_den)
            <= F.lit(df_cap_num) * F.col("n_docs")
        )
    )
    cand = (
        kept.join(dtok.withColumnRenamed("id", "neighbor_id"), "term")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(lens.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    n = F.col("n_docs").cast("double")
    avgdl_inv = n / F.col("sum_dl").cast("double")
    idf = (n + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(0.5))
    tf_part = (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl * avgdl_inv)
    )
    contrib = F.floor(idf * tf_part * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    lex = cand.groupBy("query_id", "neighbor_id").agg(
        F.sum(contrib).alias("score_u")
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), F.col("neighbor_id").asc()
    )
    lleg = (
        lex.withColumn("rn_l", F.row_number().over(wl))
        .filter(F.col("rn_l") <= leg_k)
        .select("query_id", "neighbor_id", "rn_l")
    )

    # ---- reciprocal-rank fusion (integer units, both legs optional)
    fused = vleg.join(lleg, ["query_id", "neighbor_id"], "full_outer")
    rrf_u = F.coalesce(
        F.expr(f"{RRF_SCALE} DIV ({RRF_C} + rn_v)"), F.lit(0)
    ) + F.coalesce(F.expr(f"{RRF_SCALE} DIV ({RRF_C} + rn_l)"), F.lit(0))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_u").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rrf_u", rrf_u.cast("bigint"))
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rrf_u",
            "rn",
            F.col("rn_v").isNotNull().cast("int").alias("in_vec"),
            F.col("rn_l").isNotNull().cast("int").alias("in_lex"),
        )
    )
