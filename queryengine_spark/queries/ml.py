"""Round-4 ML/curation pack: full-corpus distributed Lloyd k-means
(+ cluster-balanced subset selection), MMR result diversification,
and DSIR-shaped importance resampling — the corpus-structure and
data-selection layer of an LLM training pipeline.

Oracle strategy:
- k-means reuses ``queries/knn.py::_ivf_cte`` (the single source of
  truth for every quantizer in this package) with the sample LIMIT
  set past the corpus size — "the sample is the corpus" — so the
  oracle unrolls the IDENTICAL integer Lloyd iterations the
  distributed trainer executes;
- MMR's greedy loop is a fixed ``MMR_K`` steps, so the oracle unrolls
  it as a static CTE chain (selected-set union → max-similarity
  redundancy → argmax with id tiebreak), all in the package's
  bit-exact left-associated float64 cosine;
- DSIR is integer end-to-end (md5 bucket hash, BIGINT counts,
  integer-division weights) with one final int/int double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.operators.clustering import (
    kmeans_assign_cells,
    kmeans_fit_distributed,
)
from queryengine_spark.operators.importance import dsir_importance
from queryengine_spark.operators.mmr import mmr_topk
from queryengine_spark.queries.base import t
from queryengine_spark.queries.curation import _TOKS_CTE
from queryengine_spark.queries.knn import _COS, DIM, _ivf_cte

#: full-corpus Lloyd: 8 clusters, 3 iterations (matching the
#: package's quantizer iteration budget), trained on EVERY vector —
#: the oracle's sample LIMIT is set past any test corpus size
KM_K = 8
KM_ITERS = 3
KM_SAMPLE_ALL = 1_000_000_000

#: cluster-balanced sample: per-cell quota, smallest-md5 draw
CB_QUOTA = 20

#: MMR: every-100th vector queries, 10-deep shortlist, 3 selections,
#: λ = 7/10
MMR_EVERY = 100
MMR_M = 10
MMR_K = 3
MMR_LNUM = 7
MMR_LDEN = 10

#: DSIR: 4096 hashed-feature buckets, 10^6 weight scale, top-100
#: resample toward the English subset as the target distribution
DSIR_BUCKETS = 4096
DSIR_SCALE = 1_000_000
DSIR_N = 100
DSIR_TARGET_LANG = "en"


def ml_kmeans_distributed(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd k-means trained on the FULL embeddings relation
    (operators/clustering.py): per-iteration state leaving the
    executors is k×(dim+1) longs per map partition; driver state is
    the k×dim centroid matrix. Output: every vector's final cell."""
    e = t(spark, sf, "embeddings")
    cents = kmeans_fit_distributed(e, "vec_id", "embedding", KM_K, KM_ITERS, DIM)
    return kmeans_assign_cells(e, "vec_id", "embedding", cents, DIM)


ML_KMEANS_SQL = f"""{_ivf_cte(dim_filter=True, include_qcells=False,
                              sample_n=KM_SAMPLE_ALL, n_cells=KM_K,
                              iters=KM_ITERS)}
SELECT vec_id, CAST(cell AS INT) AS cell FROM cells
"""


def pipeline_cluster_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Diversity-preserving subset selection: the ``CB_QUOTA``
    vectors per k-means cell with the smallest md5(vec_id) —
    cluster-balanced sampling flattens the corpus's mode imbalance
    (the dominant cluster can't monopolize the sample), replayable on
    any engine/partitioning. One shuffle on cell;
    WindowGroupLimit keeps per-cell state at the quota."""
    e = t(spark, sf, "embeddings")
    cents = kmeans_fit_distributed(e, "vec_id", "embedding", KM_K, KM_ITERS, DIM)
    cells = kmeans_assign_cells(e, "vec_id", "embedding", cents, DIM)
    h = F.md5(F.col("vec_id").cast("string"))
    w = Window.partitionBy("cell").orderBy(h.asc())
    return (
        cells.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= CB_QUOTA)
        .select("cell", "rank", "vec_id")
    )


CLUSTER_SAMPLE_SQL = f"""{_ivf_cte(dim_filter=True, include_qcells=False,
                                   sample_n=KM_SAMPLE_ALL, n_cells=KM_K,
                                   iters=KM_ITERS)}
SELECT CAST(cell AS INT) AS cell,
       CAST(row_number() OVER (PARTITION BY cell
            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC) AS INT) AS rank,
       vec_id
FROM cells
QUALIFY rank <= {CB_QUOTA}
"""


def knn_mmr(spark: SparkSession, sf: str) -> DataFrame:
    """MMR-diversified retrieval (operators/mmr.py): exact top-10
    shortlist, 3 greedy λ=0.7 selections unrolled into static
    DataFrame stages."""
    e = t(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % MMR_EVERY == 0)
    return mmr_topk(
        queries, e, "vec_id", "embedding",
        k=MMR_K, shortlist_m=MMR_M, lam_num=MMR_LNUM, lam_den=MMR_LDEN,
    )


def _mmr_sql() -> str:
    """Unrolled greedy MMR as a static CTE chain (see module doc)."""
    cos_q = _COS.format(a="q.qv", b="e.v")
    cos_p = _COS.format(a="e1.v", b="e2.v")
    rel_w = float(MMR_LNUM)
    red_w = float(MMR_LDEN - MMR_LNUM)
    den = float(MMR_LDEN)
    parts = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % {MMR_EVERY} = 0),
scored AS (SELECT q.qid, e.vec_id AS nid, {cos_q} AS rel
           FROM q, e WHERE e.vec_id <> q.qid),
short AS (SELECT qid, nid, rel FROM (
            SELECT qid, nid, rel,
                   row_number() OVER (PARTITION BY qid
                        ORDER BY rel DESC, nid ASC) AS rn
            FROM scored) WHERE rn <= {MMR_M}),
pair AS (SELECT s1.qid, s1.nid AS a, s2.nid AS b, {cos_p} AS sim
         FROM short s1 JOIN short s2 ON s1.qid = s2.qid AND s1.nid <> s2.nid
         JOIN e e1 ON e1.vec_id = s1.nid JOIN e e2 ON e2.vec_id = s2.nid),
sel1 AS (SELECT qid, nid, rel AS mmr, 1 AS step FROM (
           SELECT qid, nid, rel,
                  row_number() OVER (PARTITION BY qid
                       ORDER BY rel DESC, nid ASC) AS rn
           FROM short) WHERE rn = 1)"""
    ]
    sel_union = "SELECT qid, nid FROM sel1"
    for s in range(2, MMR_K + 1):
        parts.append(f""",
selset{s} AS ({sel_union}),
red{s} AS (SELECT p.qid, p.a AS nid, MAX(p.sim) AS red
           FROM pair p JOIN selset{s} t ON p.qid = t.qid AND p.b = t.nid
           GROUP BY p.qid, p.a),
m{s} AS (SELECT c.qid, c.nid,
                ({rel_w} * c.rel - {red_w} * r.red) / {den} AS mmr
         FROM short c JOIN red{s} r ON c.qid = r.qid AND c.nid = r.nid
         WHERE NOT EXISTS (SELECT 1 FROM selset{s} t
                           WHERE t.qid = c.qid AND t.nid = c.nid)),
sel{s} AS (SELECT qid, nid, mmr, {s} AS step FROM (
             SELECT qid, nid, mmr,
                    row_number() OVER (PARTITION BY qid
                         ORDER BY mmr DESC, nid ASC) AS rn
             FROM m{s}) WHERE rn = 1)""")
        sel_union += f" UNION ALL SELECT qid, nid FROM sel{s}"
    union_all = " UNION ALL ".join(
        f"SELECT qid, nid, mmr, step FROM sel{s}"
        for s in range(1, MMR_K + 1)
    )
    parts.append(f"""
SELECT qid AS query_id, nid AS neighbor_id, CAST(step AS INT) AS step,
       floor(mmr * 1000000.0 + 0.5) / 1000000.0 AS mmr
FROM ({union_all})""")
    return "".join(parts)


def pipeline_dsir_sample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-shaped importance resampling toward the ``en`` subset
    (operators/importance.py): top-``DSIR_N`` documents by hashed
    n-gram importance, with the exact-integer margin and a replayable
    (score, id) order. TakeOrderedAndProject bounds the global top-N;
    the rank window then runs over only those N rows."""
    d = t(spark, sf, "documents")
    imp = dsir_importance(
        d, "doc_id", "text", F.col("lang") == DSIR_TARGET_LANG,
        n_buckets=DSIR_BUCKETS, scale=DSIR_SCALE,
    )
    top = imp.orderBy(F.col("score").desc(), F.col("id").asc()).limit(DSIR_N)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("id").alias("doc_id"),
        "n_feats",
        "margin",
        "score",
    )


DSIR_SQL = (
    _TOKS_CTE
    + f""",
uni AS (SELECT id, unnest(toks) AS feat FROM d),
bi AS (SELECT id, toks[CAST(t.i AS INT)] || ' ' || toks[CAST(t.i AS INT) + 1] AS feat
       FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
feats AS (SELECT id, feat FROM uni UNION ALL SELECT id, feat FROM bi),
fb AS (SELECT id,
        (('0x' || substr(md5(feat), 1, 4))::BIGINT) % {DSIR_BUCKETS} AS bucket
       FROM feats),
tids AS (SELECT doc_id AS id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS t_f
       FROM fb JOIN tids USING (id) GROUP BY bucket),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS r_f
       FROM fb GROUP BY bucket),
w AS (SELECT rc.bucket,
             ((COALESCE(tc.t_f, 0) + 1) * {DSIR_SCALE}) // (rc.r_f + 1) AS w
      FROM rc LEFT JOIN tc USING (bucket)),
doc AS (SELECT fb.id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(w.w) AS BIGINT) AS margin
        FROM fb JOIN w USING (bucket) GROUP BY fb.id)
SELECT CAST(row_number() OVER (ORDER BY margin / n_feats DESC, id ASC) AS INT) AS rank,
       id AS doc_id, n_feats, margin, margin / n_feats AS score
FROM doc
QUALIFY rank <= {DSIR_N}
"""
)


def ml_kmeans_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Clustering evaluation against the embeddings' ground-truth
    ``label`` column: per-cell contingency → majority label (ties to
    the smallest label) → purity = n_major / n_total (one exact
    int/int division). The standard external clustering metric,
    computed with one groupBy and a WindowGroupLimit argmax."""
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings")
    cents = kmeans_fit_distributed(e, "vec_id", "embedding", KM_K, KM_ITERS, DIM)
    cells = kmeans_assign_cells(e, "vec_id", "embedding", cents, DIM)
    cont = (
        cells.join(e.select("vec_id", F.col("label").cast("int").alias("label")),
                   "vec_id")
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    totals = cont.groupBy("cell").agg(
        F.sum("n").cast("bigint").alias("n_total")
    )
    major = (
        cont.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("label").alias("majority_label"),
                F.col("n").alias("n_major"))
    )
    return totals.join(major, "cell").select(
        "cell",
        "n_total",
        "majority_label",
        "n_major",
        (F.col("n_major") / F.col("n_total")).alias("purity"),
    )


ML_KMEANS_PURITY_SQL = f"""{_ivf_cte(dim_filter=True, include_qcells=False,
                                     sample_n=KM_SAMPLE_ALL, n_cells=KM_K,
                                     iters=KM_ITERS)},
lab AS (SELECT vec_id, CAST(label AS INT) AS label FROM embeddings),
cont AS (SELECT c.cell, l.label, CAST(count(*) AS BIGINT) AS n
         FROM cells c JOIN lab l USING (vec_id) GROUP BY c.cell, l.label),
tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_total FROM cont GROUP BY cell),
maj AS (SELECT cell, label AS majority_label, n AS n_major FROM (
          SELECT cell, label, n,
                 row_number() OVER (PARTITION BY cell
                      ORDER BY n DESC, label ASC) AS rn
          FROM cont) WHERE rn = 1)
SELECT CAST(t.cell AS INT) AS cell, t.n_total, m.majority_label, m.n_major,
       m.n_major / t.n_total AS purity
FROM tot t JOIN maj m USING (cell)
"""


#: sequential Poisson sample size
WSAMPLE_K = 100


def pipeline_weighted_sample_wor(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted document sample without replacement
    (operators/sampling.py, sequential Poisson order sampling):
    longer documents proportionally more likely, fully replayable —
    the πps draw a token-budgeted corpus cut wants. One
    TakeOrderedAndProject."""
    from queryengine_spark.operators.sampling import weighted_sample_wor

    d = t(spark, sf, "documents").select("doc_id", "n_chars")
    return weighted_sample_wor(d, "doc_id", "n_chars", WSAMPLE_K).select(
        "rank", "doc_id", "n_chars", "skey"
    )


WSAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)
          * 10000) // n_chars AS skey
  FROM documents WHERE n_chars > 0)
SELECT CAST(row_number() OVER (ORDER BY skey ASC, doc_id ASC) AS INT) AS rank,
       doc_id, n_chars, CAST(skey AS BIGINT) AS skey
FROM keyed
QUALIFY rank <= {WSAMPLE_K}
"""


QUERIES = {
    "ml_kmeans_distributed": (ml_kmeans_distributed, ML_KMEANS_SQL),
    "ml_kmeans_purity": (ml_kmeans_purity, ML_KMEANS_PURITY_SQL),
    "pipeline_weighted_sample_wor": (pipeline_weighted_sample_wor, WSAMPLE_SQL),
    "pipeline_cluster_balanced_sample": (
        pipeline_cluster_balanced_sample,
        CLUSTER_SAMPLE_SQL,
    ),
    "knn_mmr": (knn_mmr, _mmr_sql()),
    "pipeline_dsir_sample": (pipeline_dsir_sample, DSIR_SQL),
}
