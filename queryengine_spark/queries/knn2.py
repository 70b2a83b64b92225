"""Round-3 ANN additions: IVF-PQ (product-quantized) top-k and its
exact-re-rank variant (which carries the recall@3 evaluation as an
output column since the r5 registry fold). Registered after the
round-3 certification window (see queries/__init__.py) — first driver
row in round 4.

The oracle unrolls, in one SQL statement: the IVF coarse quantizer's
integer k-means (reusing queries/knn.py::_ivf_cte verbatim, so cells
match knn_ivf exactly), the per-subspace PQ codebook k-means (same
integer arithmetic, keyed by subspace), code assignment, ADC scoring,
and the exact re-rank — every accumulation is an int64 SUM
(order-independent), so centroids, codes, scores and ranks are
bit-identical across engines.

Config is the standard PQ16×8 (16 subspaces × 256 centroids → 16
bytes/vector, 32× compression of a float64[64]): measured on the
clustered test corpus (tests/test_knn_pq.py) ADC-only recall@3 is
0.60 — 8-bit codes cannot rank inside a tight cluster — while the
32-deep shortlist contains the true top-3 with p=0.993, so the
re-rank path (fetch 32 full vectors per query, exact cosine) is the
shipped configuration, mirroring FAISS's IVFPQ+refine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.operators.knn import brute_force_topk, ivf_pq_topk
from queryengine_spark.queries.base import t
from queryengine_spark.queries.knn import (
    DIM,
    Q_ID_CAP,
    _query_sample,
    K_LSH,
    KMEANS_ITERS,
    N_CELLS,
    NPROBE,
    SAMPLE_N,
    _BF_HITS_CTE,
    _RECALL_TAIL,
    _ivf_cte,
)

PQ_M = 16
PQ_KSUB = 256
PQ_SAMPLE_N = 1024
RERANK_R = 32
#: bump when index encode semantics change (invalidates /tmp artifacts)
#: v2 (r6): residual encoding — codes are PQ(x − c(x)), not PQ(x)
_INDEX_VERSION = 2
_SUB = DIM // PQ_M

_KW = dict(
    k=K_LSH, n_cells=N_CELLS, nprobe=NPROBE,
    sample_n=SAMPLE_N, train_iters=KMEANS_ITERS,
    m=PQ_M, ksub=PQ_KSUB, dim=DIM, pq_sample_n=PQ_SAMPLE_N,
)


def knn_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Pure ADC ranking over PQ codes (no re-rank): the cheapest scan
    — candidate vectors never leave storage, only 16-byte codes
    travel. Ranking noise at 8-bit resolution is inherent; the
    re-rank twin below is the quality path."""
    e = t(spark, sf, "embeddings")
    queries = _query_sample(e)
    return ivf_pq_topk(queries, e, "vec_id", "embedding", **_KW)


def knn_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """ADC top-32 shortlist → exact cosine re-rank over only those 32
    full vectors per query — the production IVF-PQ configuration.
    Per-query recall@3 vs brute force rides along as a column (r5
    fold of the standalone knn_pq_recall evaluation query)."""
    from queryengine_spark.queries.knn import _with_recall

    e = t(spark, sf, "embeddings")
    queries = _query_sample(e)
    ann = ivf_pq_topk(
        queries, e, "vec_id", "embedding", rerank_r=RERANK_R, **_KW
    )
    bf = brute_force_topk(queries, e, "vec_id", "embedding", k=K_LSH)
    return _with_recall(ann, bf)


def _pq_cte() -> str:
    """IVF cells/qcells (reused verbatim from queries/knn.py) + the
    PQ codebook chain: per-subspace k-means over a 1024-vector
    sample, code assignment, centroid reconstruction, ADC scoring.

    The chained multi-referenced CTEs are AS MATERIALIZED: DuckDB
    otherwise inlines each reference, re-executing the whole chain
    per reference (measured 69 s → 9 s at sf0.01)."""
    parts = [
        _ivf_cte(),
        f""",
ps AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {PQ_SAMPLE_N}),
-- r6 residual encoding (FAISS IVFPQ): the PQ domain is x − c(x),
-- the coarse-quantizer residual — training sample and corpus alike
psp AS MATERIALIZED (SELECT p.vec_id, CAST((p.d - 1) // {_SUB} AS INT) AS sub, p.d,
               p.x - cc.c AS x
        FROM (SELECT vec_id, d, CAST(floor(v[d] * 10000.0) AS BIGINT) AS x
              FROM ps, dims) p
        JOIN cells ce ON ce.vec_id = p.vec_id
        JOIN c{KMEANS_ITERS} cc ON cc.cid = ce.cell AND cc.d = p.d),
pep AS MATERIALIZED (SELECT p.vec_id, CAST((p.d - 1) // {_SUB} AS INT) AS sub, p.d,
               p.x - cc.c AS x
        FROM ep p
        JOIN cells ce ON ce.vec_id = p.vec_id
        JOIN c{KMEANS_ITERS} cc ON cc.cid = ce.cell AND cc.d = p.d),
pseed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
          FROM (SELECT vec_id FROM ps ORDER BY vec_id LIMIT {PQ_KSUB})),
pc0 AS MATERIALIZED (SELECT p.sub, sd.cid, p.d, p.x AS c
        FROM pseed sd JOIN psp p ON p.vec_id = sd.vec_id)""",
    ]
    for k in range(1, KMEANS_ITERS + 1):
        parts.append(f""",
pd{k} AS MATERIALIZED (SELECT p.vec_id, c.sub, c.cid, SUM((p.x - c.c) * (p.x - c.c)) AS dd
         FROM psp p JOIN pc{k - 1} c ON p.d = c.d GROUP BY p.vec_id, c.sub, c.cid),
pa{k} AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
           SELECT vec_id, sub, cid,
                  row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd ASC, cid ASC) AS rn
           FROM pd{k}) WHERE rn = 1),
pm{k} AS MATERIALIZED (SELECT a.sub, a.cid, p.d, COUNT(*) AS n, SUM(p.x) AS sx
         FROM pa{k} a JOIN psp p ON p.vec_id = a.vec_id AND p.sub = a.sub
         GROUP BY a.sub, a.cid, p.d),
pc{k} AS MATERIALIZED (SELECT c.sub, c.cid, c.d,
          CASE WHEN m.n IS NULL THEN c.c
               ELSE CAST((m.sx - ((m.sx % m.n) + m.n) % m.n) // m.n AS BIGINT) END AS c
          FROM pc{k - 1} c LEFT JOIN pm{k} m
            ON m.sub = c.sub AND m.cid = c.cid AND m.d = c.d)""")
    parts.append(f""",
pdist AS MATERIALIZED (SELECT p.vec_id, c.sub, c.cid, SUM((p.x - c.c) * (p.x - c.c)) AS dd
          FROM pep p JOIN pc{KMEANS_ITERS} c ON p.d = c.d
          GROUP BY p.vec_id, c.sub, c.cid),
pcodes AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
            SELECT vec_id, sub, cid,
                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd ASC, cid ASC) AS rn
            FROM pdist) WHERE rn = 1),
rsel AS MATERIALIZED (SELECT co.vec_id, c.d, c.c + cc.c AS c
         FROM pcodes co
         JOIN pc{KMEANS_ITERS} c ON c.sub = co.sub AND c.cid = co.cid
         JOIN cells ce ON ce.vec_id = co.vec_id
         JOIN c{KMEANS_ITERS} cc ON cc.cid = ce.cell AND cc.d = c.d),
rnorm AS (SELECT vec_id, SUM(c * c) AS rn2 FROM rsel GROUP BY vec_id),
qp AS (SELECT vec_id, d, x FROM ep
       WHERE vec_id % 50 = 0 AND vec_id < {Q_ID_CAP}),
qnorm AS (SELECT vec_id, SUM(x * x) AS qn2 FROM qp GROUP BY vec_id),
cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM qcells q JOIN cells c ON q.cell = c.cell
         WHERE c.vec_id <> q.vec_id),
dots AS (SELECT p.query_id, p.neighbor_id, SUM(qp.x * r.c) AS dot
         FROM cand p
         JOIN qp ON qp.vec_id = p.query_id
         JOIN rsel r ON r.vec_id = p.neighbor_id AND r.d = qp.d
         GROUP BY p.query_id, p.neighbor_id),
pscored AS MATERIALIZED (SELECT d.query_id, d.neighbor_id,
            d.dot / (sqrt(CAST(q.qn2 AS DOUBLE)) * sqrt(CAST(r.rn2 AS DOUBLE))) AS score
            FROM dots d
            JOIN qnorm q ON q.vec_id = d.query_id
            JOIN rnorm r ON r.vec_id = d.neighbor_id
            WHERE isfinite(d.dot / (sqrt(CAST(q.qn2 AS DOUBLE))
                                    * sqrt(CAST(r.rn2 AS DOUBLE)))))""")
    return "".join(parts)


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

KNN_PQ_SQL = f"""{_pq_cte()}
SELECT query_id, neighbor_id,
       floor(score * 1000000.0 + 0.5) / 1000000.0 AS score_hat,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id ASC) AS INT) AS rn
FROM pscored
QUALIFY rn <= {K_LSH}
"""

_SHORT_CTE = f""",
short AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS rn
           FROM pscored) WHERE rn <= {RERANK_R}),
rer AS (SELECT s.query_id, s.neighbor_id,
               {_COS.format(a='qe.v', b='ce.v')} AS cos
        FROM short s
        JOIN e qe ON qe.vec_id = s.query_id
        JOIN e ce ON ce.vec_id = s.neighbor_id)"""

KNN_PQ_RERANK_SQL = f"""{_pq_cte()}{_SHORT_CTE},
topk AS (
  SELECT query_id, neighbor_id,
         floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
  FROM rer
  QUALIFY rn <= {K_LSH}
){_BF_HITS_CTE}
{_RECALL_TAIL}
"""


def knn_pq_index(spark: SparkSession, sf: str) -> DataFrame:
    """Build-once/query-many (r5): persist the trained IVF-PQ index
    as a parquet artifact (operators/annindex.py — centroids,
    codebooks, cell-PARTITIONED 16-byte codes), then answer the
    queries FROM THE ARTIFACT with zero retraining and zero sample
    collects. Same parameters and the same shared scoring tail as
    knn_pq_rerank, so the ANN result is bit-identical to it — the
    oracle is therefore the rerank oracle (minus the folded recall
    column), which certifies the whole write→read→query roundtrip:
    any loss in the parquet round-trip of centroids, codebooks or
    codes would break the hash. The build runs ONCE per
    (params, corpus): a version-stamped marker written after a
    successful build lets later calls go straight to the read path —
    that IS the query's claim (build-once/query-many; a real
    deployment's artifact store carries the same metadata), and it is
    safe because the index content is a pure function of the stamped
    params and the immutable test corpus. Bump _INDEX_VERSION when
    encode semantics change — the same discipline as
    certification.VOID."""
    import json
    import os

    from queryengine_spark.operators.annindex import (
        ivf_pq_topk_from_index,
        read_pq_index,
        write_pq_index,
    )

    from queryengine_spark.operators.annindex import corpus_fingerprint

    e = t(spark, sf, "embeddings")
    path = f"/tmp/qe-annindex-{os.path.basename(os.path.normpath(sf))}"
    params = dict(
        version=_INDEX_VERSION, n_cells=N_CELLS, m=PQ_M, ksub=PQ_KSUB, dim=DIM,
        sample_n=SAMPLE_N, pq_sample_n=PQ_SAMPLE_N, train_iters=KMEANS_ITERS,
        # r5 ADVICE: key the cache on the SOURCE too — a regenerated
        # corpus (or a checkout sharing the sf-dir basename) must
        # force a rebuild, not silently reuse stale codes
        corpus=corpus_fingerprint(os.path.join(sf, "embeddings.parquet")),
    )
    marker = os.path.join(path, "BUILT.json")
    try:
        with open(marker) as f:
            need_build = json.load(f) != params
    except (OSError, ValueError):
        need_build = True
    if need_build:
        write_pq_index(
            e, "vec_id", "embedding",
            path,
            n_cells=N_CELLS, m=PQ_M, ksub=PQ_KSUB, dim=DIM,
            sample_n=SAMPLE_N, pq_sample_n=PQ_SAMPLE_N, train_iters=KMEANS_ITERS,
        )
        with open(marker, "w") as f:
            json.dump(params, f)
    idx = read_pq_index(spark, path)
    queries = _query_sample(e)
    return ivf_pq_topk_from_index(
        queries, idx, "vec_id", "embedding",
        k=K_LSH, nprobe=NPROBE, rerank_r=RERANK_R, candidates=e,
    )


KNN_PQ_INDEX_SQL = f"""{_pq_cte()}{_SHORT_CTE}
SELECT query_id, neighbor_id,
       floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
FROM rer
QUALIFY rn <= {K_LSH}
"""


def knn_lsh_index(spark: SparkSession, sf: str) -> DataFrame:
    """Build-once/query-many for the SRP-LSH path (r6 — artifact
    parity with knn_pq_index): persist planes + bucket relation +
    vectors as parquet (operators/annindex.py — buckets
    hive-partitioned BY BUCKET, so probing prunes directories), then
    answer the queries FROM THE ARTIFACT with zero plane re-derivation
    and zero candidate rehash. Same parameters and the same scoring
    tail as knn_lsh, so the ANN rows are bit-identical to it — the
    oracle is the knn_lsh oracle minus the folded recall column,
    certifying the whole write→read→query roundtrip (any loss in the
    plane/bucket/vector round-trip breaks the hash). Build-once
    marker + corpus fingerprint, same discipline as knn_pq_index."""
    import json
    import os

    from queryengine_spark.operators.annindex import (
        corpus_fingerprint,
        read_lsh_index,
        srp_topk_from_index,
        write_lsh_index,
    )
    from queryengine_spark.queries.knn import N_BITS, N_TABLES, NNZ, PROBE

    e = t(spark, sf, "embeddings")
    path = f"/tmp/qe-lshindex-{os.path.basename(os.path.normpath(sf))}"
    params = dict(
        version=_INDEX_VERSION, n_bits=N_BITS, n_tables=N_TABLES, nnz=NNZ,
        dim=DIM,
        corpus=corpus_fingerprint(os.path.join(sf, "embeddings.parquet")),
    )
    marker = os.path.join(path, "BUILT.json")
    try:
        with open(marker) as f:
            need_build = json.load(f) != params
    except (OSError, ValueError):
        need_build = True
    if need_build:
        write_lsh_index(
            e, "vec_id", "embedding", path,
            n_bits=N_BITS, n_tables=N_TABLES, nnz=NNZ, dim=DIM,
        )
        with open(marker, "w") as f:
            json.dump(params, f)
    idx = read_lsh_index(spark, path)
    queries = _query_sample(e)
    return srp_topk_from_index(
        queries, idx, "vec_id", "embedding", k=K_LSH, probe=PROBE
    )


def _lsh_index_sql() -> str:
    from queryengine_spark.queries.knn import _srp_cte

    return f"""{_srp_cte()}
SELECT query_id, neighbor_id,
       floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
FROM scored
QUALIFY rn <= {K_LSH}
"""


def knn_pq_suite(spark: SparkSession, sf: str) -> DataFrame:
    """r6 registry fold (VERDICT r5 item 9): the knn_pq trio — pure
    ADC ranking, ADC+exact-re-rank (with the folded recall column),
    and the persistent-artifact read path — as ONE tagged composite
    relation. All three legs still execute in full (the index leg
    builds/reads the parquet artifact exactly as before); the oracle
    runs the shared PQ training prefix ONCE and unions three tagged
    selects, so one hash certifies ADC scoring, the re-rank, the
    recall ground-truth join AND the artifact write→read→query
    roundtrip (the index leg must stay bit-identical to the in-session
    rerank or the hash breaks). Column convention: ``score`` is the
    leg's own ranking score (rounded ADC cosine for 'adc', exact
    re-ranked cosine for 'rerank'/'index'); ``recall`` is NULL outside
    the 'rerank' leg."""
    from queryengine_spark.operators.knn import ivf_pq_topk_both
    from queryengine_spark.queries.knn import _with_recall

    nul = F.lit(None).cast("double")
    # r12: the adc and rerank legs share ONE trained index, ONE
    # corpus encode pass and ONE ADC scoring join (they are
    # bit-identical across legs by construction — previously each leg
    # re-ran the whole chain through its own ivf_pq_topk call). Leg
    # outputs are unchanged: ivf_pq_topk_both returns exactly the
    # two schemas knn_pq / knn_pq_rerank produced.
    e = t(spark, sf, "embeddings")
    queries = _query_sample(e)
    adc_top, rer_top = ivf_pq_topk_both(
        queries, e, "vec_id", "embedding", rerank_r=RERANK_R, **_KW
    )
    bf = brute_force_topk(queries, e, "vec_id", "embedding", k=K_LSH)
    adc = adc_top.select(
        F.lit("adc").alias("leg"), "query_id", "neighbor_id",
        F.col("score_hat").alias("score"), "rn", nul.alias("recall"),
    )
    rer = _with_recall(rer_top, bf).select(
        F.lit("rerank").alias("leg"), "query_id", "neighbor_id",
        F.col("cosine").alias("score"), "rn", "recall",
    )
    idx = knn_pq_index(spark, sf).select(
        F.lit("index").alias("leg"), "query_id", "neighbor_id",
        F.col("cosine").alias("score"), "rn", nul.alias("recall"),
    )
    return adc.unionAll(rer).unionAll(idx)


KNN_PQ_SUITE_SQL = f"""{_pq_cte()}{_SHORT_CTE},
topk AS (
  SELECT query_id, neighbor_id,
         floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rn
  FROM rer
  QUALIFY rn <= {K_LSH}
){_BF_HITS_CTE},
adc AS (
  SELECT query_id, neighbor_id,
         floor(score * 1000000.0 + 0.5) / 1000000.0 AS score_hat,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INT) AS rn
  FROM pscored
  QUALIFY rn <= {K_LSH}
)
SELECT 'adc' AS leg, query_id, neighbor_id, score_hat AS score, rn,
       CAST(NULL AS DOUBLE) AS recall
FROM adc
UNION ALL
SELECT 'rerank' AS leg, t.query_id, t.neighbor_id, t.cosine AS score, t.rn,
       COALESCE(h.n_found, 0) / {K_LSH} AS recall
FROM topk t LEFT JOIN hits h ON h.query_id = t.query_id
UNION ALL
SELECT 'index' AS leg, query_id, neighbor_id, cosine AS score, rn,
       CAST(NULL AS DOUBLE) AS recall
FROM topk
"""


# r5 fold: knn_pq_recall is gone — recall@3 vs brute force is an
# output COLUMN of knn_pq_rerank now (certified inside the parent).
# r6 fold: knn_pq / knn_pq_rerank / knn_pq_index merged into the
# knn_pq_suite composite above (one shared-prefix oracle, one
# certification slot; every leg still executes in full).
QUERIES = {
    "knn_pq_suite": (knn_pq_suite, KNN_PQ_SUITE_SQL),
    "knn_lsh_index": (knn_lsh_index, _lsh_index_sql()),
}
