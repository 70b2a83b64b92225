"""Round-4 analytics pack: lexical search (BM25), mergeable
frequency/cardinality sketches (Count-Min, HyperLogLog), link
analysis over the near-dup graph (integer PageRank), and a
column-profiling "dataset card" — each with a full DuckDB oracle.

Cross-engine conventions as everywhere in this package: md5-hex
hashing, floor-scaled BIGINT sums for every float aggregation,
bin()-length instead of log2, explicit integer division, identical
IEEE expression trees on both engines (queries/base.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.operators.freq import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_ALPHA,
    HLL_M,
    HLL_P,
    cms_counters,
    cms_estimate,
    hll_estimate,
    hll_registers,
)
from queryengine_spark.operators.graph import pagerank
from queryengine_spark.operators.search import bm25_topk
from queryengine_spark.queries.base import dec_sum, sql_fsum, t
from queryengine_spark.queries.textstats import _TOKS

_TOKS_LOW = _TOKS.format(c="lower(text)")

#: BM25 contract query: two common terms + the one rare term in the
#: synthetic vocabulary ("dup", df two orders below the rest) so the
#: idf spread is actually exercised
BM25_TERMS = ["vector", "join", "dup"]
BM25_K = 10


def text_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-k retrieval (operators/search.py) with the log-free
    rational idf — engine-portable scoring, micro-unit integer sums."""
    return bm25_topk(
        t(spark, sf, "documents"), "doc_id", "text", BM25_TERMS, k=BM25_K
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{w}'" for w in BM25_TERMS)
    idf = "((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 0.5))"
    tf_part = (
        "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * "
        "(0.25 + 0.75 * CAST(dl AS DOUBLE) * "
        "(CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))))"
    )
    return f"""
WITH d AS (SELECT doc_id, {_TOKS_LOW} AS toks FROM documents),
lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM lens),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
hits AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term),
scored AS (SELECT h.doc_id,
                  CAST(floor({idf} * {tf_part} * 1000000.0 + 0.5) AS BIGINT) AS cu
           FROM hits h JOIN dfs f USING (term) JOIN lens l USING (doc_id)
           CROSS JOIN stats),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
               SUM(cu) AS score_u FROM scored GROUP BY doc_id)
SELECT doc_id, n_hit_terms, score_u / 1000000.0 AS score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


#: CMS contract query: estimate vs exact for the 20 most frequent
#: terms (the sketch guarantee est >= exact is pinned in pytest)
CMS_TOP = 20


def text_cms_freq(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    from queryengine_spark.functions.text import tokenize_ws

    tok = d.select(
        F.explode(tokenize_ws(F.lower(F.col("text")))).alias("term")
    )
    counters = cms_counters(tok, "term")
    est = cms_estimate(counters, tok, "term")
    exact = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact")
    )
    return (
        est.join(exact, "term")
        .orderBy(F.col("exact").desc(), F.col("term").asc())
        .limit(CMS_TOP)
    )


def _cms_sql() -> str:
    rows = ", ".join(f"({r})" for r in range(CMS_DEPTH))
    bucket = (
        "('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || term), 1, 8))::BIGINT"
        f" % {CMS_WIDTH}"
    )
    return f"""
WITH d AS (SELECT doc_id, {_TOKS_LOW} AS toks FROM documents),
tok AS (SELECT unnest(toks) AS term FROM d),
cells AS (SELECT r.r AS row, {bucket} AS bucket
          FROM tok, (VALUES {rows}) r(r)),
cnt AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM cells GROUP BY row, bucket),
probes AS (SELECT DISTINCT term FROM tok),
pb AS (SELECT term, r.r AS row, {bucket} AS bucket
       FROM probes, (VALUES {rows}) r(r)),
est AS (SELECT term, MIN(COALESCE(cnt, 0)) AS est
        FROM pb LEFT JOIN cnt USING (row, bucket) GROUP BY term),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS exact
          FROM tok GROUP BY term)
SELECT term, est, exact FROM est JOIN exact USING (term)
ORDER BY exact DESC, term ASC LIMIT {CMS_TOP}
"""


def text_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language HLL distinct-token estimate beside the exact
    count (the contract emits the RAW estimate + used-register count;
    ln()-based small-range correction is production-side only — ln is
    not IEEE-portable)."""
    d = t(spark, sf, "documents")
    from queryengine_spark.functions.text import tokenize_ws

    tok = d.select(
        "lang", F.explode(tokenize_ws(F.lower(F.col("text")))).alias("term")
    )
    regs = hll_registers(tok, "lang", "term")
    est = hll_estimate(regs)
    exact = tok.groupBy("lang").agg(
        F.count_distinct("term").cast("bigint").alias("exact_distinct")
    )
    return (
        est.join(exact, est.grp == exact.lang)
        .select(
            F.col("grp").alias("lang"),
            "est_raw",
            F.col("used").alias("used_registers"),
            "exact_distinct",
        )
        .orderBy("lang")
    )


def _hll_sql() -> str:
    rem_rho = 60 - HLL_P + 1
    return f"""
WITH d AS (SELECT lang, doc_id, {_TOKS_LOW} AS toks FROM documents),
tok AS (SELECT lang, unnest(toks) AS term FROM d),
h AS (SELECT lang, term,
             ('0x' || substr(md5(term), 1, 15))::BIGINT AS h60 FROM tok),
reg0 AS (SELECT lang, h60 % {HLL_M} AS idx, h60 // {HLL_M} AS rem FROM h),
reg AS (SELECT lang, idx,
               MAX(CASE WHEN rem > 0 THEN {rem_rho} - length(bin(rem))
                        ELSE {rem_rho} END) AS rho
        FROM reg0 GROUP BY lang, idx),
s AS (SELECT lang, SUM(1::BIGINT << (50 - rho)) AS s_used,
             CAST(count(*) AS BIGINT) AS used FROM reg GROUP BY lang),
est AS (SELECT lang,
   CAST(floor(CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({float(HLL_M * HLL_M)!r} AS DOUBLE)
        * CAST({float(1 << 50)!r} AS DOUBLE)
        / CAST(s_used + ({HLL_M} - used) * (1::BIGINT << 50) AS DOUBLE)
        * 1000.0 + 0.5) AS BIGINT) AS est_milli,
   used FROM s),
exact AS (SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS exact_distinct
          FROM tok GROUP BY lang)
SELECT e.lang, e.est_milli / 1000.0 AS est_raw, e.used AS used_registers,
       x.exact_distinct
FROM est e JOIN exact x USING (lang)
ORDER BY lang
"""


#: PageRank over the capped MinHash-LSH candidate graph (the same
#: edge set as dedup_minhash_lsh, oracle CTEs shared)
PR_ITERS = 5


def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Integer PageRank (operators/graph.py) over the near-dup
    candidate graph: rank = boilerplate-hub centrality. Exact BIGINT
    arithmetic; the oracle unrolls the identical recurrence."""
    from queryengine_spark.operators.dedup import minhash_lsh_candidate_pairs
    from queryengine_spark.queries.dedup import (
        BAND_SIZE,
        MINHASH_MAX_BUCKET,
        N_HASHES,
    )

    docs = t(spark, sf, "documents")
    pairs = minhash_lsh_candidate_pairs(
        docs, "doc_id", "text",
        n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
        max_bucket=MINHASH_MAX_BUCKET,
    )
    ranks = pagerank(
        docs.select(F.col("doc_id").alias("id")), pairs, iterations=PR_ITERS
    )
    return ranks.select(F.col("id").alias("doc_id"), "rank")


def _pagerank_sql() -> str:
    from queryengine_spark.queries.dedup import DEDUP_MINHASH_SQL

    body = DEDUP_MINHASH_SQL.strip()
    assert body.startswith("WITH ")
    ctes, final_select = body.rsplit("SELECT DISTINCT", 1)
    prev = "r0"
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(
            f"""r{i} AS (SELECT v.id,
       CAST(150000 + (17 * COALESCE(c.s, 0)) // 20 AS BIGINT) AS rank
  FROM {prev} v LEFT JOIN (
       SELECT t.dst, SUM(r.rank // t.deg) AS s
       FROM topo t JOIN {prev} r ON t.src = r.id GROUP BY t.dst) c
    ON v.id = c.dst)"""
        )
        prev = f"r{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
{ctes.rstrip().rstrip(",")},
pairs AS (SELECT DISTINCT {final_select.strip()}),
verts AS (SELECT doc_id AS id FROM documents),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
topo AS (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src)),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM verts),
{rounds_sql}
SELECT id AS doc_id, rank FROM {prev}
"""


#: dataset-card numeric profile over lineitem's value columns
PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def profile_numeric_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Column-profiling "dataset card" for numeric columns: row/null/
    distinct counts, min/max (raw parquet doubles — no arithmetic, so
    engine-identical) and the order-independent scaled sum. One scan;
    the per-column metrics melt into (col_name, ...) rows."""
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
            dec_sum(c, f"{c}__sm"),
        ]
    one = t(spark, sf, "lineitem").agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").cast("double").alias("min_v"),
            F.col(f"{c}__mx").cast("double").alias("max_v"),
            F.col(f"{c}__sm").alias("sum_v"),
        )
        for c in PROFILE_COLS
    ]
    return one.select(F.explode(F.array(*rows)).alias("m")).select("m.*")


def _profile_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS DOUBLE) AS min_v,
       CAST(MAX({c}) AS DOUBLE) AS max_v,
       {sql_fsum(c)} AS sum_v
FROM lineitem"""
        for c in PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


def fuzzy_edit_join(spark: SparkSession, sf: str) -> DataFrame:
    """SymSpell deletion-neighborhood edit-distance join
    (operators/editdist.py), BOTH supported radii in one tagged
    relation (r5 upgrade — the d>=2 guard the r4 verdict noted is
    now a real d=2 path):

    - leg d1: every 20th part name with ONE deterministically-chosen
      character deleted, matched to the full clean name vocabulary at
      Levenshtein <= 1 (unchanged from r4);
    - leg d2: every 40th part's FIRST WORD with TWO deterministic
      deletions, matched to the first-word vocabulary at
      Levenshtein <= 2 through the C(L,2) two-deletion neighborhood
      (bounded fan-out by construction: single color words, L ~ 10).

    Candidates come from equi-joins on deletion variants in both
    legs — never a cross join."""
    from queryengine_spark.operators.editdist import edit_distance_join

    p = t(spark, sf, "part")
    q = p.filter(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("id"),
        F.expr(
            "concat(substring(p_name, 1, "
            "pmod(p_partkey div 20, length(p_name))), "
            "substring(p_name, pmod(p_partkey div 20, length(p_name)) + 2, "
            "length(p_name)))"
        ).alias("term"),
    )
    r = p.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("term"))
    d1 = edit_distance_join(q, r, "id", "term", "id", "term", max_dist=1)

    w = F.expr("substring_index(p_name, ' ', 1)")
    q2 = (
        p.filter(F.col("p_partkey") % 40 == 0)
        .select(F.col("p_partkey").alias("id"), w.alias("w"))
        .filter(F.length("w") >= 2)
        .withColumn("a", F.expr("pmod(id div 40, length(w)) + 1"))
        .withColumn(
            "t1",
            F.expr("concat(substring(w, 1, a - 1), substring(w, a + 1, length(w)))"),
        )
        .withColumn("b", F.expr("pmod(id div 7, length(t1)) + 1"))
        .withColumn(
            "term",
            F.expr("concat(substring(t1, 1, b - 1), substring(t1, b + 1, length(t1)))"),
        )
        .select("id", "term")
    )
    r2 = p.select(F.col("p_partkey").alias("id"), w.alias("term"))
    d2 = edit_distance_join(q2, r2, "id", "term", "id", "term", max_dist=2)
    return d1.withColumn("leg", F.lit("d1")).unionByName(
        d2.withColumn("leg", F.lit("d2"))
    )


def _edit_join_sql() -> str:
    dels = (
        "list_transform(range(1, length(term) + 1), i -> "
        "substr(term, 1, CAST(i AS INT) - 1) || "
        "substr(term, CAST(i AS INT) + 1, length(term)))"
    )
    dels2 = (
        "flatten(list_transform(range(1, length(term)), i -> "
        "list_transform(range(CAST(i AS INT) + 1, length(term) + 1), j -> "
        "substr(term, 1, CAST(i AS INT) - 1) || "
        "substr(term, CAST(i AS INT) + 1, CAST(j AS INT) - CAST(i AS INT) - 1) || "
        "substr(term, CAST(j AS INT) + 1, length(term)))))"
    )
    v2 = f"list_distinct(list_concat(list_append({dels}, term), {dels2}))"
    return f"""
WITH q AS (SELECT p_partkey AS id,
       substr(p_name, 1, (p_partkey // 20) % length(p_name))
       || substr(p_name, (p_partkey // 20) % length(p_name) + 2,
                 length(p_name)) AS term
       FROM part WHERE p_partkey % 20 = 0),
r AS (SELECT p_partkey AS id, p_name AS term FROM part),
qv AS (SELECT DISTINCT id AS q_id, term AS q_term, v
       FROM (SELECT id, term, unnest(list_append({dels}, term)) AS v FROM q)),
rv AS (SELECT DISTINCT id AS r_id, term AS r_term, v
       FROM (SELECT id, term, unnest(list_append({dels}, term)) AS v FROM r)),
cand AS (SELECT DISTINCT q_id, q_term, r_id, r_term
         FROM qv JOIN rv USING (v)),
w2 AS (SELECT p_partkey AS id, string_split(p_name, ' ')[1] AS w
       FROM part WHERE p_partkey % 40 = 0 AND length(string_split(p_name, ' ')[1]) >= 2),
a2 AS (SELECT id, w, (id // 40) % length(w) + 1 AS a FROM w2),
t2 AS (SELECT id, substr(w, 1, CAST(a AS INT) - 1)
               || substr(w, CAST(a AS INT) + 1, length(w)) AS t1 FROM a2),
b2 AS (SELECT id, t1, (id // 7) % length(t1) + 1 AS b FROM t2),
qq2 AS (SELECT id, substr(t1, 1, CAST(b AS INT) - 1)
               || substr(t1, CAST(b AS INT) + 1, length(t1)) AS term FROM b2),
r2 AS (SELECT p_partkey AS id, string_split(p_name, ' ')[1] AS term FROM part),
qv2 AS (SELECT DISTINCT id AS q_id, term AS q_term, v
        FROM (SELECT id, term, unnest({v2}) AS v FROM qq2)),
rv2 AS (SELECT DISTINCT id AS r_id, term AS r_term, v
        FROM (SELECT id, term, unnest({v2}) AS v FROM r2)),
cand2 AS (SELECT DISTINCT q_id, q_term, r_id, r_term
          FROM qv2 JOIN rv2 USING (v))
SELECT q_id, r_id, CAST(levenshtein(q_term, r_term) AS INT) AS dist, 'd1' AS leg
FROM cand WHERE levenshtein(q_term, r_term) <= 1
UNION ALL
SELECT q_id, r_id, CAST(levenshtein(q_term, r_term) AS INT) AS dist, 'd2' AS leg
FROM cand2 WHERE levenshtein(q_term, r_term) <= 2
"""


def source_partition_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """Hive-partitioned staging + partition-pruned read-back: orders
    written partitionBy(o_orderpriority), read with a partition
    predicate — the scan must touch ONE directory (PartitionFilters
    in the plan, gated in test_plans). The 100 TB pattern: layout
    choices turn predicates into skipped input, not filtered rows."""
    import os

    o = t(spark, sf, "orders")
    stage = f"/tmp/qe-stage-ppart-{os.path.basename(os.path.normpath(sf))}"
    o.select("o_orderkey", "o_totalprice", "o_orderpriority").write.partitionBy(
        "o_orderpriority"
    ).mode("overwrite").parquet(stage)
    back = spark.read.parquet(stage).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").cast("string").alias("o_orderpriority")
    )


SOURCE_PARTITION_PRUNED_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.py::triangle_counts,
    degree-oriented wedge join — each triangle produced exactly once,
    wedge volume bounded O(m^1.5)) over the same capped MinHash-LSH
    candidate graph as graph_pagerank: triangle-dense nodes sit
    inside template/boilerplate clusters."""
    from queryengine_spark.operators.dedup import minhash_lsh_candidate_pairs
    from queryengine_spark.operators.graph import triangle_counts
    from queryengine_spark.queries.dedup import (
        BAND_SIZE,
        MINHASH_MAX_BUCKET,
        N_HASHES,
    )

    docs = t(spark, sf, "documents")
    pairs = minhash_lsh_candidate_pairs(
        docs, "doc_id", "text",
        n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
        max_bucket=MINHASH_MAX_BUCKET,
    )
    return triangle_counts(pairs).select(F.col("id").alias("doc_id"), "n_tri")


def _triangles_sql() -> str:
    """Reuses the MinHash pair CTEs (same edge set as the PageRank
    oracle), then mirrors the degree-oriented wedge join."""
    from queryengine_spark.queries.dedup import DEDUP_MINHASH_SQL

    body = DEDUP_MINHASH_SQL.strip()
    assert body.startswith("WITH ")
    ctes, final_select = body.rsplit("SELECT DISTINCT", 1)
    return f"""
{ctes.rstrip().rstrip(",")},
pairs AS (SELECT DISTINCT {final_select.strip()}),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
o AS (SELECT s.src, s.dst FROM sym s
      JOIN deg d1 ON d1.id = s.src JOIN deg d2 ON d2.id = s.dst
      WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND s.src < s.dst)),
wedge AS (SELECT o1.src AS x, o1.dst AS b, o2.dst AS c
          FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst <> o2.dst
          JOIN deg db ON db.id = o1.dst JOIN deg dc ON dc.id = o2.dst
          WHERE db.deg < dc.deg OR (db.deg = dc.deg AND o1.dst < o2.dst)),
tri AS (SELECT w.x, w.b, w.c FROM wedge w
        JOIN o ON o.src = w.b AND o.dst = w.c),
nodes AS (SELECT x AS id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tri
FROM nodes GROUP BY id
"""


#: PMI collocations: minimum bigram support, top-K, weight scale
PMI_MIN_COUNT = 5
PMI_TOP = 50
PMI_SCALE = 1_000_000


def text_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """PMI-ranked bigram collocations — the classic phrase-mining
    signal (Church & Hanks 1990). The rank statistic is the exact
    integer ``(N_bigrams · c_xy · scale) div (c_x · c_y)`` — PMI is
    its log, a monotone transform, so the ranking is identical while
    every comparison stays BIGINT-exact cross-engine (the unigram
    normalization differs from textbook PMI by a constant factor,
    which cancels in ranking; overflow bound: N·c_xy·scale < 2^63,
    re-scale per corpus). Two groupBy passes over the shared token
    stream, two equi-joins of the bigram counts to the unigram
    counts, one broadcast scalar total, TakeOrderedAndProject."""
    from queryengine_spark.operators.curation import (
        _token_relation,
        token_ngrams,
    )

    d = t(spark, sf, "documents")
    base = _token_relation(d, "doc_id", "text")
    uni = base.select(F.explode("toks").alias("tok"))
    big = base.select(F.explode(token_ngrams(F.col("toks"), 2)).alias("bigram"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bc = (
        big.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    tot = big.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    scored = (
        bc.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "score",
            F.expr(f"(n_total * c_xy * {PMI_SCALE}) div (c1 * c2)").cast("bigint"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(
        F.col("score").desc(), F.col("bigram").asc()
    ).limit(PMI_TOP)
    w = Window.orderBy(F.col("score").desc(), F.col("bigram").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "bigram",
        "c_xy",
        "score",
    )


PMI_SQL = f"""
WITH d AS (SELECT doc_id AS id, {_TOKS_LOW} AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM d),
bi AS (SELECT toks[CAST(t.i AS INT)] || ' ' || toks[CAST(t.i AS INT) + 1] AS bigram
       FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy FROM bi
       GROUP BY bigram HAVING count(*) >= {PMI_MIN_COUNT}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM bi),
s AS (SELECT b.bigram, b.c_xy,
             (t.n_total * b.c_xy * {PMI_SCALE}) // (u1.c * u2.c) AS score
      FROM bc b
      CROSS JOIN tot t
      JOIN uc u1 ON u1.tok = split_part(b.bigram, ' ', 1)
      JOIN uc u2 ON u2.tok = split_part(b.bigram, ' ', 2))
SELECT CAST(row_number() OVER (ORDER BY score DESC, bigram ASC) AS INT) AS rank,
       bigram, c_xy, CAST(score AS BIGINT) AS score
FROM s
QUALIFY rank <= {PMI_TOP}
"""


def profile_lang_token_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language first/second moments of document length in exact
    integer arithmetic: variance numerator n·Σx² − (Σx)² (the
    textbook one-pass identity) stays BIGINT so partial-aggregation
    order can never flip a bit; mean is the single final int/int
    division. (Overflow headroom: n·Σx² < 2^63 up to ~10^9 docs of
    10^4 chars per group — past that, rescale x.) One map-side
    partial-agg scan."""
    d = t(spark, sf, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sum_sq"),
    )
    return agg.select(
        "lang",
        "n",
        "sum_chars",
        (F.col("n") * F.col("sum_sq") - F.col("sum_chars") * F.col("sum_chars"))
        .cast("bigint")
        .alias("var_num"),
        (F.col("sum_chars") / F.col("n")).alias("mean_chars"),
    )


LANG_MOMENTS_SQL = """
WITH a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                  CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq
           FROM documents GROUP BY lang)
SELECT lang, n, sum_chars,
       CAST(n * sum_sq - sum_chars * sum_chars AS BIGINT) AS var_num,
       sum_chars / n AS mean_chars
FROM a
"""



# ---------------------------------------------------------------------------
# Per-source distribution drift (total-variation distance) — r7
# ---------------------------------------------------------------------------

#: document-length histogram bins: bin = min(31, n_chars // DRIFT_BIN_W)
DRIFT_BIN_W = 32
DRIFT_BIN_CAP = 31


def profile_source_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Data-QA drift monitor: per source, the TOTAL-VARIATION distance
    between its document-length histogram and the corpus-wide
    reference — "which ingest source no longer looks like the
    corpus", the check a pipeline owner runs before a source poisons
    a training mix. TVD instead of the usual PSI because PSI's ln()
    is libm-dependent and therefore NOT engine-portable (the same
    reason the dedup family avoids ln in certified columns); TVD is
    pure rational arithmetic: TVD = Σ|c_b·N − C_b·n| / (2·n·N) stays
    BIGINT until one final exactly-rounded division.

    Absent bins matter (a source missing a hot bin IS drift), so the
    per-source bin lattice is completed by crossing the per-source
    totals with the observed-bin reference — both are AGGREGATED
    relations bounded by |sources| × 32 bins, so the cross join is
    broadcast-trivial at any corpus size. One (source, bin)
    partial-agg shuffle reads the data; everything after runs on
    aggregate-sized relations.

    Overflow discipline (r8): the deviation products c_b·N − C_b·n
    reach N² ≈ 10^20 at a 10^10-doc corpus — past 2^63 — so they are
    accumulated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), good to
    10^38. Only the final ratio (a double division on identically
    shaped expression trees) leaves the exact domain, so no BIGINT
    column in the OUTPUT can overflow at any corpus size."""
    d = t(spark, sf, "documents")
    bin_col = F.least(
        F.lit(DRIFT_BIN_CAP), F.expr(f"n_chars div {DRIFT_BIN_W}")
    ).cast("bigint")
    counts = (
        d.select(F.col("source"), bin_col.alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ref = counts.groupBy("bin").agg(F.sum("c").cast("bigint").alias("cb"))
    per_src = counts.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    total = per_src.agg(F.sum("n").cast("bigint").alias("nn"))
    lattice = per_src.crossJoin(F.broadcast(ref)).crossJoin(F.broadcast(total))
    dec = "decimal(38,0)"
    dev = (
        lattice.join(counts, ["source", "bin"], "left")
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)))
        .groupBy("source", "n", "nn")
        .agg(
            F.sum(
                F.abs(
                    F.col("c0").cast(dec) * F.col("nn").cast(dec)
                    - F.col("cb").cast(dec) * F.col("n").cast(dec)
                )
            )
            .cast(dec)
            .alias("dev_num"),
            F.sum((F.col("c0") > 0).cast("int")).cast("bigint").alias("n_bins"),
        )
    )
    from queryengine_spark.queries.base import fround

    tvd = F.col("dev_num").cast("double") / (2.0 * F.col("n") * F.col("nn"))
    return dev.select(
        "source",
        F.col("n").alias("n_docs"),
        "n_bins",
        fround(tvd, 6).alias("tvd"),
    )


PROFILE_SOURCE_DRIFT_SQL = f"""
WITH b AS (SELECT source,
                  LEAST({DRIFT_BIN_CAP}, n_chars // {DRIFT_BIN_W}) AS bin
           FROM documents),
counts AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY source, bin),
ref AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS cb FROM counts GROUP BY bin),
per_src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM per_src),
lattice AS (SELECT p.source, p.n, r.bin, r.cb, t.nn FROM per_src p, ref r, total t),
dev AS (SELECT l.source, l.n, l.nn,
               CAST(SUM(abs(CAST(COALESCE(c.c, 0) AS HUGEINT) * CAST(l.nn AS HUGEINT)
                            - CAST(l.cb AS HUGEINT) * CAST(l.n AS HUGEINT))) AS HUGEINT) AS dev_num,
               CAST(SUM(CASE WHEN COALESCE(c.c, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins
        FROM lattice l LEFT JOIN counts c
          ON c.source = l.source AND c.bin = l.bin
        GROUP BY l.source, l.n, l.nn)
SELECT source, n AS n_docs, n_bins,
       floor(CAST(dev_num AS DOUBLE) / (2.0 * n * nn) * 1000000.0 + 0.5) / 1000000.0 AS tvd
FROM dev
"""


# ---------------------------------------------------------------------------
# Parquet footer profiling — metadata-only query answering (r7)
# ---------------------------------------------------------------------------


def source_footer_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Answer COUNT / null-count / MIN / MAX questions for every
    profiled numeric column of every table FROM PARQUET FOOTERS ONLY
    (sources/footers.py — pyarrow metadata fanned over executors, no
    data page is ever read), while the oracle answers the same
    questions from the data with plain aggregates. The driver hash
    therefore certifies that row-group statistics are faithful to
    the rows they summarize — the property stats-based row-group
    SKIPPING (the scan planner's pruning input) relies on."""
    from queryengine_spark.sources.footers import parquet_footer_profile

    return parquet_footer_profile(spark, sf)


def _footer_profile_sql() -> str:
    from queryengine_spark.sources.footers import footer_profile_oracle_sql

    return footer_profile_oracle_sql()


SOURCE_FOOTER_PROFILE_SQL = _footer_profile_sql()

QUERIES = {
    "text_bm25_search": (text_bm25_search, _bm25_sql()),
    "graph_triangles": (graph_triangles, _triangles_sql()),
    "text_collocations_pmi": (text_collocations_pmi, PMI_SQL),
    "profile_lang_token_moments": (profile_lang_token_moments, LANG_MOMENTS_SQL),
    "text_cms_freq": (text_cms_freq, _cms_sql()),
    "text_hll_distinct": (text_hll_distinct, _hll_sql()),
    "graph_pagerank": (graph_pagerank, _pagerank_sql()),
    "profile_numeric_summary": (profile_numeric_summary, _profile_sql()),
    "fuzzy_edit_join": (fuzzy_edit_join, _edit_join_sql()),
    "source_partition_pruned": (source_partition_pruned, SOURCE_PARTITION_PRUNED_SQL),
    "source_footer_profile": (source_footer_profile, SOURCE_FOOTER_PROFILE_SQL),
    "profile_source_drift": (profile_source_drift, PROFILE_SOURCE_DRIFT_SQL),
}
