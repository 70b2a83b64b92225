"""Engine-independent oracles for the round-4 analytics pack:
BM25 against a quadratic pure-Python scorer, CMS against its
overestimate guarantee, HLL against its error bound on a planted
high-cardinality stream, PageRank against a hand-rolled integer
power iteration on a known graph."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from queryengine_spark.operators.freq import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_counters,
    cms_estimate,
    hll_estimate,
    hll_registers,
)
from queryengine_spark.operators.graph import pagerank
from queryengine_spark.operators.search import bm25_topk

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "a mat for the dog"),
    (4, "cats and dogs and cats"),
    (5, "the the the the the the"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query_terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {
        t: sum(1 for v in toks.values() if t in v) for t in query_terms
    }
    scores = {}
    for i, v in toks.items():
        s = 0
        hit = 0
        for t in query_terms:
            tf = v.count(t)
            if not tf or not dfs[t]:
                continue
            hit += 1
            idf = (n + 1.0) / (dfs[t] + 0.5)
            tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += math.floor(idf * tf_part * 1e6 + 0.5)
        if hit:
            scores[i] = (hit, s / 1e6)
    return scores


def test_bm25_matches_reference(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["score"])
        for r in bm25_topk(docs_df, "doc_id", "text", ["cat", "mat", "dog"], k=10).collect()
    }
    want = _py_bm25(["cat", "mat", "dog"])
    assert got == want


def test_bm25_rare_term_dominates(spark, docs_df):
    # "sat" appears once in doc 1 only; its idf outranks a common term
    top = bm25_topk(docs_df, "doc_id", "text", ["sat", "the"], k=1).collect()
    assert top[0]["doc_id"] == 1


def test_bm25_topk_order_and_limit(spark, docs_df):
    rows = bm25_topk(docs_df, "doc_id", "text", ["the"], k=3).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cms_overestimates_never_under(spark, docs_df):
    from queryengine_spark.functions.text import tokenize_ws

    tok = docs_df.select(F.explode(tokenize_ws(F.lower("text"))).alias("term"))
    counters = cms_counters(tok, "term")
    # sketch is bounded regardless of stream size
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH
    est = {r["term"]: r["est"] for r in cms_estimate(counters, tok, "term").collect()}
    exact = {
        r["term"]: r["cnt"]
        for r in tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)
        # d*w = 4096 cells >> 13 distinct terms: no collisions, exact
        assert est[t] == c, (t, est[t], c)


def test_cms_unseen_term_bounded(spark, docs_df):
    from queryengine_spark.functions.text import tokenize_ws

    tok = docs_df.select(F.explode(tokenize_ws(F.lower("text"))).alias("term"))
    counters = cms_counters(tok, "term")
    probes = spark.createDataFrame([("zebra",)], "term string")
    est = cms_estimate(counters, probes, "term").collect()
    assert est[0]["est"] <= 2  # epsilon*N bound; tiny stream -> ~0


def test_hll_within_error_bound(spark):
    # 20_000 planted distinct values; p=12 -> rse 1.625%; allow 5 sigma
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("tok-"), F.col("id")).alias("term")
    )
    regs = hll_registers(df, "g", "term")
    assert regs.count() <= HLL_M
    est = hll_estimate(regs).collect()[0]
    rse = 1.04 / math.sqrt(HLL_M)
    assert abs(est["est_raw"] - n) <= 5 * rse * n, est["est_raw"]


def test_hll_merge_idempotent(spark):
    # the register table folded over a doubled stream equals the
    # original (max is idempotent) -> mergeable sketch state
    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.concat(F.lit("t"), F.col("id")).alias("term")
    )
    doubled = df.union(df)
    a = {(r["idx"],): r["rho"] for r in hll_registers(df, "g", "term").collect()}
    b = {(r["idx"],): r["rho"] for r in hll_registers(doubled, "g", "term").collect()}
    assert a == b


def _py_pagerank(vertices, edges, iterations=5):
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    r = {v: 1_000_000 for v in vertices}
    for _ in range(iterations):
        s = {v: 0 for v in vertices}
        for a, b in sym:
            s[b] += r[a] // deg[a]
        r = {v: 150_000 + (17 * s[v]) // 20 for v in vertices}
    return r


def test_pagerank_matches_reference_and_ranks_hub(spark):
    verts = [1, 2, 3, 4, 5, 6]
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6)]
    vdf = spark.createDataFrame([(v,) for v in verts], "id long")
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(vdf, edf).collect()}
    want = _py_pagerank(verts, edges)
    assert got == want
    # the degree-3 hub outranks everything; the detached 2-cycle is a
    # closed system (150k teleport + 17/20 of the partner's 1M keeps
    # it at exactly 1M), while the hub's periphery bleeds rank to it
    assert got[1] == max(got.values())
    assert got[5] == got[6] == 1_000_000
    assert got[2] < 1_000_000 and got[4] < got[2]


def test_pagerank_isolated_vertex_teleport_floor(spark):
    vdf = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edf = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(vdf, edf, iterations=3).collect()}
    # vertex 3 has no edges: settles at the teleport floor
    assert got[3] == 150_000
    assert got[1] == got[2] > got[3]


def test_edit_distance_join_complete_vs_bruteforce(spark):
    from queryengine_spark.operators.editdist import edit_distance_join

    qs = [(1, "kitten"), (2, "hello"), (3, "abc"), (4, "zzzz")]
    rs = [
        (10, "kitten"),   # equal -> 0
        (11, "mitten"),   # substitution -> 1
        (12, "kittens"),  # insertion -> 1
        (13, "itten"),    # deletion -> 1
        (14, "hallo"),    # substitution -> 1
        (15, "help"),     # distance 2 -> excluded
        (16, "ab"),       # deletion -> 1
        (17, "abcd"),     # insertion -> 1
        (18, "xyz"),      # distance 3 -> excluded
    ]
    qdf = spark.createDataFrame(qs, "id long, term string")
    rdf = spark.createDataFrame(rs, "id long, term string")
    got = {
        (r["q_id"], r["r_id"]): r["dist"]
        for r in edit_distance_join(qdf, rdf, "id", "term", "id", "term").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (qi, ri): lev(qt, rt)
        for qi, qt in qs
        for ri, rt in rs
        if lev(qt, rt) <= 1
    }
    assert got == want  # complete AND exact — blocking lost nothing


def test_edit_distance_join_d2_complete_vs_bruteforce(spark):
    """r5: the 2-deletion neighborhood must be COMPLETE for d=2 —
    random short vocabularies, every pair class 0/1/2 present, exact
    equality with brute-force levenshtein."""
    import random

    from queryengine_spark.operators.editdist import edit_distance_join

    rng = random.Random(42)
    alphabet = "abc"
    qs = [(i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6))))
          for i in range(1, 25)]
    rs = [(100 + i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6))))
          for i in range(1, 25)]
    qdf = spark.createDataFrame(qs, "id long, term string")
    rdf = spark.createDataFrame(rs, "id long, term string")
    got = {
        (r["q_id"], r["r_id"]): r["dist"]
        for r in edit_distance_join(
            qdf, rdf, "id", "term", "id", "term", max_dist=2
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (qi, ri): lev(qt, rt)
        for qi, qt in qs
        for ri, rt in rs
        if lev(qt, rt) <= 2
    }
    assert got == want and any(d == 2 for d in want.values())


def test_edit_distance_join_rejects_d3(spark):
    from queryengine_spark.operators.editdist import edit_distance_join

    df = spark.createDataFrame([(1, "a")], "id long, term string")
    with pytest.raises(NotImplementedError):
        edit_distance_join(df, df, "id", "term", "id", "term", max_dist=3)


def test_source_drift_tvd_matches_independent(spark, sf_dir):
    """r7: per-source TVD vs an independent pure-Python histogram
    replay (counts from the raw table, absent bins included)."""
    from collections import Counter, defaultdict

    from queryengine_spark.queries.analytics import (
        DRIFT_BIN_CAP,
        DRIFT_BIN_W,
        profile_source_drift,
    )
    from queryengine_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    per = defaultdict(Counter)
    for r in rows:
        per[r["source"]][min(DRIFT_BIN_CAP, r["n_chars"] // DRIFT_BIN_W)] += 1
    ref = Counter()
    for c in per.values():
        ref.update(c)
    nn = sum(ref.values())
    got = {
        r["source"]: (r["n_docs"], r["n_bins"], r["tvd"])
        for r in profile_source_drift(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        # r8: dev accumulates in unbounded Python int — the exact
        # twin of the DECIMAL(38,0)/HUGEINT widening (the dev_num
        # output column was dropped as BIGINT-overflowable at scale)
        dev = sum(abs(cnt.get(b, 0) * nn - cb * n) for b, cb in ref.items())
        tvd = int(dev / (2.0 * n * nn) * 1e6 + 0.5) / 1e6
        assert got[src] == (n, len(cnt), tvd), src
        assert 0.0 <= got[src][2] <= 1.0
