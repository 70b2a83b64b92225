"""Hybrid BM25 + vector RRF retrieval (operators/search.py::
hybrid_rrf_topk): fusion semantics on a constructed corpus where the
legs deliberately disagree, plus flag/guard behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toy(spark):
    """8-doc corpus, ids 0..7; query = id 0 (stride 1000 cap 1 would
    exclude; use stride 4 cap 8 → queries {0, 4}).

    Text design: every doc shares the stopword 'the' (df 8 → guarded
    out at cap 1/5); doc 1 shares BOTH rare terms with doc 0; doc 2
    shares one. Vector design: doc 3 is nearly parallel to doc 0's
    vector, doc 1 moderately close, others orthogonal-ish."""
    texts = {
        0: "the alpha beta",
        1: "the alpha beta gamma",
        2: "the alpha delta",
        3: "the zeta eta",
        4: "the theta iota",
        5: "the kappa lam",
        6: "the mu nu",
        7: "the xi omicron",
    }
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.8, 0.6, 0.0],
        2: [0.0, 1.0, 0.0],
        3: [0.999, 0.01, 0.0],
        4: [0.0, 0.0, 1.0],
        5: [0.1, 0.0, 1.0],
        6: [0.0, 0.5, 1.0],
        7: [0.0, 1.0, 1.0],
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    return docs, emb


def _run(docs, emb, **kw):
    from queryengine_spark.operators.search import hybrid_rrf_topk

    defaults = dict(
        query_stride=4, query_cap=8, leg_k=4, k=4,
    )
    defaults.update(kw)
    return hybrid_rrf_topk(
        docs, emb, "doc_id", "text", "vec_id", "embedding", **defaults
    )


def test_fusion_prefers_dual_leg_neighbor(toy):
    docs, emb = toy
    rows = {(r.query_id, r.rn): r for r in _run(docs, emb).collect()}
    # query 0: doc 1 is in BOTH legs (shares alpha+beta, cosine 0.8)
    # while doc 3 is vector-only rank 1 and doc 2 lexical-only —
    # RRF must put the dual-leg doc 1 first
    top = rows[(0, 1)]
    assert top.neighbor_id == 1 and top.in_vec == 1 and top.in_lex == 1
    # both single-leg proposals still appear, flagged correctly
    by_n = {r.neighbor_id: r for (q, _), r in rows.items() if q == 0}
    assert by_n[3].in_vec == 1 and by_n[3].in_lex == 0
    assert by_n[2].in_lex == 1


def test_rrf_units_are_exact_integers(toy):
    docs, emb = toy
    for r in _run(docs, emb).collect():
        legs = r.in_vec + r.in_lex
        assert r.rrf_u > 0 and legs >= 1
        # every contribution is RRF_SCALE // (60 + rank), rank ∈ 1..4
        singles = {1_000_000_000 // (60 + rk) for rk in range(1, 5)}
        possible = singles | {a + b for a in singles for b in singles}
        assert r.rrf_u in possible


def test_stopword_guard_drops_universal_term(toy):
    docs, emb = toy
    # with the guard OPEN (cap 1/1), 'the' (df 8/8) floods the
    # lexical leg: every doc becomes a lexical candidate of query 0;
    # the 4/5 default (df 8 > 6.4) confines it to the real
    # term-sharers {1, 2}
    got_guarded = _run(docs, emb).filter(
        (F.col("query_id") == 0) & (F.col("in_lex") == 1)
    )
    assert {r.neighbor_id for r in got_guarded.collect()} == {1, 2}
    got_open = _run(docs, emb, df_cap_num=1, df_cap_den=1).filter(
        (F.col("query_id") == 0) & (F.col("in_lex") == 1)
    )
    # the flood's lexical top-4 = {1, 2} (real sharers) + the
    # id-ascending 'the'-only docs; doc 4's lexical rank-4 RRF units
    # lose to doc 5's vector rank-3, so 3 of the fused top-4 carry
    # the lexical flag
    assert {r.neighbor_id for r in got_open.collect()} == {1, 2, 3}


def test_self_never_retrieved(toy):
    docs, emb = toy
    for r in _run(docs, emb).collect():
        assert r.neighbor_id != r.query_id


def test_no_cartesian_outside_bounded_eval_leg(spark, toy):
    """The lexical leg must be an inverted equi-join; the only
    nested-loop is the documented bounded brute vector leg."""
    docs, emb = toy
    plan = (
        _run(docs, emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the brute eval twin contributes one BNLJ; the 1-row corpus-
    # stats broadcast (the repo's broadcast-of-scalar pattern) is the
    # only other
    assert plan.count("BroadcastNestedLoopJoin") <= 2


# ---------------------------------------------------------------------------
# r11: hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negative_mining_semantics(spark):
    """Hand corpus: anchors exclude presumed positives (cos >= T)
    from the negative set and report the excluded count."""
    import math

    from pyspark.sql import functions as F

    from queryengine_spark.operators.knn import hard_negative_mining

    def unit(theta):
        return [float(math.cos(theta)), float(math.sin(theta))] + [0.0] * 2

    # anchor 0 at angle 0; ids 1-2 nearly parallel (positives),
    # ids 3-5 at widening angles (the hard negatives, in order)
    rows = [
        (0, unit(0.0)),
        (1, unit(0.05)),
        (2, unit(0.10)),
        (3, unit(1.0)),
        (4, unit(1.2)),
        (5, unit(1.4)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hard_negative_mining(
        df.filter(F.col("vec_id") == 0), df, "vec_id", "embedding",
        k=2, pos_threshold=0.9,
    ).collect()
    assert [(r.neighbor_id, r.rn) for r in out] == [(3, 1), (4, 2)]
    assert all(r.n_pos_excluded == 2 for r in out)
    assert all(r.cosine < 0.9 for r in out)
    # no positives above threshold -> n_pos_excluded 0
    out2 = hard_negative_mining(
        df.filter(F.col("vec_id") == 0), df, "vec_id", "embedding",
        k=2, pos_threshold=1.1,
    ).collect()
    assert all(r.n_pos_excluded == 0 for r in out2)
    assert [(r.neighbor_id, r.rn) for r in out2] == [(1, 1), (2, 2)]
