"""FIXTURES.md parameter grid: the engine must match an independent
step-by-step replication of the reference semantics
(/root/reference/src/heurFuzz.py) across topK × cutoff × ref-order
permutations — not just the single committed golden file.

The simulator below re-derives the reference behavior from SURVEY.md's
traced semantics (byte bigrams, set-semantics coverage, lexsort top-K
with the Q1 tie order, cutoff/uint8 rounding, Q2 argmax tie-breaks,
NA fill). Scorer exactness itself is pinned separately against a DP
oracle (test_partial_ratio.py). K > |R| cases are excluded (the
reference's index-0 padding is a documented non-reproduced quirk, Q3).
"""

from __future__ import annotations

import math
import random

import pytest

from queryengine_spark.config import FuzzyConfig
from queryengine_spark.functions.similarity import partial_ratio
from queryengine_spark.operators.fuzzy_join import fuzzy_match


def simulate_reference(queries: list[str], refs: list[str], topk: int, cutoff: int):
    """Pure-Python replication of heurFuzz run() semantics."""

    def bg(b: bytes) -> list[bytes]:
        return [b[i : i + 2] for i in range(len(b) - 1)]

    q_bytes = [q.strip().encode() for q in queries]
    r_bytes = [r.strip().encode() for r in refs]
    out = []
    for qb, q_raw in zip(q_bytes, queries):
        q_bigrams = bg(qb)
        # coverage + lendiff per ref (dense, like the reference)
        rows = []
        for r_id, rb in enumerate(r_bytes):
            rset = set(bg(rb))
            cov = sum(1 for g in q_bigrams if g in rset) / len(q_bigrams)
            rows.append((cov, abs(len(qb) - len(rb)), r_id))
        # np.lexsort asc by (cov, lendiff), stable; last K reversed
        order = sorted(range(len(rows)), key=lambda i: (rows[i][0], rows[i][1]))
        cut = min(topk, len(order))
        cand_ids = list(reversed(order[-cut:]))
        # refine: partial_ratio(lower), strict cutoff→0, uint8 rounding
        scores = []
        for r_id in cand_ids:
            raw = partial_ratio(refs[r_id].strip().lower(), qb.decode().lower())
            scores.append(0 if raw < cutoff else int(math.floor(raw + 0.5)))
        if all(s == 0 for s in scores):
            out.append((qb.decode(), "NA"))
            continue
        mx = max(scores)
        max_pos = [i for i, s in enumerate(scores) if s == mx]
        if len(max_pos) > 1:
            lds = [rows[cand_ids[i]][1] for i in max_pos]
            pick = max_pos[lds.index(min(lds))]
        else:
            pick = max_pos[0]
        out.append((qb.decode(), refs[cand_ids[pick]].strip()))
    return out


QUERIES = [
    "test ",
    "a yellow banana from the store",
    "vanilla",
    "peanutbutter",
    "mus musclus",
    "widget xl",
    "zzqqxx",
]

REFS_BASE = [
    "test1", "test2", "test123", "estt", "testing", "tester",
    "vanilla ", "banana", "yellow banana", "a yellow banana store",
    "mus musculus", "widget", "large widget", "widget x", "qq",
]


@pytest.mark.parametrize("topk", [1, 2, 5, 10])
@pytest.mark.parametrize("cutoff", [0, 50, 90, 101])
def test_grid_matches_simulator(spark, topk, cutoff):
    want = simulate_reference(QUERIES, REFS_BASE, topk, cutoff)
    q_df = spark.createDataFrame(list(enumerate(QUERIES)), ["id", "term"])
    r_df = spark.createDataFrame(list(enumerate(REFS_BASE)), ["id", "term"])
    cfg = FuzzyConfig(top_k=topk, score_cutoff=cutoff, candidate_strategy="cross")
    got_rows = fuzzy_match(q_df, r_df, query_id="id", ref_id="id", config=cfg).collect()
    got = [(r["query"], r["match"]) for r in sorted(got_rows, key=lambda r: r["q_id"])]
    assert got == want, f"topk={topk} cutoff={cutoff}"


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_ref_permutation_consistency(spark, seed):
    """Permuting the reference file reorders r_ids; the engine must
    match the simulator run on the SAME permuted order (tie-breaks are
    order-sensitive by design — SURVEY Q1/Q2)."""
    refs = REFS_BASE[:]
    random.Random(seed).shuffle(refs)
    want = simulate_reference(QUERIES, refs, 5, 60)
    q_df = spark.createDataFrame(list(enumerate(QUERIES)), ["id", "term"])
    r_df = spark.createDataFrame(list(enumerate(refs)), ["id", "term"])
    cfg = FuzzyConfig(top_k=5, score_cutoff=60, candidate_strategy="cross")
    got_rows = fuzzy_match(q_df, r_df, query_id="id", ref_id="id", config=cfg).collect()
    got = [(r["query"], r["match"]) for r in sorted(got_rows, key=lambda r: r["q_id"])]
    assert got == want, f"seed={seed}"