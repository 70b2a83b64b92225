"""Engine-independent oracles for the round-4 ML pack: distributed
Lloyd k-means, MMR diversification, per-node triangle counting, and
DSIR importance weights — each pinned against an independent
driver-side reference implementation (plain Python/numpy, no shared
code paths with the operators under test)."""

from __future__ import annotations

import hashlib
import itertools
import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from queryengine_spark.operators.clustering import (
    kmeans_assign_cells,
    kmeans_fit_distributed,
)
from queryengine_spark.operators.graph import triangle_counts
from queryengine_spark.operators.importance import dsir_importance
from queryengine_spark.operators.knn import kmeans_centroids_int
from queryengine_spark.operators.mmr import mmr_topk


def _vec_df(spark, n, dim, seed):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "id bigint, v array<double>")


class TestDistributedKmeans:
    def test_matches_sample_trainer_on_full_overlap(self, spark):
        """When the bounded-sample trainer's sample IS the full set,
        distributed Lloyd must produce identical centroids — the two
        implementations share only the assignment UDF, so this pins
        the distributed sum/update path against the numpy one."""
        rows, df = _vec_df(spark, 120, 8, seed=7)
        want = kmeans_centroids_int(
            [(i, v) for i, v in sorted(rows)], n_cells=5, iters=3
        )
        got = kmeans_fit_distributed(df, "id", "v", k=5, iters=3, dim=8)
        assert got == want

    def test_assignment_matches_reference(self, spark):
        rows, df = _vec_df(spark, 80, 6, seed=11)
        cents = kmeans_fit_distributed(df, "id", "v", k=4, iters=2, dim=6)
        got = {
            r["id"]: r["cell"]
            for r in kmeans_assign_cells(df, "id", "v", cents, 6).collect()
        }
        C = np.asarray(cents, dtype=np.int64)
        for i, v in rows:
            x = np.floor(np.asarray(v) * 10000.0).astype(np.int64)
            d2 = ((x - C) ** 2).sum(axis=1)
            assert got[i] == int(np.argmin(d2)), f"vec {i}"

    def test_wrong_dim_rows_dropped(self, spark):
        rows, df = _vec_df(spark, 30, 4, seed=3)
        bad = spark.createDataFrame(
            [(1000, [0.1, 0.2])], "id bigint, v array<double>"
        )
        cents = kmeans_fit_distributed(df.union(bad), "id", "v", 3, 2, 4)
        out = kmeans_assign_cells(df.union(bad), "id", "v", cents, 4)
        assert out.filter(F.col("id") == 1000).count() == 0
        assert out.count() == 30


def _greedy_mmr_ref(rel, sim, k, lam_num, lam_den):
    """Independent greedy MMR: rel = {nid: rel}, sim = {(a,b): sim}."""
    selected = []
    out = []
    cands = dict(rel)
    # step 1: pure relevance
    first = max(cands, key=lambda n: (cands[n], -n))
    selected.append(first)
    out.append((first, 1, rel[first]))
    del cands[first]
    for step in range(2, k + 1):
        best, best_score = None, None
        for n in sorted(cands):
            red = max(sim[(n, s)] for s in selected)
            score = (lam_num * rel[n] - (lam_den - lam_num) * red) / lam_den
            if best_score is None or score > best_score:
                best, best_score = n, score
        selected.append(best)
        out.append((best, step, best_score))
        del cands[best]
    return out


class TestMMR:
    def test_against_driver_greedy(self, spark):
        rows, df = _vec_df(spark, 60, 8, seed=23)
        queries = df.filter(F.col("id") % 20 == 0)
        got = mmr_topk(queries, df, "id", "v", k=3, shortlist_m=8).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["step"], r["mmr"])
            )

        def cos(a, b):
            dot = na = nb = 0.0
            for x, y in zip(a, b):
                dot += x * y
                na += x * x
                nb += y * y
            return dot / (math.sqrt(na) * math.sqrt(nb))

        vecs = dict(rows)
        for qid in [i for i, _ in rows if i % 20 == 0]:
            rel_all = {
                i: cos(vecs[qid], v) for i, v in rows if i != qid
            }
            short = sorted(rel_all, key=lambda n: (-rel_all[n], n))[:8]
            rel = {n: rel_all[n] for n in short}
            sim = {
                (a, b): cos(vecs[a], vecs[b])
                for a, b in itertools.permutations(short, 2)
            }
            want = _greedy_mmr_ref(rel, sim, 3, 7, 10)
            got_q = sorted(by_q[qid], key=lambda t: t[1])
            assert [n for n, _s, _m in got_q] == [n for n, _s, _m in want], qid
            for (_, _, gm), (_, _, wm) in zip(got_q, want):
                assert abs(gm - wm) < 1e-6, qid

    def test_diversification_changes_selection(self, spark):
        """A pair of near-identical top candidates: plain top-2 takes
        both; MMR must skip the duplicate at step 2."""
        base = [1.0, 0.0, 0.0, 0.0]
        dup = [0.999, 0.032, 0.0, 0.0]  # near-copy of base
        other = [0.6, 0.72, 0.0, 0.0]  # less relevant, diverse
        q = [0.9, 0.3, 0.0, 0.0]
        df = spark.createDataFrame(
            [(0, q), (1, base), (2, dup), (3, other), (4, [0.0, 0.0, 1.0, 0.0])],
            "id bigint, v array<double>",
        )
        out = mmr_topk(
            df.filter(F.col("id") == 0), df, "id", "v",
            k=2, shortlist_m=4, lam_num=5, lam_den=10,
        ).collect()
        steps = {r["step"]: r["neighbor_id"] for r in out}
        assert steps[1] in (1, 2)  # most relevant (base or its dup)
        assert steps[2] == 3  # diversity pick, not the near-copy


class TestTriangles:
    def _brute(self, edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        counts = {}
        nodes = sorted(adj)
        for u, v, w in itertools.combinations(nodes, 3):
            if v in adj[u] and w in adj[u] and w in adj[v]:
                for n in (u, v, w):
                    counts[n] = counts.get(n, 0) + 1
        return counts

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_graph_vs_brute(self, spark, seed):
        rng = random.Random(seed)
        nodes = list(range(30))
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(90)
            }
        )
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {r["id"]: r["n_tri"] for r in triangle_counts(df).collect()}
        assert got == self._brute(edges)

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        """The operator symmetrizes + distincts: multi-edges and
        direction must not double-count triangles."""
        edges = [(1, 2), (2, 1), (2, 3), (1, 3), (1, 3)]
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {r["id"]: r["n_tri"] for r in triangle_counts(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_triangle_free_graph_empty(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a bigint, id_b bigint"
        )
        assert triangle_counts(df).count() == 0


class TestDSIR:
    def test_weights_match_reference(self, spark):
        docs = [
            (1, "spark spark query engine", 1),
            (2, "spark query", 1),
            (3, "cat dog cat dog", 0),
            (4, "dog spark cat", 0),
            (5, "query engine spark spark", 0),
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string, tgt int")
        out = {
            r["id"]: (r["n_feats"], r["margin"])
            for r in dsir_importance(
                df, "doc_id", "text", F.col("tgt") == 1,
                n_buckets=64, scale=1000,
            ).collect()
        }

        def feats(text):
            toks = text.lower().split()
            grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            return toks + grams

        def bucket(f):
            return int(hashlib.md5(f.encode()).hexdigest()[:4], 16) % 64

        t_counts: dict[int, int] = {}
        r_counts: dict[int, int] = {}
        for did, text, tgt in docs:
            for f in feats(text):
                b = bucket(f)
                r_counts[b] = r_counts.get(b, 0) + 1
                if tgt:
                    t_counts[b] = t_counts.get(b, 0) + 1
        for did, text, _tgt in docs:
            fs = feats(text)
            margin = sum(
                ((t_counts.get(bucket(f), 0) + 1) * 1000)
                // (r_counts[bucket(f)] + 1)
                for f in fs
            )
            assert out[did] == (len(fs), margin), f"doc {did}"

    def test_target_like_docs_rank_higher(self, spark):
        """Documents sharing the target's vocabulary must outscore
        disjoint-vocabulary documents."""
        docs = (
            [(i, "alpha beta gamma delta", 1) for i in range(10)]
            + [(100, "alpha beta gamma delta", 0)]
            + [(101, "zork quux blarg fnord", 0)]
        )
        df = spark.createDataFrame(docs, "doc_id bigint, text string, tgt int")
        scores = {
            r["id"]: r["score"]
            for r in dsir_importance(
                df, "doc_id", "text", F.col("tgt") == 1, n_buckets=256
            ).collect()
        }
        assert scores[100] > scores[101]
