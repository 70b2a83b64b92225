"""Independent-reference tests for the addenda queries (anomaly
window, bigram-LM surprise). The PNG decode path has its own suite in
test_multimodal_png.py; its query-level parity is covered by the
entry contract."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from queryengine_spark.queries.addenda import (
    ANOM_K,
    ANOM_MIN_N,
    ANOM_WIN,
    LM_SCALE,
    events_anomaly_window,
    text_lm_surprise,
)
from queryengine_spark.queries.base import t


def test_anomaly_window_matches_reference(spark, sf_dir):
    ev = [
        (r["event_type"], r["bucket"])
        for r in t(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS bucket",
        )
        .collect()
    ]
    counts = Counter(ev)
    series = defaultdict(list)
    for (et, bucket), c in sorted(counts.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[et].append((bucket, c))
    expect = {}
    for et, rows in series.items():
        for i, (bucket, c) in enumerate(rows):
            win = [x for _, x in rows[max(0, i - ANOM_WIN) : i]]
            n, s, ss = len(win), sum(win), sum(x * x for x in win)
            flag = int(
                n >= ANOM_MIN_N
                and (n * c - s) ** 2 > ANOM_K * ANOM_K * (n * ss - s * s)
            )
            expect[(et, bucket)] = (c, n, s, ss, flag)
    got = {
        (r["event_type"], r["bucket"]): (
            r["cnt"],
            r["win_n"],
            r["win_sum"],
            r["win_sumsq"],
            r["is_anomaly"],
        )
        for r in events_anomaly_window(spark, sf_dir).collect()
    }
    assert got == expect


def test_lm_surprise_matches_reference(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in docs.values():
        for i in range(len(toks) - 1):
            uni[toks[i]] += 1
            bi[(toks[i], toks[i + 1])] += 1
    expect = {}
    for did, toks in docs.items():
        sur = [
            uni[toks[i]] * LM_SCALE // bi[(toks[i], toks[i + 1])]
            for i in range(len(toks) - 1)
        ]
        if sur:
            expect[did] = (len(sur), sum(sur), sum(sur) // len(sur))
    got = {
        r["doc_id"]: (r["n_pairs"], r["surprise_sum"], r["surprise_avg"])
        for r in text_lm_surprise(spark, sf_dir).collect()
    }
    assert got == expect
    # surprise is bounded below by SCALE (c12 <= c1 always)
    assert all(v[2] >= LM_SCALE for v in expect.values())


def test_bfs_hops_matches_reference(spark, sf_dir):
    """Independent BFS over the same candidate edge set."""
    from queryengine_spark.operators.dedup import minhash_lsh_candidate_pairs
    from queryengine_spark.queries.addenda import (
        BFS_MAX_HOPS,
        BFS_SEED_MOD,
        graph_bfs_hops,
    )
    from queryengine_spark.queries.dedup import (
        BAND_SIZE,
        MINHASH_MAX_BUCKET,
        N_HASHES,
    )

    docs = t(spark, sf_dir, "documents")
    edges = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidate_pairs(
            docs, "doc_id", "text",
            n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
            max_bucket=MINHASH_MAX_BUCKET,
        ).collect()
    ]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [r["doc_id"] for r in docs.select("doc_id").collect()
             if r["doc_id"] % BFS_SEED_MOD == 0]
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, BFS_MAX_HOPS + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    got = {r["doc_id"]: r["dist"] for r in graph_bfs_hops(spark, sf_dir).collect()}
    assert got == dist
    # at least one vertex must be reached at hop >= 1 (non-vacuous)
    assert any(v >= 1 for v in got.values())


def test_jaccard_prefix_join_equals_bruteforce(spark, sf_dir):
    """Prefix filtering must lose NOTHING: compare against an
    all-pairs brute force over the collected token sets, and verify
    the prefix candidate volume is strictly smaller than the full
    inverted-index candidate volume (the point of the optimization)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from queryengine_spark.operators.setjoin import (
        jaccard_prefix_join,
        token_set_relation,
    )
    from queryengine_spark.queries.addenda import PPJOIN_THRESHOLD

    docs = t(spark, sf_dir, "documents")

    def trigrams(text):
        toks = text.lower().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sets = {
        r["doc_id"]: trigrams(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= PPJOIN_THRESHOLD:
            expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    got = {
        (r["id_a"], r["id_b"]): (r["shared"], r["n_a"], r["n_b"])
        for r in jaccard_prefix_join(
            docs, "doc_id", "text", threshold=PPJOIN_THRESHOLD
        ).collect()
    }
    assert got == expect
    assert expect, "threshold yields zero pairs — test is vacuous"

    # candidate-volume reduction: Σ df² over prefix tokens vs all
    toks = token_set_relation(docs, "doc_id", "text")
    full = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df")) \
        .agg(F.sum(F.col("df") * F.col("df"))).collect()[0][0]
    from pyspark.sql import Window

    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    counts = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy("df", "tok")
    pref = (
        toks.join(dfreq, "tok").join(counts, "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(PPJOIN_THRESHOLD) * F.col("n")) + 1)
    )
    pvol = pref.groupBy("tok").agg(F.count(F.lit(1)).alias("df")) \
        .agg(F.sum(F.col("df") * F.col("df"))).collect()[0][0]
    assert pvol < full / 2, (pvol, full)


def test_jaccard_prefix_join_non_dyadic_thresholds(spark, sf_dir):
    """r6: the threshold is rationalized to p/q and every filter runs
    in integer arithmetic, so NON-DYADIC thresholds (0.3, 0.7 — the
    values binary float ceil() could silently mis-prefix) must also
    equal brute force exactly. The brute-force side compares with
    integer cross-multiplication too, so a float boundary can't hide
    on either side."""
    from fractions import Fraction
    from itertools import combinations

    from queryengine_spark.operators.setjoin import jaccard_prefix_join

    docs = t(spark, sf_dir, "documents")

    def trigrams(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {
        r["doc_id"]: trigrams(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    for thr in (0.3, 0.7):
        frac = Fraction(thr).limit_denominator(1000)
        p, q = frac.numerator, frac.denominator
        expect = {}
        for a, b in combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and q * inter >= p * union:
                expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
        got = {
            (r["id_a"], r["id_b"]): (r["shared"], r["n_a"], r["n_b"])
            for r in jaccard_prefix_join(
                docs, "doc_id", "text", threshold=thr
            ).collect()
        }
        assert got == expect, thr
    assert expect, "0.7 yields zero pairs — test is vacuous"


def test_regression_slope_matches_reference(spark, sf_dir):
    from queryengine_spark.queries.addenda import profile_regression_slope

    rows = t(spark, sf_dir, "documents").selectExpr(
        "lang", "n_chars", "size(split(trim(text), '\\\\s+')) AS y"
    ).collect()
    stats = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in rows:
        x, y = r["n_chars"], r["y"]
        c = stats[r["lang"]]
        c[0] += 1; c[1] += x; c[2] += y
        c[3] += x * x; c[4] += y * y; c[5] += x * y
    got = {r["lang"]: r for r in profile_regression_slope(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for lg, (n, sx, sy, sxx, syy, sxy) in stats.items():
        g = got[lg]
        assert (g["n"], g["cov_num"], g["varx_num"], g["vary_num"]) == (
            n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        )
        assert abs(g["slope"] - (n * sxy - sx * sy) / (n * sxx - sx * sx)) < 1e-12
        # sanity: longer docs have more tokens — slope must be positive
        assert g["slope"] > 0


def test_events_pattern_match_reference(spark, sf_dir):
    """Independent reference: Python re.search over the same
    per-user ordered symbol strings proves the greedy chain equals
    regex subsequence matching."""
    import re

    from queryengine_spark.queries.addenda import events_pattern_match

    ev = t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "ts", "substr(event_type, 1, 1) AS sym"
    ).collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["sym"]))
    got = {r["user_id"]: r for r in events_pattern_match(spark, sf_dir).collect()}
    assert set(got) == set(seqs)
    n_funnel = 0
    for uid, rows in seqs.items():
        seq = "".join(s for _, _, s in sorted(rows))
        g = got[uid]
        assert g["seq"] == seq and g["n_events"] == len(rows)
        # regex ground truth for the subsequence pattern
        m = re.search(r"v.*?c.*?p", seq)
        assert g["has_funnel"] == (1 if m else 0)
        if m:
            n_funnel += 1
            # greedy chain positions are the lazy regex match's ends
            assert seq[g["i_v"] - 1] == "v"
            assert seq[g["i_c"] - 1] == "c" and g["i_c"] > g["i_v"]
            assert seq[g["i_p"] - 1] == "p" and g["i_p"] > g["i_c"]
    assert n_funnel > 0, "no user completes the funnel — test is vacuous"


def test_winsorize_matches_reference(spark, sf_dir):
    from queryengine_spark.queries.addenda import (
        WINSOR_HI,
        WINSOR_LO,
        text_winsorize,
    )

    rows = t(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((len(r["text"].split()), r["doc_id"]))
    bounds = {}
    for lg, vals in by_lang.items():
        vs = sorted(vals)
        n = len(vs)
        lo = vs[max(1, (WINSOR_LO * n + 99) // 100) - 1][0]
        hi = vs[max(1, (WINSOR_HI * n + 99) // 100) - 1][0]
        bounds[lg] = (lo, hi)
    got = {r["doc_id"]: r for r in text_winsorize(spark, sf_dir).collect()}
    assert len(got) == len(rows)
    clipped_any = False
    for r in rows:
        x = len(r["text"].split())
        lo, hi = bounds[r["lang"]]
        g = got[r["doc_id"]]
        assert (g["n_tokens"], g["p_lo"], g["p_hi"]) == (x, lo, hi)
        assert g["clipped"] == min(max(x, lo), hi)
        assert g["was_clipped"] == (1 if (x < lo or x > hi) else 0)
        clipped_any |= g["was_clipped"] == 1
    assert clipped_any, "p10/p90 clipped nothing — vacuous"


def test_transition_matrix_reference(spark, sf_dir):
    from queryengine_spark.queries.addenda import events_transition_matrix

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pair_counts = Counter()
    for rows in per_user.values():
        seq = [t_ for _, _, t_ in sorted(rows)]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] += 1
    row_tot = Counter()
    for (a, _b), c in pair_counts.items():
        row_tot[a] += c
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["row_total"], r["prob_ppm"])
        for r in events_transition_matrix(spark, sf_dir).collect()
    }
    assert set(got) == set(pair_counts)
    for k, c in pair_counts.items():
        assert got[k] == (c, row_tot[k[0]], 1_000_000 * c // row_tot[k[0]])
    # each row's probabilities sum to ~1e6 (floor rounding loses < |types|)
    by_prev = defaultdict(int)
    for (a, _b), (_n, _t, p) in got.items():
        by_prev[a] += p
    assert all(1_000_000 - len(by_prev) * 1 <= s <= 1_000_000 for s in by_prev.values())


def test_novelty_hapax_reference(spark, sf_dir):
    from queryengine_spark.queries.addenda import text_novelty_hapax

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    df = Counter()
    for toks in docs.values():
        for tk in set(toks):
            df[tk] += 1
    got = {r["doc_id"]: r for r in text_novelty_hapax(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    any_hapax = False
    for did, toks in docs.items():
        dist = set(toks)
        hap = sum(1 for tk in dist if df[tk] == 1)
        g = got[did]
        assert (g["n_tokens"], g["n_distinct"], g["n_hapax"]) == (
            len(toks), len(dist), hap
        )
        assert g["ttr_ppm"] == 1_000_000 * len(dist) // len(toks)
        assert g["hapax_ppm"] == 1_000_000 * hap // len(dist)
        any_hapax |= hap > 0
    # sf0.001's 50-doc shared vocabulary can genuinely contain zero
    # hapax tokens — so non-vacuity comes from a PLANTED frame instead
    if not any_hapax:
        from queryengine_spark.operators.setjoin import spread  # reuse import path

        planted = spark.createDataFrame(
            [(1, "alpha beta gamma uniquetokenxyz"), (2, "alpha beta gamma")],
            ["doc_id", "text"],
        )
        import queryengine_spark.queries.addenda as add
        import queryengine_spark.queries.base as qb

        orig = qb.t
        try:
            qb.t = lambda _s, _sf, _n: planted
            add.t = qb.t
            g = {r["doc_id"]: r for r in add.text_novelty_hapax(spark, sf_dir).collect()}
        finally:
            qb.t = orig
            add.t = orig
        assert g[1]["n_hapax"] == 1 and g[2]["n_hapax"] == 0
