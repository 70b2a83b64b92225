"""Suffix-array repeated-span detection (prefix doubling):
equivalence with the direct n-gram method and with span_scrub's
coverage on planted corpora, plus the intra-document upgrade and the
global_rank primitive."""

from __future__ import annotations

from pyspark.sql import functions as F

from queryengine_spark.operators.suffix import global_rank, repeated_spans_sa

W = 4  # power of two → 2 doubling rounds


def _spans(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        (r["doc_id"], r["pos"]): r["n_dup"]
        for r in repeated_spans_sa(df, "doc_id", "text", window=W).collect()
    }


def _ngram_reference(docs):
    """Independent pure-Python occurrence count of W-grams."""
    from collections import Counter

    grams: list[tuple[int, int, tuple]] = []
    for did, text in docs:
        toks = text.lower().split()
        for p in range(len(toks) - W + 1):
            grams.append((did, p, tuple(toks[p : p + W])))
    cnt = Counter(g for _, _, g in grams)
    return {(did, p): cnt[g] for did, p, g in grams if cnt[g] >= 2}


def test_matches_ngram_reference_on_planted_corpus(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zero alpha beta gamma delta omega"),      # shares a 5-token run
        (3, "unrelated words only here none match"),
        (4, "alpha beta gamma delta"),                 # exactly one window
        (5, "short doc"),                              # shorter than W
    ]
    assert _spans(spark, docs) == _ngram_reference(docs)
    assert len(_spans(spark, docs)) > 0


def test_intra_document_repeats_are_found(spark):
    """The upgrade over span_scrub's cross-document distinct-doc
    count: a span repeated WITHIN one document is detected."""
    docs = [
        (1, "x y z w junk1 junk2 x y z w"),
        (2, "totally different tokens in this one"),
    ]
    got = _spans(spark, docs)
    assert got == {(1, 0): 2, (1, 6): 2}


def test_equivalent_to_span_scrub_coverage_cross_doc(spark):
    """On a corpus with only CROSS-document repeats, the SA span
    starts must cover exactly the gram starts span_scrub(n=W,
    min_df=2) scrubs (its covered grams are the df>=2 grams; with no
    intra-doc repeats occurrence count == distinct-doc count)."""
    docs = [
        (1, "p q r s t u v"),
        (2, "a b p q r s t c"),
        (3, "no overlap here at all friend"),
    ]
    got = set(_spans(spark, docs))
    want = set(_ngram_reference(docs))
    assert got == want and len(want) == 4  # two runs of 2 windows each


def test_sentinel_never_merges_short_with_full(spark):
    """Doc 2 ENDS with the first three tokens of doc 1's window —
    a short suffix must not collapse with the full one."""
    docs = [(1, "m n o p tail tail2"), (2, "lead m n o")]
    assert _spans(spark, docs) == {}


def test_global_rank_is_exact_order(spark):
    import random

    vals = random.Random(7).sample(range(100000), 997)
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    got = {r["k"]: r["r"] for r in global_rank(df.distinct(), ["k"]).collect()}
    for rank0, v in enumerate(sorted(vals)):
        assert got[v] == rank0 + 1


def test_rerank_and_arithmetic_paths_agree(spark):
    """The adaptive combine (r5 perf): arithmetic pair packing and
    the distributed re-rank must produce identical span classes —
    rerank_threshold=0 forces a re-rank every round."""
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zero alpha beta gamma delta omega"),
        (3, "x y z w junk x y z w tail"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    def spans(**kw):
        return sorted(
            tuple(r)
            for r in repeated_spans_sa(df, "doc_id", "text", window=W, **kw).collect()
        )

    fast = spans()
    forced = spans(rerank_threshold=0)
    assert fast == forced and len(fast) > 0


# --- r6: arbitrary W, maximal intervals, scrub action ------------------------


def _ngram_reference_w(docs, w):
    from collections import Counter

    grams = []
    for did, text in docs:
        toks = text.lower().split()
        for p in range(len(toks) - w + 1):
            grams.append((did, p, tuple(toks[p : p + w])))
    cnt = Counter(g for _, _, g in grams)
    return {(did, p): cnt[g] for did, p, g in grams if cnt[g] >= 2}


def test_non_power_of_two_windows_match_reference(spark):
    """W = 3, 5, 6, 7 run through the overlapping power-of-2-span
    composition; each must match the direct n-gram count exactly
    (both combine paths)."""
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "z a b c d e f y x w"),
        (3, "q r s t u v q r s t u v"),  # intra-doc repeat, run of 6
        (4, "lone words that match nothing else"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for w in (3, 5, 6, 7):
        for kw in ({}, {"rerank_threshold": 0}):
            got = {
                (r["doc_id"], r["pos"]): r["n_dup"]
                for r in repeated_spans_sa(
                    df, "doc_id", "text", window=w, **kw
                ).collect()
            }
            assert got == _ngram_reference_w(docs, w), (w, kw)


def test_repeated_intervals_merges_overlapping_and_adjacent(spark):
    from queryengine_spark.operators.suffix import repeated_intervals

    hits = spark.createDataFrame(
        # doc 1: 0,1,2 overlap → one island [0, 2+W-1]; 20 is separate;
        # 2 and 2+W are ADJACENT covers (touching) → merge when gap == W
        [(1, 0), (1, 1), (1, 2), (1, 20), (2, 5), (2, 5 + 4)],
        ["doc_id", "pos"],
    )
    got = {
        (r["doc_id"], r["start"]): (r["end"], r["n_hits"])
        for r in repeated_intervals(hits, 4).collect()
    }
    assert got == {
        (1, 0): (5, 3),    # 0..2 merged, end = 2 + 3
        (1, 20): (23, 1),
        (2, 5): (12, 2),   # gap exactly W merges (touching covers)
    }


def _scrub_reference(docs, w):
    """Independent pure-Python simulator of detect→merge→remove."""
    dup = _ngram_reference_w(docs, w)
    out = {}
    for did, text in docs:
        toks = text.lower().split()
        hits = sorted(p for (d, p) in dup if d == did)
        ivals = []
        for p in hits:
            if ivals and p <= ivals[-1][1] + 1 and p - ivals[-1][2] <= w:
                ivals[-1] = (ivals[-1][0], p + w - 1, p)
            elif ivals and p - ivals[-1][2] <= w:
                ivals[-1] = (ivals[-1][0], p + w - 1, p)
            else:
                ivals.append((p, p + w - 1, p))
        covered = set()
        for s, e, _ in ivals:
            covered.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (
            len(ivals),
            len(covered),
            len(kept),
            " ".join(kept),
        )
    return out


def test_sa_scrub_matches_independent_simulator(spark):
    from queryengine_spark.operators.suffix import sa_scrub

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "z a b c d e f y x w"),
        (3, "q r s t u v q r s t u v"),
        (4, "lone words that match nothing else"),
        (5, "a b c d e f tail1 tail2 a b c d e f"),  # two islands? overlapping
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for w in (4, 6):
        got = {
            r["doc_id"]: (
                r["n_intervals"], r["n_removed"], r["n_kept"], r["clean_text"]
            )
            for r in sa_scrub(df, "doc_id", "text", window=w).collect()
        }
        assert got == _scrub_reference(docs, w), w


def test_sa_scrub_fully_covered_doc_keeps_zero(spark):
    """A document that is one big repeated span scrubs to empty."""
    from queryengine_spark.operators.suffix import sa_scrub

    docs = [(1, "a b c d"), (2, "a b c d")]
    got = {
        r["doc_id"]: (r["n_removed"], r["n_kept"], r["clean_text"])
        for r in sa_scrub(spark.createDataFrame(docs, ["doc_id", "text"]),
                          "doc_id", "text", window=4).collect()
    }
    assert got == {1: (4, 0, ""), 2: (4, 0, "")}


def test_global_rank_plan_has_no_offset_literal(spark):
    """r6: partition offsets ship as a broadcast relation, not a
    create_map literal — the plan must stay constant-size at any
    shuffle-partition count."""
    df = spark.createDataFrame([(v,) for v in range(500)], ["k"])
    ranked = global_rank(df.distinct(), ["k"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "map_from" not in plan and "keys: [" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # and the ranking is still exact
    got = {r["k"]: r["r"] for r in ranked.collect()}
    assert got == {v: v + 1 for v in range(500)}
