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
