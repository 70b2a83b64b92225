"""Semantic invariants of the training-pipeline queries — properties
the oracle hash-compare can't express: the decontamination scan must
actually FIND the planted leak, sampling must be deterministic and
honor its bounds, quality flags must agree with their own metrics."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

Q = dict(entry_mod.queries())
# r8 folds: unit tests keep exercising the individual legs
from queryengine_spark.queries.pipelines import (  # noqa: E402
    dedup_decontaminate,
    events_funnel,
    events_retention,
)

Q.update(
    {
        "dedup_decontaminate": dedup_decontaminate,
        "events_funnel": events_funnel,
        "events_retention": events_retention,
    }
)


@pytest.fixture(scope="module")
def decon(spark, sf_dir):
    return Q["dedup_decontaminate"](spark, sf_dir).collect()


def test_decontaminate_finds_planted_leaks(spark, sf_dir, decon):
    """Every benchmark span is cut from a real training doc, so that
    doc must be flagged with overlap 1.0 (all span trigrams that
    survive the df guard are, by construction, in the source doc)."""
    from queryengine_spark.queries.pipelines import DECON_BENCH_MOD
    from queryengine_spark.sources.tables import load_table

    bench_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(f"doc_id % {DECON_BENCH_MOD} = 0")
        .select("doc_id")
        .collect()
    }
    hits = {(r["train_id"], r["bench_id"]): r["overlap"] for r in decon}
    flagged_bench = {b for (_, b) in hits}
    # every bench item whose span yields any guarded trigrams at all
    # appears — and its self-pair scores exactly 1.0
    for b in flagged_bench:
        assert b in bench_ids
        assert hits.get((b, b)) == pytest.approx(1.0)
    assert len(flagged_bench) > 0


def test_decontaminate_overlap_bounds(decon):
    for r in decon:
        assert 0.0 < r["overlap"] <= 1.0
        assert r["n_shared"] >= 1


def test_weighted_mix_deterministic_subset(spark, sf_dir):
    from queryengine_spark.queries.pipelines import MIX_RATES, _MIX_DEFAULT

    a = Q["pipeline_weighted_mix"](spark, sf_dir).collect()
    b = Q["pipeline_weighted_mix"](spark, sf_dir).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    for r in a:
        rate = MIX_RATES.get(r["lang"], _MIX_DEFAULT)
        assert r["u"] < rate + 1e-6


def test_stratified_sample_exact_k_per_lang(spark, sf_dir):
    from collections import Counter

    from queryengine_spark.queries.pipelines import STRATA_K
    from queryengine_spark.sources.tables import load_table

    rows = Q["pipeline_stratified_sample"](spark, sf_dir).collect()
    lang_sizes = Counter(
        r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("lang").collect()
    )
    got = Counter(r["lang"] for r in rows)
    for lang, n in got.items():
        assert n == min(STRATA_K, lang_sizes[lang])
    # deterministic: re-run picks the identical docs
    again = Q["pipeline_stratified_sample"](spark, sf_dir).collect()
    assert sorted((r["lang"], r["rank"], r["doc_id"]) for r in rows) == sorted(
        (r["lang"], r["rank"], r["doc_id"]) for r in again
    )


def test_gopher_keep_agrees_with_metrics(spark, sf_dir):
    from queryengine_spark.queries import pipelines as pl

    for r in Q["text_gopher_quality"](spark, sf_dir).collect():
        expect = (
            r["n_tokens"] is not None
            and pl.GOPHER_MIN_TOKENS <= r["n_tokens"] <= pl.GOPHER_MAX_TOKENS
            and r["mean_token_len"] is not None
            and pl.GOPHER_MIN_MEAN_LEN <= r["mean_token_len"] <= pl.GOPHER_MAX_MEAN_LEN
            and r["symbol_ratio"] is not None
            and r["symbol_ratio"] < pl.GOPHER_MAX_SYMBOL_RATIO
            and r["top_token_ratio"] is not None
            and r["top_token_ratio"] < pl.GOPHER_MAX_TOP_TOKEN_RATIO
        )
        assert r["keep"] == int(expect), r


def test_repetition_fracs_bounded(spark, sf_dir):
    for r in Q["text_repetition_stats"](spark, sf_dir).collect():
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert r["top_bigram_char_frac"] >= 0.0
        # overlapping duplicate trigrams may exceed 1.0; cap is 3x
        # (each char covered by at most 3 trigram windows)
        assert 0.0 <= r["dup_trigram_char_frac"] <= 3.0


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    """Week offset 0 of each cohort must count exactly the cohort's
    members (everyone is active in their own first week)."""
    rows = Q["events_retention"](spark, sf_dir).collect()
    week0 = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["cohort_week"]] = max(
            totals.get(r["cohort_week"], 0), r["n_users"]
        )
    assert week0 == totals  # no later week exceeds the cohort size
    assert sum(week0.values()) > 0


def test_funnel_is_monotone(spark, sf_dir):
    r = Q["events_funnel"](spark, sf_dir).collect()[0]
    assert r["n_signup"] >= r["n_click_after_signup"] >= r["n_purchase_after_click"]
    assert r["n_signup"] > 0


def test_pii_pseudonymize_tokens_stable_across_docs(spark, sf_dir):
    """The operator's whole claim: the SAME address maps to the SAME
    token in every document (referential integrity survives
    redaction), and different addresses map to different tokens."""
    from queryengine_spark.queries.pipelines import text_pii_pseudonymize

    out = text_pii_pseudonymize(spark, sf_dir).collect()
    shared = [r["email_token"] for r in out if r["doc_id"] % 21 == 0 and r["n_emails"]]
    assert len(shared) >= 2 and len(set(shared)) == 1  # one shared address, one token
    unique = {
        r["doc_id"]: r["email_token"]
        for r in out
        if r["doc_id"] % 7 == 0 and r["doc_id"] % 21 != 0 and r["n_emails"]
    }
    assert len(set(unique.values())) == len(unique)  # distinct addresses differ
    assert all(t.startswith("<EMAIL_") for t in unique.values())
