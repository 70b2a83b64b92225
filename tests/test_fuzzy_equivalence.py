"""M2 (SURVEY §7): the scalable inverted-index candidate generation is
equivalent to the dense cross strategy, plus the metamorphic properties
from SURVEY §5.2."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from queryengine_spark.config import FuzzyConfig
from queryengine_spark.operators.fuzzy_join import (
    candidates_cross,
    candidates_inverted,
    fuzzy_match,
    prepare_terms,
)

WORDS = [
    "widget", "gadget", "bolt", "rod", "bracket", "flange", "washer",
    "grommet", "spring", "bearing", "blue", "red", "green", "small",
    "large", "cold", "hot", "steel", "brass", "nylon",
]


def _random_terms(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        k = rng.randint(1, 3)
        term = " ".join(rng.choice(WORDS) for _ in range(k))
        if rng.random() < 0.4:  # dirty it up
            i = rng.randrange(len(term))
            term = term[:i] + rng.choice("abcxyz") + term[i + 1 :]
        out.append(term)
    return out


@pytest.fixture(scope="module")
def qr(spark):
    rng = random.Random(1234)
    q = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_random_terms(rng, 60))], ["id", "term"]
    )
    r = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_random_terms(rng, 150))], ["id", "term"]
    )
    return q, r


def test_inverted_equals_cross_on_positive_coverage(spark, qr):
    """Every (q, r, cov, lendiff) pair with cov > 0 is identical across
    strategies (zero-coverage pairs exist only in cross mode — the
    documented divergence)."""
    q_raw, r_raw = qr
    q = prepare_terms(q_raw, "term", "id", "q")
    r = prepare_terms(r_raw, "term", "id", "r")
    cols = ["q_id", "r_id", "cov", "lendiff"]
    cross = {
        tuple(row)
        for row in candidates_cross(q, r).filter(F.col("cov") > 0).select(*cols).collect()
    }
    inv = {tuple(row) for row in candidates_inverted(q, r).select(*cols).collect()}
    assert inv == cross


def test_end_to_end_match_parity(spark, qr):
    """With K small enough that positive-coverage candidates fill the
    top-K, the full pipelines agree row-for-row."""
    q_raw, r_raw = qr
    results = {}
    for strategy in ("cross", "inverted"):
        cfg = FuzzyConfig(top_k=3, score_cutoff=60, candidate_strategy=strategy)
        df = fuzzy_match(q_raw, r_raw, query_id="id", ref_id="id", config=cfg)
        results[strategy] = sorted(tuple(r) for r in df.collect())
    assert results["cross"] == results["inverted"]


def test_cutoff_monotonicity(spark, qr):
    """Raising the cutoff can only turn matches into NA (SURVEY §5.2)."""
    q_raw, r_raw = qr
    lo = fuzzy_match(
        q_raw, r_raw, query_id="id", ref_id="id",
        config=FuzzyConfig(top_k=5, score_cutoff=60),
    )
    hi = fuzzy_match(
        q_raw, r_raw, query_id="id", ref_id="id",
        config=FuzzyConfig(top_k=5, score_cutoff=90),
    )
    lo_map = {r["q_id"]: r["match"] for r in lo.collect()}
    hi_map = {r["q_id"]: r["match"] for r in hi.collect()}
    assert set(lo_map) == set(hi_map)
    for qid, hi_match in hi_map.items():
        if hi_match != "NA":
            assert lo_map[qid] == hi_match  # survivors are unchanged


def test_every_query_exactly_once_and_self_match(spark):
    """cov(q,q)=1 and exact self-matches score 100; every contract-valid
    query appears exactly once."""
    terms = [(i, w) for i, w in enumerate(WORDS)]
    df = spark.createDataFrame(terms, ["id", "term"])
    out = fuzzy_match(
        df, df, query_id="id", ref_id="id",
        config=FuzzyConfig(top_k=3, score_cutoff=90),
    ).collect()
    assert len(out) == len(WORDS)
    by_id = {r["q_id"]: r for r in out}
    for i, w in terms:
        assert by_id[i]["match"] == w
        assert by_id[i]["score"] == 100


def test_stop_bigram_guard_keeps_strong_matches(spark, qr):
    """With a hot-bigram cap, exact duplicates must still match
    (they share plenty of rare bigrams)."""
    q_raw, r_raw = qr
    r_terms = [t["term"] for t in r_raw.select("term").collect()]
    q_exact = spark.createDataFrame(
        [(i, t) for i, t in enumerate(r_terms[:30])], ["id", "term"]
    )
    cfg = FuzzyConfig(
        top_k=5, score_cutoff=90, candidate_strategy="inverted",
        stop_bigram_df_ratio=0.2,
    )
    out = fuzzy_match(q_exact, r_raw, query_id="id", ref_id="id", config=cfg).collect()
    assert all(r["score"] == 100 for r in out)
