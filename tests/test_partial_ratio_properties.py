"""Hypothesis property tests for the partial_ratio scorer (SURVEY
§5.2 metamorphic properties) — no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from queryengine_spark.functions.similarity import partial_ratio

text = st.text(alphabet="abcdef xyz", min_size=0, max_size=24)


@given(text, text)
@settings(max_examples=300, deadline=None)
def test_range_and_symmetry(a, b):
    s = partial_ratio(a, b)
    assert 0.0 <= s <= 100.0
    assert s == partial_ratio(b, a)


@given(text)
@settings(max_examples=150, deadline=None)
def test_identity(a):
    assert partial_ratio(a, a) == 100.0


@given(text, text)
@settings(max_examples=300, deadline=None)
def test_substring_containment_is_100(a, b):
    # any non-empty string embedded in a longer one scores 100
    if a:
        assert partial_ratio(a, b + a + b) == 100.0


# NOTE: "extending the haystack never lowers the score" is NOT a true
# property of rapidfuzz partial_ratio — the growing-prefix/shrinking-
# suffix edge windows (e.g. needle '  ' vs haystack 'a ': the 1-char
# suffix window ' ' scores 2/3, beating every full window) disappear
# when the haystack grows, so scores can legitimately drop. Exact
# behavior is pinned by the DP-oracle equivalence in
# test_partial_ratio.py instead.


@given(text, text)
@settings(max_examples=200, deadline=None)
def test_perfect_window_detection(a, b):
    # 100 implies a's chars can be aligned gap-free-ish: at minimum,
    # identity and containment must yield 100 (covered above), and a
    # score of 100 must round-trip deterministically
    s1 = partial_ratio(a, b)
    assert s1 == partial_ratio(a, b)  # pure / deterministic