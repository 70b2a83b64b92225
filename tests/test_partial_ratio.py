"""partial_ratio correctness: the bit-parallel implementation vs an
independent O(n·m) DP oracle over ALL windows, plus pinned values from
the reference's golden example reasoning (SURVEY §5.1)."""

from __future__ import annotations

import random

import pytest

from queryengine_spark.functions.similarity import partial_ratio


# --- independent oracle: classic DP LCS + exhaustive windows ---------------

def _lcs_dp(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        ai = a[i - 1]
        for j in range(1, n + 1):
            cur[j] = prev[j - 1] + 1 if ai == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[n]


def _sim(a: str, b: str) -> float:
    if len(a) + len(b) == 0:
        return 1.0
    return 2.0 * _lcs_dp(a, b) / (len(a) + len(b))


def _oracle_partial(s1: str, s2: str) -> float:
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if len(s1) == 0:
        return 100.0 if len(s2) == 0 else 0.0
    best = 0.0
    # every window: all prefixes shorter than len1, all full windows,
    # all suffixes shorter than len1 (superset of the skip-optimized
    # scan; the skips are lossless so maxima agree)
    for i in range(1, len(s1)):
        best = max(best, _sim(s1, s2[:i]))
    for i in range(len(s2) - len(s1) + 1):
        best = max(best, _sim(s1, s2[i : i + len(s1)]))
    for i in range(len(s2) - len(s1) + 1, len(s2)):
        best = max(best, _sim(s1, s2[i:]))
    if best != 1.0 and len(s1) == len(s2):
        # symmetric evaluation (rapidfuzz does this for equal lengths)
        s1, s2 = s2, s1
        for i in range(1, len(s1)):
            best = max(best, _sim(s1, s2[:i]))
        best = max(best, _sim(s1, s2))
        for i in range(1, len(s2)):
            best = max(best, _sim(s1, s2[i:]))
    return 100.0 * best


PINNED = [
    # exact substring → 100 (drives 'test' → all test* candidates at 100)
    ("test", "testing", 100.0),
    ("test", "test123", 100.0),
    ("test", "tester", 100.0),
    ("test", "test1", 100.0),
    ("test", "test2", 100.0),
    ("vanilla", "vanilla", 100.0),
    # golden 'a yellow banana from the store' vs 'yellow banana' → window
    # containment: shorter ref fully inside query → 100
    ("yellow banana", "a yellow banana from the store", 100.0),
    ("", "", 100.0),
    ("", "abc", 0.0),
]


@pytest.mark.parametrize("s1,s2,want", PINNED)
def test_pinned_values(s1, s2, want):
    assert partial_ratio(s1, s2) == want


def test_transposition_case():
    # 'estt' vs 'test': LCS over best window
    got = partial_ratio("estt", "test")
    assert got == _oracle_partial("estt", "test")
    assert 0 < got < 100


def test_matches_dp_oracle_randomized():
    rng = random.Random(42)
    alphabet = "abcdef "
    for _ in range(400):
        s1 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
        got = partial_ratio(s1, s2)
        want = _oracle_partial(s1, s2)
        assert abs(got - want) < 1e-9, (s1, s2, got, want)


def test_symmetry_in_argument_order():
    rng = random.Random(7)
    for _ in range(100):
        s1 = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        s2 = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        assert partial_ratio(s1, s2) == partial_ratio(s2, s1)


def test_peanutbutter_below_90_cutoff():
    # golden example: peanutbutter → NA at cutoff 90 against all 10 refs
    refs = [
        "test1", "test2", "test123", "estt", "testing",
        "tester", "vanilla", "banana", "yellow banana", "a yellow banana store",
    ]
    assert all(partial_ratio("peanutbutter", r.lower()) < 90 for r in refs)
