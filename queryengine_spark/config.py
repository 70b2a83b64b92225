"""Engine configuration.

``FuzzyConfig`` mirrors the reference CLI knobs
(/root/reference/src/heurFuzz.py:172-195: -n topN default 10,
-s scoreCutOff default 90, -b bufferSize default 500) plus our
scale/compat switches documented in SURVEY.md §2.3/§4.3.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FuzzyConfig:
    #: top-K candidates kept per query after the heuristic phase
    #: (reference default: src/heurFuzz.py:177).
    top_k: int = 10
    #: refine-phase minimum partial-ratio score; below → "NA"
    #: (reference default 90: src/heurFuzz.py:178).
    score_cutoff: int = 90
    #: maximum UTF-8 byte length of a term (reference buffer size,
    #: src/heurFuzz.py:179). Terms longer than this are filtered out
    #: (the reference hard-exits; we filter — SURVEY §1.3).
    buffer_size: int = 500
    #: candidate generation strategy: "auto" picks inverted-index for
    #: large inputs / crossjoin for tiny ones, or force "inverted" /
    #: "cross". "cross" reproduces the reference's dense R×Q semantics
    #: including zero-coverage candidates (SURVEY §4.3 step 3).
    candidate_strategy: str = "auto"
    #: in inverted mode, drop bigrams whose reference document
    #: frequency exceeds this fraction of |R| during candidate
    #: generation only (skew guard for hot bigrams, SURVEY §4.3.4).
    #: None disables. Recall is protected by the refine stage only
    #: when queries share rarer bigrams too; default off for parity.
    stop_bigram_df_ratio: float | None = None
    #: below this many reference rows, "auto" uses the cross strategy
    #: so zero-coverage candidates can fill the top-K like the
    #: reference does (SURVEY §2.3 Q3 context).
    auto_cross_threshold: int = 10_000
