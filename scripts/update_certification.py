#!/usr/bin/env python
"""Inspect the driver-certification rotation (read-only).

The certification map itself is now computed AT IMPORT TIME by
``queryengine_spark/queries/certification.py`` from the repo-root
``CORRECTNESS_r*.json`` files — there is nothing to regenerate. This
tool prints the resulting 50-row driver window and the deferred tail
so a round's rotation can be sanity-checked before submission.

Maintenance that remains manual: when a change reworks a certified
query's semantics or oracle, add/bump it in ``certification.VOID``.

Usage: python scripts/update_certification.py  (from repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from queryengine_spark.queries import all_queries
from queryengine_spark.queries.certification import LAST_CERTIFIED, VOID

#: a deferred query's certification age, measured at the NEXT round's
#: window, must never exceed this many rounds (r9 — the r8 window's 16
#: tier-0 insertions silently pushed six r4 TPC-H shapes to age 5).
MAX_STALENESS = 4


def projected_staleness(
    names: list[str], cert: dict[str, int]
) -> tuple[int, list[tuple[str, int]]]:
    """Assume the current 50-row window certifies this round; return
    (projected max certification age of the DEFERRED tail at the next
    round's window, the offending (name, age) list). An uncertified
    query in the tail (window overflow) projects as age ``next_round
    + 1`` — always a violation."""
    this_round = max(cert.values(), default=0) + 1
    offenders = []
    worst = 0
    for n in names[50:]:
        age = this_round + 1 - cert.get(n, 0)
        worst = max(worst, age)
        if age > MAX_STALENESS:
            offenders.append((n, age))
    return worst, offenders


def main() -> None:
    names = list(all_queries())
    print(f"{len(names)} registered; {len(LAST_CERTIFIED)} certified; VOID={len(VOID)}")
    print("\n-- driver window (first 50, stalest-first) --")
    for i, n in enumerate(names[:50]):
        print(f"{i:3d}  r{LAST_CERTIFIED.get(n, 0)}  {n}")
    print("\n-- deferred (51+) --")
    for i, n in enumerate(names[50:], start=50):
        print(f"{i:3d}  r{LAST_CERTIFIED.get(n, 0)}  {n}")
    worst, offenders = projected_staleness(names, LAST_CERTIFIED)
    print(
        f"\nprojected post-window max staleness: {worst} rounds "
        f"(limit {MAX_STALENESS})"
    )
    if offenders:
        print("STALENESS GUARD FAILED — these deferred queries would be "
              f"certified more than {MAX_STALENESS} rounds ago at the next "
              "window (shrink this round's tier-0 insertions):")
        for n, age in offenders:
            print(f"  age {age}  {n}")
        sys.exit(1)


if __name__ == "__main__":
    main()
