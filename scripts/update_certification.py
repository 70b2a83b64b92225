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


def main() -> None:
    names = list(all_queries())
    print(f"{len(names)} registered; {len(LAST_CERTIFIED)} certified; VOID={len(VOID)}")
    print("\n-- driver window (first 50, stalest-first) --")
    for i, n in enumerate(names[:50]):
        print(f"{i:3d}  r{LAST_CERTIFIED.get(n, 0)}  {n}")
    print("\n-- deferred (51+) --")
    for i, n in enumerate(names[50:], start=50):
        print(f"{i:3d}  r{LAST_CERTIFIED.get(n, 0)}  {n}")


if __name__ == "__main__":
    main()
