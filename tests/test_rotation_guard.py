"""The rotation tool's staleness guard (r9 verdict item 6).

A deferred query's certification age, measured at the NEXT round's
window, must never exceed MAX_STALENESS rounds — the invariant the r8
window's 16 tier-0 insertions silently violated (six r4 TPC-H shapes
reached age 5). These tests pin the guard's arithmetic on synthetic
certification maps AND assert the live repo state passes (exit 0).
No Spark session needed.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "update_certification",
        os.path.join(REPO, "scripts", "update_certification.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_guard_passes_when_tail_is_fresh():
    tool = _tool()
    # 60 queries: window = q00..q49 (r5), tail q50..q59 certified r7;
    # this round is r8, next window is r9 → tail age 9-7 = 2 ≤ 4.
    names = [f"q{i:02d}" for i in range(60)]
    cert = {n: 5 for n in names[:50]} | {n: 7 for n in names[50:]}
    worst, offenders = tool.projected_staleness(names, cert)
    assert worst == 2
    assert offenders == []


def test_guard_fails_on_overaged_tail():
    tool = _tool()
    # the r8 shape: max cert r8 → this round r9; a tail query last
    # certified r4 would be age 10-4 = 6 at the r10 window.
    names = [f"q{i:02d}" for i in range(60)]
    cert = {n: 8 for n in names[:50]} | {n: 6 for n in names[50:]}
    cert["q55"] = 4
    worst, offenders = tool.projected_staleness(names, cert)
    assert worst == 6
    assert offenders == [("q55", 6)]


def test_guard_flags_uncertified_tail_as_window_overflow():
    tool = _tool()
    names = [f"q{i:02d}" for i in range(52)]
    cert = {n: 8 for n in names[:50]} | {"q50": 8}
    # q51 has no certification row at all → projects as age
    # this_round + 1 = 10, always a violation.
    worst, offenders = tool.projected_staleness(names, cert)
    assert ("q51", 10) in offenders
    assert worst == 10


def test_live_repo_rotation_passes_guard():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "update_certification.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert "projected post-window max staleness" in proc.stdout
    assert proc.returncode == 0, proc.stdout + proc.stderr
