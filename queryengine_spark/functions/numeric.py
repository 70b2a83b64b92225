"""Numeric helpers.

``fround`` is the engine's portable half-up rounding: pure IEEE
``floor(x * 10^n + 0.5) / 10^n``. Unlike ``F.round`` (which routes
through Java BigDecimal's shortest-decimal string and disagrees with
other engines on half-way doubles), this form evaluates bit-identically
on any IEEE-754 engine — required for the DuckDB oracle parity of the
driver contract."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**n)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)
