"""Weighted sampling without replacement — sequential Poisson
sampling (Ohlsson 1998), the order-sampling scheme survey statistics
uses for probability-proportional-to-size draws and the natural
distributed formulation: each row gets priority key u/w (u a
uniform hash draw, w its weight), the global k smallest keys win.
One TakeOrderedAndProject, no per-group state, no rejection loop —
at 100 TB the only cost is the top-k reduction every executor
already knows how to do.

Engine-portable determinism: u is the first 12 hex chars of
md5(id) as an integer (48 uniform bits — the package's replayable
uniform draw), the key is the exact integer ``(u · scale) div w``,
and ties break on id. No float pow/log (the textbook exponential
formulation u^(1/w) needs both), so any SQL engine reproduces the
identical sample.

Inclusion probabilities are approximately proportional to w (exact
πps needs the Sampford correction; sequential Poisson is the
standard approximation with O(1/n) bias) — documented divergence,
ranking semantics exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 48-bit uniform draw from md5 — exact in BIGINT, and (u * scale)
#: stays < 2^63 for scale ≤ 2^14; callers needing finer weight
#: resolution rescale weights instead
U_HEX_CHARS = 12
KEY_SCALE = 10_000


def uniform_draw(id_col: Column | str) -> Column:
    """Deterministic 48-bit uniform integer from md5(id) — the
    package's replayable substitute for random()."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, U_HEX_CHARS), 16, 10
    ).cast("bigint")


def weighted_sample_wor(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
) -> DataFrame:
    """The ``k`` rows with the smallest sequential-Poisson priority
    keys ``(u(id) · KEY_SCALE) div w`` — a replayable weighted
    sample without replacement (higher weight → smaller key → more
    likely in). Weights must be positive integers (callers quantize).
    Returns the input columns + ``skey`` + ``rank``."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    keyed = (
        # zero/negative/null-weight rows cannot be drawn (standard in
        # πps schemes) — and guard the integer division
        df.filter(w > 0)
        .withColumn("_u", uniform_draw(id_col))
        .withColumn("_w", w.cast("bigint"))
        # true integer division: u·scale is up to 2^62 — a double
        # round-trip (floor(x/y)) would lose low bits past 2^53
        .withColumn("skey", F.expr(f"(_u * {KEY_SCALE}) div _w").cast("bigint"))
        .drop("_u", "_w")
    )
    top = keyed.orderBy(F.col("skey").asc(), F.col(id_col).asc()).limit(k)
    wnd = Window.orderBy(F.col("skey").asc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(wnd).cast("int"))
