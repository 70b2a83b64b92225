"""As-of join — a temporal operator Spark has no built-in for
(DuckDB/kdb/TimescaleDB have it natively; the oracle uses DuckDB's
ASOF JOIN). For each left row (key, t) attach the right row with the
greatest right-time <= t for the same key.

Spark-first implementation (no crossJoin, no range explosion): tag
both sides, union them, and run ONE window pass per key ordered by
(time, side) taking the last non-null right payload — O(n log n) in
each partition, a single shuffle on the key, and AQE-friendly. This
is the standard scalable shape; a per-key sort-merge would need a
custom physical operator for marginal gain.

Ties: a right row at exactly t matches (right sorts before left at
equal times), mirroring ASOF's rt <= t. Duplicate right rows on the
same (key, right-time) are resolved by ``right_tiebreak`` (greatest
wins); without it callers must pre-deduplicate right on (key, time)
or the surviving payload is nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    suffix: str = "asof_",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: all left rows, each with the latest
    (greatest ``right_time`` <= ``left_time``) right row's
    ``right_values`` for the same ``on`` keys, or NULLs.

    ``right_tiebreak``: optional right column ordering duplicate
    right rows on the same (key, time) — the greatest value wins
    deterministically.

    Output: all left columns + ``{suffix}{right_time}`` +
    ``{suffix}{col}`` for each value column.
    """
    on = list(on)
    payload = F.struct(
        F.col(right_time).alias("t"), *[F.col(c).alias(c) for c in right_values]
    )
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l_tagged = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
    )
    merged = l_tagged.select(
        *[F.col(c) for c in on], "__t", "__side", "__tb", "__payload",
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
    ).unionByName(
        r_tagged.select(
            *[F.col(c) for c in on], "__t", "__side", "__tb", "__payload",
            F.lit(None).alias("__left").cast(
                l_tagged.select(F.struct(*[F.col(c) for c in left_cols])).schema[0].dataType
            ),
        )
    )
    # Frame order puts, within one timestamp, right rows (side 0) in
    # ascending tiebreak order before the left row (side 1); F.last
    # then surfaces the greatest-tiebreak right payload at or before t.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left_cols]
    out_cols.append(F.col("__match.t").alias(f"{suffix}{right_time}"))
    out_cols.extend(F.col(f"__match.{c}").alias(f"{suffix}{c}") for c in right_values)
    return matched.select(*out_cols)
