"""Grouped top-k: the reference's per-query candidate pruning (T1,
/root/reference/src/heurFuzz.py:81-90) generalized.

Implemented as row_number over a window — Spark >= 3.5 rewrites the
``row_number() <= k`` filter into a WindowGroupLimit physical node
(per-partition partial top-k before the shuffle), so this is the
scale-correct shape: no global sort, no driver collection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the top ``k`` rows per group under a total order.

    ``order_by`` must be a total order (include a unique tiebreaker)
    for deterministic distributed results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= F.lit(k)
    )
    return out if keep_rank else out.drop(rank_col)
