"""Range (interval) join — points against intervals with NO equi key.

Naively this is a theta join (BroadcastNestedLoopJoin — quadratic).
The scale shape: quantize the axis into fixed-width buckets, explode
each interval into the buckets it covers, equi-join points to their
single bucket, with the exact containment predicate as a join
residual. Join cost drops from |P|·|I| to Σ per-bucket products; the
bucket width trades replication (long intervals × narrow buckets)
against selectivity. Results equal the theta join exactly (each point
lives in one bucket, so matches are never duplicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point < end_col`` (half-open), both on the same
    integer axis (e.g. epoch microseconds). ``how='left'`` keeps
    unmatched points (interval columns NULL).

    ``bucket_width`` is in axis units; pick it near the typical
    interval length so most intervals replicate into O(1) buckets.
    Empty intervals (end <= start) are dropped — they can match
    nothing.
    """
    p = points.withColumn(
        "__pb", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__ib",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                    F.floor((F.col(end_col) - F.lit(1)) / F.lit(bucket_width)).cast("long"),
                )
            ),
        )
    )
    # containment goes INTO the join condition (a post-join filter
    # would discard unmatched rows of an outer join)
    cond = (
        (p["__pb"] == i["__ib"])
        & (i[start_col] <= p[point_col])
        & (p[point_col] < i[end_col])
    )
    return p.join(i, cond, how).drop("__pb", "__ib")
