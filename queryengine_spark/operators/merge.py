"""Snapshot maintenance without a table format: CDC upsert/delete
apply (the MERGE INTO shape) and SCD2 validity-interval history —
the two standard moves for keeping a curated corpus or dimension
snapshot current when the upstream delivers change batches instead
of full reloads. Delta/Iceberg provide these as table services; on
plain parquet the engine expresses them as one windowed plan each,
which is exactly how their MERGE implementations execute under the
hood (join/window on the key, rewrite).

Scale shape: both operators are a single shuffle on the key columns.
``apply_cdc``'s per-key reduction is rn=1 over (seq DESC) — a
WindowGroupLimit, so per-key state is one row regardless of how many
changes a hot key accumulated. ``scd2_history`` is two window
functions over the same (key × seq) sort — one pass, no self-join
(the naive formulation joins the stream to itself on "next change").
No UDFs, no driver state; at 100 TB the cost is the one key shuffle
you cannot avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot: per key, the change
    with the highest ``seq_col`` wins; a winning op ``'D'`` deletes
    the key; otherwise the winning row's payload replaces (or
    inserts) the snapshot row. ``base`` rows rank below every change
    (seq = -1 sentinel; real sequences must be ≥ 0).

    Payload = every non-key, non-seq, non-op column; ``base`` and
    ``changes`` must agree on payload schema. Returns the new
    snapshot with the payload columns."""
    payload = [
        c for c in base.columns if c not in key_cols and c not in (seq_col, op_col)
    ]
    b = base.select(
        *key_cols,
        *payload,
        F.lit(-1).cast("bigint").alias("_seq"),
        F.lit("I").alias("_op"),
    )
    c = changes.select(
        *key_cols,
        *payload,
        F.col(seq_col).cast("bigint").alias("_seq"),
        F.col(op_col).alias("_op"),
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
        .select(*key_cols, *payload)
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    attr_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change stream:
    collapse consecutive repeats of ``attr_col`` per key
    (gaps-and-islands via lag), then derive each surviving version's
    validity interval [effective_from, effective_to) via lead —
    effective_to NULL marks the current version.

    ``seq_col`` must totally order each key's stream (callers with
    timestamp + tiebreak should pre-combine them into one sortable
    column). Returns (keys…, attr, effective_from, effective_to,
    is_current)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    changed = (
        changes.select(*key_cols, seq_col, attr_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_col).over(w))
        # null-safe change test (IS DISTINCT FROM): a NULL attr is a
        # version like any other, and the first row always survives
        .filter(
            (F.col("_rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
        .drop("_rn", "_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    return (
        changed.withColumn("_next", F.lead(seq_col).over(w2))
        .select(
            *key_cols,
            F.col(attr_col),
            F.col(seq_col).alias("effective_from"),
            F.col("_next").alias("effective_to"),
            F.col("_next").isNull().cast("int").alias("is_current"),
        )
    )
