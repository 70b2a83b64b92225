"""Sequence packing — the concat-and-chunk step that turns a cleaned
document corpus into fixed-length training sequences (r7).

Nearly every LLM pretraining pipeline ends here: documents are laid
out in a deterministic global order, token counts accumulate into one
logical stream, and the stream is cut into SEQ_LEN-token training
sequences. The quantities a pipeline owner actually monitors fall out
of the doc → offset mapping: how many sequences a document straddles,
where it starts inside its first sequence, and how many documents
share each sequence (attention-mask fragmentation).

The only non-trivial distributed piece is the EXCLUSIVE PREFIX SUM of
token counts over the global document order. A bare
``Window.orderBy`` (no partition key) would compute it on ONE
partition — the classic scale-killer — so :func:`global_prefix_sum`
uses the same two-phase shape as ``suffix.py::global_rank``: range
repartition by the order key → per-partition running sum → broadcast
cumulative per-partition TOTALS back on. Driver state is one BIGINT
per partition; the offsets travel as a broadcast relation, never a
plan literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame, order_cols: list[str], val_col: str, out: str = "prefix"
) -> DataFrame:
    """Adds ``out`` = the EXCLUSIVE prefix sum of ``val_col`` over the
    global ``order_cols`` order, scale-out (see module docstring).
    ``order_cols`` must be a unique key (it is the tie-break)."""
    spark = df.sparkSession
    try:
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        npart = spark.sparkContext.defaultParallelism
    p = (
        df.repartitionByRange(npart, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid assignment for both passes
    )
    totals = {
        r["_pid"]: r["s"]
        for r in p.groupBy("_pid").agg(F.sum(val_col).alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += int(totals[pid] or 0)
    off = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _off bigint")
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        p.withColumn("_run", F.coalesce(F.sum(val_col).over(w), F.lit(0)))
        .join(off, "_pid")
        .withColumn(out, (F.col("_run") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_run", "_off")
    )


def pack_sequences(
    df: DataFrame, id_col: str, text_col: str, seq_len: int
) -> DataFrame:
    """Concat-and-chunk packing layout: documents in ascending
    ``id_col`` order form one token stream cut into ``seq_len``-token
    sequences. Returns one row per non-empty document:
    (id, n_tokens, start_tok, first_seq, last_seq, n_seqs,
    offset_in_seq) — all exact BIGINT arithmetic on the prefix sum,
    which the oracle replicates with a plain SQL window."""
    from queryengine_spark.functions.text import tokenize_ws

    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.size(tokenize_ws(F.col(text_col))).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    pre = global_prefix_sum(toks, ["id"], "n_tokens", out="start_tok")
    first_seq = F.expr(f"start_tok div {int(seq_len)}")
    last_seq = F.expr(f"(start_tok + n_tokens - 1) div {int(seq_len)}")
    return pre.select(
        "id",
        "n_tokens",
        "start_tok",
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
        (F.col("start_tok") % seq_len).cast("bigint").alias("offset_in_seq"),
    )
