"""Sequence packing (operators/packing.py): the two-phase distributed
prefix sum is pinned against a trivial sequential simulator, and the
plan is gated against the single-partition-global-window scale
killer."""

from __future__ import annotations

from pyspark.sql import functions as F

from queryengine_spark.operators.packing import global_prefix_sum, pack_sequences


def test_global_prefix_sum_matches_sequential(spark):
    rows = [(i, (i * 7 + 3) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["prefix"]
        for r in global_prefix_sum(df, ["id"], "v").collect()
    }
    acc = 0
    for i, v in rows:  # already in id order
        assert got[i] == acc, i
        acc += v


def test_pack_sequences_layout_properties(spark):
    texts = [
        (i, " ".join(f"w{j}" for j in range((i * 13) % 37)))  # some empty
        for i in range(120)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = sorted(
        (
            r["id"], r["n_tokens"], r["start_tok"], r["first_seq"],
            r["last_seq"], r["n_seqs"], r["offset_in_seq"],
        )
        for r in pack_sequences(df, "doc_id", "text", 50).collect()
    )
    # independent sequential layout
    acc = 0
    want = []
    for i, txt in texts:
        n = len(txt.split())
        if n == 0:
            continue
        want.append(
            (i, n, acc, acc // 50, (acc + n - 1) // 50,
             (acc + n - 1) // 50 - acc // 50 + 1, acc % 50)
        )
        acc += n
    assert out == want
    # the stream is gapless: consecutive docs abut exactly
    for (a, b) in zip(want, want[1:]):
        assert b[2] == a[2] + a[1]


def test_pack_sequences_plan_has_no_global_window(spark):
    """The prefix sum must run as range-partitioned per-partition
    windows + a broadcast offsets join — a Window over an
    Exchange SinglePartition is the scale killer this operator
    exists to avoid."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c d e f g "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        pack_sequences(df, "doc_id", "text", 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # offsets arrive broadcast
