"""Distributed suffix-array repeated-span detection via PREFIX
DOUBLING — the suffix-array half of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"), whose published
implementation builds a monolithic in-memory suffix array; this is
the Spark-relational construction over token sequences.

Prefix doubling (Manber-Myers): give every corpus position a rank
equal to its token's global rank (a length-1 prefix order), then
repeatedly combine ``rank[pos]`` with ``rank[pos + k]`` and re-rank,
doubling ``k`` — after ``log2(W)`` rounds two positions share a rank
IFF their first ``W`` tokens are identical. Positions are compared
WITHIN documents only (the join key is (doc_id, pos + k)); a suffix
shorter than ``k`` pairs with sentinel rank 0, which can never equal
a real rank, so short suffixes collapse only with equally-short
identical ones and are filtered from the output (a reported span
must be a full ``W``-token window, matching the n-gram oracle).

Why this shape instead of exploding W-grams: the n-gram formulation
(operators/curation.py::span_scrub) shuffles the GRAM STRING — ~W
tokens of bytes per position — once; prefix doubling shuffles two
8-byte ranks per position per round, log2(W) times. At Lee et al.'s
W=50 that is ~6 rounds × 16 B = 96 B/position vs ≥ 300 B/position
for gram strings, and the gap widens with W — the suffix-array plan
is how exact-substring dedup stays shuffle-feasible at long match
lengths. (At the small W the contract query uses, both are fine; the
plan is the point.)

Global ranking is the classic distributed-sort subproblem: ranks are
assigned with :func:`global_rank` — repartitionByRange on the key,
per-partition ``row_number`` (windows stay partition-local, never
one global window), plus broadcast partition offsets from a
#partitions-sized collect. Rank VALUES are the exact global order of
the distinct keys, independent of partition boundaries, so results
are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws


def global_rank(keys: DataFrame, cols: list[str], out: str = "r") -> DataFrame:
    """Exact global 1-based rank of DISTINCT key rows by ``cols``
    order, computed scale-out: range repartition → per-partition
    row_number → broadcast cumulative partition offsets. The only
    driver state is one count per partition."""
    spark = keys.sparkSession
    try:
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        npart = spark.sparkContext.defaultParallelism
    p = (
        keys.repartitionByRange(npart, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid assignment for both passes
    )
    counts = {r["_pid"]: r["n"] for r in p.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return p.withColumn(
        out, (F.row_number().over(w) + off[F.col("_pid")]).cast("bigint")
    ).drop("_pid")


def repeated_spans_sa(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    rerank_threshold: int = 1 << 62,
) -> DataFrame:
    """All positions whose ``window``-token span occurs ≥ 2 times in
    the corpus (any document, including intra-document repeats —
    the upgrade over span_scrub's cross-document distinct-df count),
    found WITHOUT materializing a single n-gram string.

    ``window`` must be a power of two (prefix doubling lands exactly
    on it). Output: (doc_id, pos, n_dup) with pos 0-based and n_dup
    the total occurrence count of the span."""
    assert window >= 2 and (window & (window - 1)) == 0, "window must be a power of 2"
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_ws(F.lower(F.col(text_col)))).alias("pos", "tk"),
    ).localCheckpoint(eager=False)
    lens = toks.groupBy("doc_id").agg(F.max("pos").alias("max_pos"))
    tok_rank = global_rank(toks.select("tk").distinct(), ["tk"])
    cur = toks.join(tok_rank, toks["tk"] == tok_rank["tk"]).select(
        "doc_id", "pos", "r"
    )
    # driver-side UPPER BOUND on the current rank values (exact after
    # a re-rank, the arithmetic product bound after a combine): while
    # (B+1)² stays inside int64, the (r, r2) pair can be combined
    # INJECTIVELY as r·(B+2) + r2 — equality classes are identical to
    # a re-rank's but it costs ZERO extra shuffles. The distributed
    # re-rank remains the overflow path: it compresses ranks back to
    # ≤ #positions, which is how the construction stays exact at any
    # corpus size (small vocabularies — including this corpus — never
    # need it; a 100 TB corpus re-ranks every couple of rounds).
    # ``rerank_threshold`` exists for tests to force the re-rank path
    # — both paths produce identical equality classes by construction
    # and tests/test_suffix.py pins the equivalence.
    bound = int(tok_rank.agg(F.max("r")).collect()[0][0] or 0)
    k = 1
    while k < window:
        # rank of the suffix k positions to the right, seen from pos
        shifted = cur.select(
            "doc_id", (F.col("pos") - k).alias("pos"), F.col("r").alias("r2")
        )
        paired = cur.join(shifted, ["doc_id", "pos"], "left").fillna(
            {"r2": 0}  # sentinel: past end of document
        )
        if (bound + 2) * (bound + 2) < rerank_threshold:
            cur = paired.select(
                "doc_id",
                "pos",
                (F.col("r") * (bound + 2) + F.col("r2")).alias("r"),
            )
            bound = bound * (bound + 2) + bound + 1
        else:
            pair_rank = global_rank(
                paired.select("r", "r2").distinct(), ["r", "r2"], out="nr"
            )
            cur = (
                paired.join(pair_rank, ["r", "r2"])
                .select("doc_id", "pos", F.col("nr").alias("r"))
                .localCheckpoint(eager=False)  # truncate the doubling lineage
            )
            bound = int(pair_rank.agg(F.max("nr")).collect()[0][0] or 0)
        k *= 2
    dup = cur.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_dup"))
    return (
        cur.join(dup, "r")
        .filter(F.col("n_dup") >= 2)
        .join(lens, "doc_id")
        # full-window spans only: the span must fit inside the doc
        .filter(F.col("pos") + window - 1 <= F.col("max_pos"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "n_dup")
    )
