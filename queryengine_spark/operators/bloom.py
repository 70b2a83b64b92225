"""Bloom-filter pre-filtered semi/anti joins.

The 100 TB decontamination / membership problem: filter a huge fact
relation by membership of a key in a large build-side set. A broadcast
semi-join works until the build side outgrows the broadcast limit; a
shuffle join pays a full exchange OF THE FACT SIDE. The Bloom pattern
keeps the exchange bounded:

1. build side → k hash positions per key (JVM ``xxhash64``, k seeds)
   → bitmap WORDS via ``groupBy(word_idx).agg(bit_or(bit))`` — a
   partial-aggregated shuffle whose output is at most m/64 rows
   regardless of build cardinality;
2. the ≤ m/64 (word_idx, word) rows — a FIXED-size bitmap (default
   2^22 bits = 512 KiB) — collect to the driver and broadcast as one
   numpy array;
3. probe side computes its k positions JVM-side too; one Arrow UDF
   tests the bits (pure bitmap loads, no hashing in Python);
4. Bloom has NO false negatives, so an exact residual join on the
   survivors (now small enough to broadcast / cheaply shuffle)
   reproduces the plain join EXACTLY — results are bit-identical to
   ``left_semi``/``left_anti``, which is what the equivalence tests
   assert. False positives only cost residual work, never
   correctness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_M_BITS = 1 << 22  # 512 KiB bitmap
DEFAULT_K = 5


def _positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key — JVM-side xxhash64 with k
    seeds, so build and probe sides hash identically with no Python
    in the hash path."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits)) for seed in range(k)]
    )


def build_bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> np.ndarray:
    """Aggregate the build side into a packed uint64 bitmap. The
    shuffle output and the driver collect are both ≤ m_bits/64 rows —
    constant in build-side cardinality."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    words = (
        keys.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # pyspark's shiftleft() helper takes only a literal shift;
            # the SQL form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        # JVM longs are signed; reinterpret the two's-complement bits
        bitmap[r["w"]] = np.uint64(r["word"] & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def might_contain_udf(bc):
    """Arrow UDF testing k bit positions against a broadcast uint64
    bitmap — pure bitmap loads, no hashing Python-side (positions are
    computed JVM-side by :func:`_positions`)."""

    @F.pandas_udf(BooleanType())
    def might_contain(pos_arrays: pd.Series) -> pd.Series:
        bm = bc.value
        out = np.empty(len(pos_arrays), dtype=bool)
        for i, posns in enumerate(pos_arrays):
            p = np.asarray(posns, dtype=np.int64)
            out[i] = bool(
                np.all(bm[p >> 6] >> (p.astype(np.uint64) & np.uint64(63)) & np.uint64(1))
            )
        return pd.Series(out)

    return might_contain


def bloom_join(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
    how: str = "left_semi",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Semi/anti join of ``probe`` against ``build`` keys with a Bloom
    pre-filter. Output is EXACTLY ``probe.join(build, …, how)`` — the
    residual join removes Bloom false positives (semi: only survivors
    are exactly joined; anti: bloom-negative rows are definite
    non-members and pass through, only survivors need the exact
    anti-check)."""
    if how not in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"bloom_join supports left_semi/left_anti, got {how!r}")
    bitmap = build_bloom_bitmap(build.select(build_col), build_col, m_bits, k)
    bc = probe.sparkSession.sparkContext.broadcast(bitmap)
    might_contain = might_contain_udf(bc)

    flagged = probe.withColumn(
        "__bloom_hit", might_contain(_positions(F.col(probe_col), m_bits, k))
    )
    build_keys = build.select(build_col).distinct()
    if how in ("left_semi", "leftsemi"):
        survivors = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
        return survivors.join(
            build_keys, survivors[probe_col] == build_keys[build_col], "left_semi"
        )
    # anti: definite non-members skip the residual entirely
    negatives = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    checked = candidates.join(
        build_keys, candidates[probe_col] == build_keys[build_col], "left_anti"
    )
    return negatives.unionByName(checked)
