"""Mergeable frequency/cardinality sketches over token streams:
Count-Min Sketch (point-frequency upper bounds, Cormode &
Muthukrishnan 2005) and HyperLogLog (distinct counting, Flajolet et
al. 2007) — the classic bounded-state summaries a 100 TB corpus
profile runs instead of exact GROUP BYs.

Spark shape: both sketches are plain aggregations —
- CMS: each token contributes ``depth`` (row, bucket) increments;
  the counter table is a groupBy over at most depth x width cells,
  so the shuffle is O(d*w) regardless of corpus size, with map-side
  partial aggregation doing the heavy fold. Point queries join the
  (tiny, broadcast) counter table.
- HLL: register index / rank come from md5 bits per token; registers
  are ``max`` aggregations over at most m=2^p cells per group. The
  register table IS the mergeable state (max is idempotent), so the
  same plan incrementally folds new partitions at scale.

Cross-engine determinism: hashes are md5-hex arithmetic (shared
convention, functions/sketches.py); rank uses ``bin()`` string
length (both engines define bin(BIGINT) identically) instead of
log2(); the HLL harmonic sum is an EXACT BIGINT in 2^-50 units
(register rank <= 49 < 50, so every term 2^(50-rank) is integral);
the only floating ops are one multiply chain and one divide at the
end, identical IEEE expressions on both engines. No ln()-based
small-range correction in the contract output — the raw estimate
and the zero-register count are emitted so callers (or a production
wrapper) can apply linear counting; ln() is not IEEE-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: CMS geometry: 4 rows x 1024 buckets. Error bound: overestimate
#: <= e*N/w with prob 1 - e^-d; at w=1024 that is ~0.27% of the
#: stream length per probe, far below the heavy-hitter gaps.
CMS_DEPTH = 4
CMS_WIDTH = 1024

#: HLL precision: p=12 -> m=4096 registers, ~1.04/sqrt(m) = 1.6% rse
HLL_P = 12
HLL_M = 1 << HLL_P
#: alpha_m for m >= 128 (Flajolet et al.): both engines evaluate the
#: identical literal expression to the identical double
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def cms_bucket(term: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row`` bucket of ``term``: 32-bit slice of
    md5('<row>:'||term) mod width — engine-portable integer hashing."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), term)), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(width))


def cms_counters(
    tokens: DataFrame,
    term_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch itself: (row, bucket, cnt) — at most depth*width
    rows, built by one exploded groupBy with map-side combine."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_bucket(F.col(term_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rb")
    return (
        tokens.select(rows)
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    term_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``probes``: min over the depth
    counters each probe hashes to. Returns (term, est). The counter
    table is broadcast — a point query never shuffles the corpus."""
    pr = probes.select(F.col(term_col).alias("term")).distinct()
    pb = pr.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col("term"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("term", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        pb.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def hll_registers(
    tokens: DataFrame,
    group_col: str,
    term_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL register table (group, idx, rho): idx = low p
    bits of a 60-bit md5 slice, rho = leading-zero rank of the
    remaining 60-p bits (+1), via bin()-length — no log2. ``max`` per
    register makes this the mergeable sketch state."""
    m = 1 << p
    h60 = F.conv(F.substring(F.md5(F.col(term_col)), 1, 15), 16, 10).cast("bigint")
    rem_bits = 60 - p
    df = tokens.select(
        F.col(group_col).alias("grp"), h60.alias("h60")
    ).select(
        "grp",
        F.pmod(F.col("h60"), F.lit(m)).alias("idx"),
        F.expr(f"h60 div {m}").alias("rem"),
    )
    rho = F.when(F.col("rem") > 0, F.lit(rem_bits + 1) - F.length(F.bin("rem"))).otherwise(
        F.lit(rem_bits + 1)
    )
    return (
        df.select("grp", "idx", rho.cast("int").alias("rho"))
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = HLL_P,
    alpha: float = HLL_ALPHA,
) -> DataFrame:
    """Raw HLL estimate per group from a register table: harmonic
    mean over all m registers (absent ones count 2^0=1), summed as
    EXACT 2^-50-unit BIGINTs. Returns
    (grp, est_raw, used_registers)."""
    m = 1 << p
    scaled = F.expr("shiftleft(CAST(1 AS BIGINT), 50 - rho)")
    agg = registers.groupBy("grp").agg(
        F.sum(scaled).alias("s_used"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
    )
    full_sum = F.col("s_used") + (F.lit(m) - F.col("used")) * F.expr(
        "shiftleft(CAST(1 AS BIGINT), 50)"
    )
    # alpha * m^2 * 2^50 / sum — identical literal expression in SQL
    est = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(1 << 50))
        / full_sum.cast("double")
    )
    return agg.select(
        "grp",
        F.floor(est * F.lit(1000.0) + F.lit(0.5)).cast("bigint").alias("est_milli"),
        "used",
    ).select(
        "grp", (F.col("est_milli") / F.lit(1000.0)).alias("est_raw"), "used"
    )
