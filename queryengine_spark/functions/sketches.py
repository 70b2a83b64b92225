"""Distinct-count sketching that is deterministic AND engine-portable.

HLL implementations differ across engines (Spark's approx_count_distinct
can never hash-match another system), so the oracle-checkable sketch
here is KMV (k-minimum values): hash every element with md5, keep the
k smallest distinct hashes per group, and estimate

    distinct ≈ (k - 1) / frac(h_(k))

where frac maps the k-th smallest hash into (0, 1). Everything is
md5-hex + fixed-order double arithmetic, so Spark and DuckDB produce
bit-identical estimates. At 100 TB the k smallest hashes per group are
a tiny mergeable state (min-k is an algebraic aggregate), giving
distinct counts over arbitrary group-bys in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
#: hex digits of the hash used for the fraction (16^-8 ≈ 2.3e-10
#: resolution — far below any k-th-min spacing we care about)
_FRAC_DIGITS = 8


def hash_fraction(hash_col: str) -> Column:
    """Map an md5 hex string into (0,1): value of its first 8 nibbles
    / 16^8, built as a fixed-order sum so any IEEE engine computes the
    same double."""
    expr = None
    for i in range(1, _FRAC_DIGITS + 1):
        term = F.expr(
            f"(position(substr({hash_col}, {i}, 1) IN '{_HEX}') - 1) * {16.0 ** -i!r}"
        )
        expr = term if expr is None else expr + term
    return expr


def sql_hash_fraction(hash_col: str) -> str:
    """DuckDB twin of :func:`hash_fraction` (same association order)."""
    terms = [
        f"(strpos('{_HEX}', substr({hash_col}, {i}, 1)) - 1) * {16.0 ** -i!r}"
        for i in range(1, _FRAC_DIGITS + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def kmv_distinct_estimate(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, kmv_estimate): KMV distinct-count estimate of
    ``value_col`` per group. Groups with fewer than k distinct values
    fall back to their exact count (the sketch state already holds
    every hash)."""
    hashed = (
        df.select(F.col(group_col).alias("grp"), F.md5(F.col(value_col)).alias("h"))
        .filter(F.col("h").isNotNull())  # NULL values are not distinct
        # elements: they would rank first (Spark NULLS FIRST) but last
        # in DuckDB, and inflate n_distinct — drop before ranking.
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.min(F.when(F.col("rn") == k, hash_fraction("h"))).alias("kth_frac"),
    )
    est = F.when(
        F.col("n_distinct") < k, F.col("n_distinct").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("kth_frac"))
    return stats.select(
        F.col("grp").alias(group_col),
        (F.floor(est * 10000.0 + 0.5) / 10000.0).alias("kmv_estimate"),
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bucket_width: float = 100.0,
) -> DataFrame:
    """Mergeable fixed-bucket histogram quantile estimates per group.

    Exact percentiles need a per-group sort (or Spark's interpolating
    percentile aggregate, whose float behavior no other engine
    reproduces). The scale-and-parity-friendly sketch: floor-bucket
    every value (one projection), count per (group, bucket) — a
    mergeable partial aggregate — and report, for each requested
    percentile p, the LOWER BOUND of the first bucket whose cumulative
    count reaches ceil(p * n). Deterministic integer arithmetic end to
    end, so any engine agrees bit-for-bit; precision is bucket_width,
    the classic histogram trade (state per group = value range /
    bucket_width, independent of row count)."""
    b = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    hist = (
        # NULL values would bucket to NULL and sort NULLS FIRST in
        # Spark but NULLS LAST in DuckDB (cross-engine divergence in
        # the cumulative sums) besides inflating n — standard quantile
        # semantics exclude them
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), b.alias("b"))
        .groupBy("grp", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("b").asc())
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("grp"))
    )
    aggs = []
    for p in percentiles:
        tag = str(round(p * 100))  # int() would truncate 0.29*100=28.999…
        hit = F.when(
            F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("b")
        )
        aggs.append(
            (F.min(hit) * F.lit(bucket_width)).alias(f"p{tag}_lo")
        )
    return cum.groupBy("grp").agg(
        F.max("n").alias("n_rows"), *aggs
    ).select(F.col("grp").alias(group_col), "n_rows", *[f"p{round(p * 100)}_lo" for p in percentiles])


def sql_histogram_quantiles(
    table: str,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bucket_width: float = 100.0,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles`."""
    cols = ", ".join(
        f"MIN(CASE WHEN cum >= ceil({p!r} * n) THEN b END) * {bucket_width!r} AS p{round(p * 100)}_lo"
        for p in percentiles
    )
    return f"""
WITH hist AS (
  SELECT {group_col} AS grp, CAST(floor({value_col} / {bucket_width!r}) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT grp, b, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY b ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM hist
)
SELECT grp AS {group_col}, CAST(MAX(n) AS BIGINT) AS n_rows, {cols}
FROM cum GROUP BY grp
"""
