"""Distributed Lloyd k-means over the FULL corpus — the scale
counterpart of ``operators/knn.py::kmeans_centroids_int`` (which
trains on a bounded driver sample, the FAISS norm for quantizer
training). When the clustering itself is the product — corpus
structure maps, cluster-balanced subset selection, SemDeDup-style
curation at trillion-token scale — the sample cap becomes a quality
ceiling, and the textbook answer is Lloyd over the whole relation
with the centroid state (k × dim integers) on the driver.

Spark shape, per iteration:
- assignment: broadcast the k×dim integer centroid matrix inside an
  Arrow-batched UDF closure (``ivf_cells_int_udf`` — the same kernel
  the IVF index uses, so cluster semantics match the quantizer
  exactly) — map-side, no shuffle;
- update: one ``groupBy(cell)`` with ``count`` plus ``dim``
  ``SUM(element_at(xv, d))`` aggregates — JVM-side map-partial
  aggregation, so the shuffle per iteration is k × (dim+1) longs per
  map partition, independent of corpus size; the driver then holds
  exactly k rows.

At 100 TB: T iterations = T cached scans + T tiny shuffles; driver
state is O(k·dim) — never O(rows). The input projection (id, vec,
scaled ints) is persisted across iterations so the parquet scan and
the float→int conversion are paid once.

Exactness (the reason hashes match a SQL engine bit-for-bit):
points enter the integer domain as floor(x_d · 10^4) (exact for any
float32), assignment is argmin of int64 Σ(x−c)² with ties to the
smallest cell id, and the centroid update is floor division of an
int64 per-dimension sum by the cluster count — every step
order-independent. The DuckDB oracle unrolls the identical
iterations (``queries/knn.py::_ivf_cte`` with the sample LIMIT set
past the corpus size, i.e. "the sample is the corpus").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from queryengine_spark.operators.knn import ivf_cells_int_udf


def scaled_int_vec(vec_col: str) -> F.Column:
    """array<float> → array<bigint> of floor(x·10^4): the shared
    fixed-point domain of every k-means in this package (JVM-side
    ``transform``, no Python)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(10000.0)).cast("bigint"),
    )


def kmeans_fit_distributed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    dim: int,
) -> list[list[int]]:
    """Train k centroids with ``iters`` Lloyd iterations over EVERY
    row of ``df`` (wrong-dimension vectors dropped). Initialization:
    the ``k`` smallest-id vectors — deterministic and identical to
    the oracle's ``ORDER BY id LIMIT k``. Returns the integer
    centroid matrix (cell id = list index)."""
    pts = (
        df.filter(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            scaled_int_vec(vec_col).alias("xv"),
        )
        .persist()
    )
    try:
        seeds = pts.orderBy("id").limit(k).select("xv").collect()
        cents = [list(r["xv"]) for r in seeds]
        if not cents:
            return []
        sum_aggs = [
            F.sum(F.element_at("xv", d + 1)).cast("bigint").alias(f"s{d}")
            for d in range(dim)
        ]
        for _ in range(iters):
            assign = ivf_cells_int_udf(cents, 1)
            stats = (
                pts.select(
                    F.element_at(assign(F.col("v")), 1).alias("cell"), "xv"
                )
                .groupBy("cell")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n"), *sum_aggs)
                .collect()
            )
            nxt = [list(c) for c in cents]  # empty cell keeps its centroid
            for r in stats:
                n = int(r["n"])
                # Python // floors like the SQL twin's integer S // n
                # (both floor toward -inf; no double round-trip, so
                # the match holds even past 2^53 sums)
                nxt[int(r["cell"])] = [int(r[f"s{d}"]) // n for d in range(dim)]
            cents = nxt
        return cents
    finally:
        pts.unpersist()


def kmeans_assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[list[int]],
    dim: int,
) -> DataFrame:
    """(id, cell) for every row of ``df`` under trained ``cents`` —
    the same nearest-centroid kernel as training, so the final
    assignment is the (iters+1)-th Lloyd assignment exactly."""
    assign = ivf_cells_int_udf(cents, 1)
    return df.filter(F.size(F.col(vec_col)) == dim).select(
        F.col(id_col),
        F.element_at(assign(F.col(vec_col)), 1).cast("int").alias("cell"),
    )
