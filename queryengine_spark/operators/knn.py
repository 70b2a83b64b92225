"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query set ⋈ candidate set (queries broadcast when small), cosine as
  a JVM column expression, per-query top-k via WindowGroupLimit.
- lsh_bucketed_topk: single-table sign-test buckets (element
  comparisons as hyperplane surrogates). Cheap but low-recall on
  near-isotropic data — kept as the pair source for embedding
  near-dup, where missing some pairs is acceptable.
- srp_bucketed_topk: the tuned ANN path — multi-table signed sparse
  random projections (Achlioptas-style ±1 hyperplanes, 16 nonzeros
  per bit, seeded so Spark and any SQL oracle compute the identical
  buckets) with Hamming≤1 multiprobe on the query side. Measured at
  sf0.1 (2k near-isotropic 64-dim vectors): recall@3 = 0.93 while
  scoring 0.45 of the brute-force pairs; on clustered real
  embeddings the candidate fraction drops much further.

At 100 TB the candidate side stays partitioned by (table, bucket) —
an equi-join AQE can skew-split; multi-table = n_tables× index rows,
the classic LSH memory/recall trade.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from queryengine_spark.functions.numeric import fround
from queryengine_spark.functions.similarity import cosine_similarity
from queryengine_spark.operators.topk import grouped_topk


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rn),
    self-pairs excluded, ties broken by neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def hard_negative_mining(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    pos_threshold: float = 0.30,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Contrastive-training hard-negative mining (the InfoNCE /
    embedding-model data-prep step): for each anchor, the top-k
    HIGHEST-cosine candidates strictly below ``pos_threshold`` —
    neighbors at or above it are presumed positives / near-dups of
    the anchor, and training on them as negatives would be label
    noise — plus the per-anchor count of excluded presumed
    positives. Returns (query_id, neighbor_id, cosine, rn,
    n_pos_excluded), ties broken by neighbor id.

    Scale: this is the exact small-N evaluation twin (bounded
    anchor sample × corpus, same as brute_force_topk); the
    production path generates candidates through the IVF/SRP index
    joins in this module and applies the identical
    threshold-exclusion + top-k on the candidate set."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
        .select("query_id", "neighbor_id", "cosine")
        # the scored relation feeds TWO consumers (positive counts,
        # negative top-k) and its cosine column is referenced by both
        # a filter and the output — without the checkpoint barrier
        # Catalyst re-evaluates the Arrow cosine kernel three times
        .localCheckpoint(eager=False)
    )
    n_pos = (
        scored.filter(F.col("cosine") >= F.lit(pos_threshold))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_pos_excluded"))
    )
    neg = grouped_topk(
        scored.filter(F.col("cosine") < F.lit(pos_threshold)),
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return (
        neg.join(F.broadcast(n_pos), "query_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            fround("cosine", 6).alias("cosine"),
            "rn",
            F.coalesce("n_pos_excluded", F.lit(0)).alias("n_pos_excluded"),
        )
    )


def lsh_bucket(
    vec_col: Column | str, n_bits: int = 4, dim: int = 64, offset: int = 0
) -> Column:
    """Sign-test LSH bucket id in [0, 2^n_bits): bit i compares
    element offset+i+1 against element offset+i+1+dim/2 (1-based).
    Deterministic, no arithmetic on floats (comparison only), portable
    to any SQL engine. Distinct ``offset`` values give independent
    hash tables (multi-probe recall boosting)."""
    assert offset + n_bits <= dim // 2, "bucket bits exceed vector half"
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    half = dim // 2
    total = F.lit(0)
    for i in range(n_bits):
        bit = (
            F.element_at(v, offset + i + 1) > F.element_at(v, offset + i + 1 + half)
        ).cast("int")
        total = total + bit * F.lit(2 ** (n_bits - 1 - i))
    return total


#: fixed seed: the planes are part of the operator definition — the
#: SQL twin embeds the same ±1 coefficients as literals.
SRP_SEED = 20260813


def srp_planes(
    n_planes: int, dim: int = 64, nnz: int = 16, seed: int = SRP_SEED
) -> list[list[tuple[int, float]]]:
    """``n_planes`` sparse ±1 hyperplanes over ``dim`` dims, ``nnz``
    nonzeros each: plane -> [(1-based column, ±1.0), ...] sorted by
    column (the summation order both engines must share)."""
    rng = np.random.default_rng(seed)
    planes = []
    for _ in range(n_planes):
        cols = rng.choice(dim, size=nnz, replace=False)
        signs = rng.choice([-1.0, 1.0], size=nnz)
        planes.append(sorted(zip((int(c) + 1 for c in cols), (float(s) for s in signs))))
    return planes


def _srp_bucket_sql(elem, planes, n_bits: int, table: int) -> str:
    """Bucket id in [0, 2^n_bits) for one hash table: bit i is the
    sign of the left-associated double sum Σ ±v[col] over plane
    ``table*n_bits + i``. ``elem(col)`` renders the engine-specific
    double-valued element access; the summation order is fixed so any
    IEEE engine computes the identical bit."""
    bits = []
    for i in range(n_bits):
        s = None
        for col, sign in planes[table * n_bits + i]:
            term = f"({elem(col)} * {sign!r})"
            s = term if s is None else f"({s} + {term})"
        bits.append(f"(CASE WHEN {s} > 0.0 THEN {1 << (n_bits - 1 - i)} ELSE 0 END)")
    return " + ".join(bits)


def srp_bucket(vec_col: str, planes, n_bits: int, table: int) -> Column:
    """Spark bucket expression as pure JVM SQL (built as one string →
    a single py4j call; constructing the ~2k-node tree out of Column
    objects costs >20 s of py4j round-trips). NOTE: kept for
    single-table use; for the multi-table path prefer
    :func:`srp_buckets_udf` — 128 of these trees make the Catalyst
    optimizer itself the bottleneck (~10 s per plan at any scale)."""
    return F.expr(
        _srp_bucket_sql(
            lambda c: f"CAST(element_at({vec_col}, {c}) AS DOUBLE)",
            planes, n_bits, table,
        )
    )


def sql_srp_bucket(vec_expr: str, planes, n_bits: int, table: int) -> str:
    """DuckDB twin of :func:`srp_bucket` — same coefficients, same
    left-associated summation order (``vec_expr`` is already DOUBLE[])."""
    return _srp_bucket_sql(lambda c: f"{vec_expr}[{c}]", planes, n_bits, table)


def srp_buckets_udf(planes, n_bits: int, n_tables: int, dim: int | None = None):
    """Arrow-batched pandas UDF: vector → array of ``n_tables``
    bucket ids. Accumulates each plane sum left-associated in float64
    (elementwise numpy adds in term order), which is bit-identical to
    the SQL twin's ``((t1 + t2) + t3)...`` — float32→float64 casts are
    exact and both engines run the same IEEE op sequence. One compact
    UDF node keeps the Catalyst plan small where 128 inline plane-sum
    trees made optimization itself the bottleneck."""
    # guard against ragged batches: one over- or under-length vector
    # must NULL its own row, not kill np.stack for the whole batch.
    # With the true ``dim`` known the check is exact; without it,
    # accept len >= max referenced column and slice — only columns up
    # to max_col are ever read, and slicing keeps the stack rectangular.
    max_col = max(col for plane in planes for col, _ in plane)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _buckets(vs: pd.Series) -> pd.Series:
        # NULL / wrong-length vectors → NULL bucket array (the JVM
        # element_at expression this replaces yielded NULL; the
        # downstream posexplode then drops the row instead of the
        # whole query dying in the UDF)
        vals = [
            None
            if v is None
            or (len(v) != dim if dim is not None else len(v) < max_col)
            else np.asarray(v[:max_col], dtype=np.float64)
            for v in vs
        ]
        good = [i for i, v in enumerate(vals) if v is not None]
        out_all: list[np.ndarray | None] = [None] * len(vals)
        if good:
            V = np.stack([vals[i] for i in good])
            n = len(good)
            out = np.zeros((n, n_tables), dtype=np.int32)
            for t in range(n_tables):
                for i in range(n_bits):
                    acc = np.zeros(n, dtype=np.float64)
                    for col, sign in planes[t * n_bits + i]:
                        acc = acc + sign * V[:, col - 1]
                    out[:, t] |= (acc > 0.0).astype(np.int32) << (n_bits - 1 - i)
            for j, i in enumerate(good):
                out_all[i] = out[j]
        return pd.Series(out_all)

    return _buckets


def srp_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_bits: int = 8,
    n_tables: int = 16,
    nnz: int = 16,
    probe: int = 1,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via multi-table SRP LSH with
    Hamming≤``probe`` multiprobe (probe ∈ {0, 1}).

    Candidate side emits one (table, bucket) row per hash table;
    query side additionally probes every bucket within Hamming
    distance ``probe`` (bit-flip XOR masks). Pairs colliding in ≥1
    table are deduplicated before the one cosine evaluation, then
    per-query top-k via WindowGroupLimit. Output:
    (query_id, neighbor_id, cosine, rn).
    """
    planes = srp_planes(n_bits * n_tables, dim=dim, nnz=nnz)
    masks = [0] + ([1 << j for j in range(n_bits)] if probe >= 1 else [])

    buckets_udf = srp_buckets_udf(planes, n_bits, n_tables, dim=dim)

    def tagged(df: DataFrame) -> DataFrame:
        bucketed = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            buckets_udf(F.col(vec_col)).alias("bs"),
        )
        return bucketed.select(
            "id", "vec", F.posexplode("bs").alias("tbl", "bucket")
        )

    c = tagged(candidates).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"), "tbl", "bucket"
    )
    q = tagged(queries).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        "tbl",
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"),
        F.col("bucket").alias("qb"),
    ).withColumn("bucket", F.col("qb").bitwiseXOR(F.col("mask")))
    pairs = (
        c.join(q.select("query_id", "q_vec", "tbl", "bucket"), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


#: fixed-point scale for the integer k-means domain: x_int =
#: floor(x * 10^4). Exact in float64 for |x| < 2^38, so float32
#: embeddings convert identically in Spark, Python and any SQL engine.
KMEANS_SCALE = 10_000.0


def _int_vec(v) -> list[int]:
    return [math.floor(float(x) * KMEANS_SCALE) for x in v]


def kmeans_centroids_int(
    sample: list[tuple[int, list[float]]],
    n_cells: int,
    iters: int,
    prescaled: bool = False,
) -> list[list[int]]:
    """Deterministic, engine-portable Lloyd k-means over a BOUNDED
    sample, entirely in scaled-integer arithmetic.

    - points: x_int_d = floor(x_d * 10^4) (exact in every engine);
    - assignment: nearest centroid by Σ_d (x_d - c_d)² over int64,
      ties to the smallest cell id — integer sums are
      order-independent, so no IEEE-summation-order pitfalls;
    - update: c_d = S_d // n (exact floor division; the SQL twin's
      floor(S::DOUBLE / n) is identical because |S| < 2^52 and a
      non-integer quotient is ≥ 1/n away from any integer, far
      beyond double rounding error);
    - empty cell: keeps its previous centroid.

    Returns ``n_cells`` centroid int-vectors; cell id = list index.
    ``sample`` must arrive sorted by id (init = first ``n_cells``
    points, matching the oracle's ORDER BY id LIMIT n) and must be
    RECTANGULAR — callers guard vector lengths before collecting
    (:func:`_collect_vec_sample`). ``prescaled=True`` means the
    sample vectors are ALREADY in the scaled-integer domain (e.g.
    coarse-quantizer residuals, r6) and must not be floor-scaled
    again; the rest of the arithmetic is identical — numpy's ``//``
    floors toward −inf for the negative sums residuals produce,
    exactly like the oracle's pymod formulation.

    Internally vectorized over int64 numpy (exact — integer argmin
    first-hit = smallest cell id, integer ``//`` floors exactly like
    Python's); semantics are bit-identical to the scalar formulation
    this replaced (pinned by the unchanged oracle hashes)."""
    if not sample:
        return []
    X = np.array(
        [
            v if prescaled else _int_vec(v)
            for _sid, v in sample
        ],
        dtype=np.int64,
    )
    C = X[: min(n_cells, len(X))].copy()
    k = len(C)
    for _ in range(iters):
        # (n, k) integer squared distances; argmin first-hit = the
        # smallest cell id among ties
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)
        counts = np.bincount(best, minlength=k)
        S = np.zeros_like(C)
        np.add.at(S, best, X)
        nonzero = counts > 0
        C[nonzero] = S[nonzero] // counts[nonzero, None]
    return [[int(v) for v in row] for row in C]


def ivf_cells_int_udf(cent_ints: list[list[int]], nprobe: int):
    """Arrow-batched pandas UDF: vector → the ``nprobe`` nearest
    centroid CELL INDICES by squared distance in the scaled-integer
    domain (ties → smaller cell id). All-int64 arithmetic: the SQL
    twin's long-form GROUP BY sum computes the identical integers,
    so cell assignment is exactly engine-portable by construction."""
    C = np.asarray(cent_ints, dtype=np.int64)
    dim_c = C.shape[1] if C.size else 0

    @F.pandas_udf(ArrayType(IntegerType()))
    def _cells(vs: pd.Series) -> pd.Series:
        vals = [
            None
            if v is None or len(v) != dim_c
            else np.asarray(v, dtype=np.float64)
            for v in vs
        ]
        good = [i for i, v in enumerate(vals) if v is not None]
        out_all: list[np.ndarray | None] = [None] * len(vals)
        if not good:
            return pd.Series(out_all)
        V = np.stack([vals[i] for i in good])
        X = np.floor(V * KMEANS_SCALE).astype(np.int64)
        n = len(good)
        d2 = np.zeros((n, len(C)), dtype=np.int64)
        for j in range(len(C)):
            diff = X - C[j]
            d2[:, j] = (diff * diff).sum(axis=1)
        order = np.argsort(d2, axis=1, kind="stable")
        picked = order[:, :nprobe].astype(np.int32)
        for j, i in enumerate(good):
            out_all[i] = picked[j]
        return pd.Series(out_all)

    return _cells


def _collect_vec_sample(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n: int,
    dim: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Bounded smallest-id training sample honoring the module's
    malformed-row invariant (tests/test_knn_nulls.py: NULL /
    wrong-length vectors are silently skipped, never crash): the
    collect is padded slightly so skipping bad rows still yields
    ``n`` good ones when available. On a clean corpus this is exactly
    ``ORDER BY id LIMIT n`` — the oracle's sample — so parity holds;
    ``dim=None`` infers the dimension from the first collected
    vector."""
    rows = (
        candidates.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"))
        .filter(F.col(vec_col).isNotNull())
        .orderBy("sid")
        .limit(n + 16)
        .collect()
    )
    if dim is None and rows:
        # infer the corpus dimension as the MODAL length of the
        # window (ties → larger count, then longer vector) — the
        # first row could itself be the malformed one
        from collections import Counter

        counts = Counter(len(r["sv"]) for r in rows)
        dim = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
    out: list[tuple[int, list[float]]] = []
    for r in rows:
        v = r["sv"]
        if len(v) != dim:
            continue
        out.append((int(r["sid"]), [float(x) for x in v]))
        if len(out) >= n:
            break
    return out


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
) -> DataFrame:
    """IVF-Flat approximate top-k: candidates are indexed by their
    nearest centroid (one cell each); each query probes its ``nprobe``
    nearest cells and scores only those candidates.

    The coarse quantizer is k-means TRAINED on a bounded sample: the
    ``sample_n`` smallest-id candidate vectors (an O(1) driver
    collect, independent of corpus size) run ``train_iters`` Lloyd
    iterations in exact scaled-integer arithmetic
    (:func:`kmeans_centroids_int`) — deterministic and
    engine-portable, so a SQL oracle unrolling the same iterations
    computes bit-identical centroids and cell assignments.
    ``train_iters=0`` degrades to the raw seeds (the ``n_cells``
    smallest-id vectors), the previous behavior.

    At 100 TB the cell index is the partitioning key: candidates
    shuffle once on cell, queries probe with a broadcast-sized
    centroid table, and the cell equi-join is AQE-skew-splittable.
    Output: (query_id, neighbor_id, cosine, rn).
    """
    scored = _ivf_scored(
        queries, candidates, id_col, vec_col,
        n_cells, nprobe, sample_n, train_iters,
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def _ivf_scored(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    nprobe: int,
    sample_n: int,
    train_iters: int,
) -> DataFrame:
    """The IVF candidate-generation core shared by ivf_topk and
    hard_negative_mining_ivf: cell-indexed candidates equi-joined
    with nprobe-exploded queries, cosine-scored."""
    sample = _collect_vec_sample(candidates, id_col, vec_col, max(sample_n, n_cells))
    cents = kmeans_centroids_int(sample, n_cells, train_iters)
    assign1 = ivf_cells_int_udf(cents, 1)
    assignp = ivf_cells_int_udf(cents, nprobe)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    return (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )


def hard_negative_mining_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    pos_threshold: float = 0.30,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
) -> DataFrame:
    """The PRODUCTION path of hard-negative mining: candidates come
    from the IVF cell join (each anchor scores only its nprobe
    nearest cells — O(corpus/n_cells · nprobe) pairs per anchor
    instead of O(corpus)), then the identical presumed-positive
    exclusion and top-k. n_pos_excluded counts positives among the
    PROBED candidates (the index's view — an anchor's near-dups
    land in its own cell with overwhelming probability, which is
    exactly why IVF recall is high for the near field). Same output
    schema as hard_negative_mining; at 100 TB the cell id is the
    shuffle key and the centroid table broadcasts."""
    scored = _ivf_scored(
        queries, candidates, id_col, vec_col,
        n_cells, nprobe, sample_n, train_iters,
    ).select("query_id", "neighbor_id", "cosine").localCheckpoint(
        eager=False  # same two-consumer / filter+output barrier
    )
    n_pos = (
        scored.filter(F.col("cosine") >= F.lit(pos_threshold))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_pos_excluded"))
    )
    neg = grouped_topk(
        scored.filter(F.col("cosine") < F.lit(pos_threshold)),
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return (
        neg.join(F.broadcast(n_pos), "query_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            fround("cosine", 6).alias("cosine"),
            "rn",
            F.coalesce("n_pos_excluded", F.lit(0)).alias("n_pos_excluded"),
        )
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. (query_id, neighbor_id, bucket, cosine, rn)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, n_bits, dim).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(vec_col, n_bits, dim).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", "bucket",
        fround("cosine", 6).alias("cosine"), "rn",
    )


def _assign_cells_int(X: np.ndarray, cents: list[list[int]]) -> np.ndarray:
    """Nearest coarse centroid per scaled-int row — integer Σ(x−c)²,
    ties to the smallest cell id (argmin first-hit), the exact twin
    of the oracle's row_number() ORDER BY dd, cid assignment."""
    C = np.asarray(cents, dtype=np.int64)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def pq_train_codebooks(
    sample: list[tuple[int, list[float]]],
    m: int,
    ksub: int,
    iters: int,
    dim: int,
    cents: list[list[int]] | None = None,
) -> list[list[list[int]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the space into
    ``m`` contiguous subspaces of dim/m dimensions and train an
    independent ``ksub``-centroid integer k-means per subspace on the
    same bounded smallest-id sample as the IVF coarse quantizer —
    fully engine-portable (:func:`kmeans_centroids_int`). Returns
    ``m × ksub × (dim//m)`` scaled-integer centroids.

    ``cents`` (r6): train on coarse-quantizer RESIDUALS x − c(x)
    instead of raw vectors — FAISS IVFPQ's actual semantics (Jégou
    §IV.B, "product quantization of residuals"). Residuals of a
    clustered corpus spread across the codebook's dynamic range
    where raw cluster members collapse onto near-identical codes, so
    8-bit codes resolve WITHIN clusters. Residuals are already in
    the scaled-int domain (difference of scaled ints) — trained with
    ``prescaled=True``, never double-scaled."""
    assert dim % m == 0, f"dim={dim} must split evenly into m={m} subspaces"
    sub = dim // m
    if cents is not None:
        X = np.array([_int_vec(v) for _sid, v in sample], dtype=np.int64)
        R = X - np.asarray(cents, dtype=np.int64)[_assign_cells_int(X, cents)]
        sample = [
            (sid, R[i]) for i, (sid, _v) in enumerate(sample)
        ]
        books = []
        for s in range(m):
            sliced = [(sid, r[s * sub : (s + 1) * sub]) for sid, r in sample]
            books.append(kmeans_centroids_int(sliced, ksub, iters, prescaled=True))
        return books
    books = []
    for s in range(m):
        sliced = [(sid, v[s * sub : (s + 1) * sub]) for sid, v in sample]
        books.append(kmeans_centroids_int(sliced, ksub, iters))
    return books


def pq_codes_udf(
    books: list[list[list[int]]], cents: list[list[int]] | None = None
):
    """Arrow UDF: vector → its ``m`` PQ codes (per-subspace nearest
    codebook centroid by scaled-integer squared distance, ties to the
    smallest code — np.argmin first-hit, the exact twin of the SQL
    ``row_number() ORDER BY dd, cid`` rank). NULL for NULL /
    wrong-dimension vectors.

    With ``cents`` (r6 residual encoding) the UDF takes a second
    column — the vector's coarse CELL — and encodes the residual
    x − cents[cell] instead of x, matching codebooks trained with
    the same ``cents``."""
    B = np.asarray(books, dtype=np.int64)  # (m, ksub, sub)
    m, _ksub, sub = B.shape
    dim = m * sub
    C = None if cents is None else np.asarray(cents, dtype=np.int64)

    def _encode(vals, cells=None):
        good = [i for i, v in enumerate(vals) if v is not None]
        out: list[np.ndarray | None] = [None] * len(vals)
        if not good:
            return out
        X = np.floor(np.stack([vals[i] for i in good]) * KMEANS_SCALE).astype(np.int64)
        if C is not None:
            X = X - C[np.asarray([cells[i] for i in good], dtype=np.int64)]
        codes = np.empty((len(good), m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * sub : (s + 1) * sub]  # (n, sub)
            diff = Xs[:, None, :] - B[s][None, :, :]  # (n, ksub, sub)
            d2 = (diff * diff).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)  # first hit = smallest cid
        for j, i in enumerate(good):
            out[i] = codes[j]
        return out

    def _clean(vs: pd.Series):
        return [
            None if v is None or len(v) != dim else np.asarray(v, dtype=np.float64)
            for v in vs
        ]

    if C is None:

        @F.pandas_udf(ArrayType(IntegerType()))
        def _codes(vs: pd.Series) -> pd.Series:
            return pd.Series(_encode(_clean(vs)))

        return _codes

    @F.pandas_udf(ArrayType(IntegerType()))
    def _codes_resid(vs: pd.Series, cell: pd.Series) -> pd.Series:
        vals = _clean(vs)
        cells = [
            int(c) if c is not None and not pd.isna(c) else -1
            for c in cell.tolist()
        ]
        vals = [
            None if not 0 <= cells[i] < len(C) else v
            for i, v in enumerate(vals)
        ]
        return pd.Series(_encode(vals, cells=cells))

    return _codes_resid


def adc_score_udf(
    books: list[list[list[int]]], cents: list[list[int]] | None = None
):
    """Arrow UDF: (query_vec, codes) → approximate cosine via
    asymmetric distance computation: the candidate is reconstructed
    from its codebook centroids, all accumulation happens in exact
    int64 (scaled domain, order-independent), and the final
    dot/(‖q‖·‖recon‖) division is one double op — bit-identical to
    the SQL twin's SUM-over-dims formulation.

    With ``cents`` (r6 residual encoding) the UDF takes the
    candidate's CELL between the two and reconstructs
    cents[cell] + decode(codes) — the FAISS IVFPQ reconstruction."""
    B = np.asarray(books, dtype=np.int64)  # (m, ksub, sub)
    m, _ksub, sub = B.shape
    dim = m * sub
    CC = None if cents is None else np.asarray(cents, dtype=np.int64)

    def _score(qv, codes, cells=None):
        n = len(qv)
        out = np.full(n, np.nan)
        good = [
            i
            for i in range(n)
            if qv.iloc[i] is not None
            and len(qv.iloc[i]) == dim
            and codes.iloc[i] is not None
            and len(codes.iloc[i]) == m
            and (cells is None or 0 <= cells[i] < len(CC))
        ]
        if not good:
            return out
        Q = np.floor(
            np.stack([np.asarray(qv.iloc[i], dtype=np.float64) for i in good])
            * KMEANS_SCALE
        ).astype(np.int64)
        K = np.stack([np.asarray(codes.iloc[i], dtype=np.int64) for i in good])
        C = np.concatenate([B[s][K[:, s]] for s in range(m)], axis=1)  # (n, dim)
        if cells is not None:
            C = C + CC[np.asarray([cells[i] for i in good], dtype=np.int64)]
        dot = (Q * C).sum(axis=1)
        qn2 = (Q * Q).sum(axis=1)
        rn2 = (C * C).sum(axis=1)
        denom = np.sqrt(qn2.astype(np.float64)) * np.sqrt(rn2.astype(np.float64))
        ok = denom > 0
        score = np.where(ok, dot / np.where(ok, denom, 1.0), np.nan)
        for j, i in enumerate(good):
            out[i] = score[j]
        return out

    if CC is None:

        @F.pandas_udf("double")
        def _adc(qv: pd.Series, codes: pd.Series) -> pd.Series:
            return pd.Series(_score(qv, codes))

        return _adc

    @F.pandas_udf("double")
    def _adc_resid(qv: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        cells = [
            int(c) if c is not None and not pd.isna(c) else -1
            for c in cell.tolist()
        ]
        return pd.Series(_score(qv, codes, cells=cells))

    return _adc_resid


def ivf_topk_filtered(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    key_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
) -> DataFrame:
    """METADATA-FILTERED IVF-Flat top-k (r6) — the production vector-
    search shape (per-query attribute predicates): the filter key is
    composed INTO the index key, so the probe equi-join is on
    (cell, key) and excluded candidates are never scored — true
    PRE-filtering, not score-then-discard post-filtering (which
    starves k when the predicate is selective and wastes compute when
    it is not). Here the predicate is key equality with the query's
    own key (e.g. "nearest neighbors with MY label/lang/tenant");
    at 100 TB (cell, key) is the partition key and the join remains
    AQE-skew-splittable. Same trained quantizer as :func:`ivf_topk`.
    Output: (query_id, neighbor_id, cosine, rn)."""
    sample = _collect_vec_sample(candidates, id_col, vec_col, max(sample_n, n_cells))
    cents = kmeans_centroids_int(sample, n_cells, train_iters)
    assign1 = ivf_cells_int_udf(cents, 1)
    assignp = ivf_cells_int_udf(cents, nprobe)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(key_col).alias("fkey"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(key_col).alias("fkey"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, ["cell", "fkey"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def ivf_sq8_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
) -> DataFrame:
    """IVF + SCALAR-quantized codes (r7 — FAISS
    IndexIVFScalarQuantizer QT_8bit semantics): the trained IVF
    coarse quantizer shortlists candidates, and scoring reads 8-BIT
    per-dimension codes instead of raw vectors — the OTHER classic
    compression layer next to PQ (SQ8 keeps per-dim fidelity and
    needs no codebook training; PQ compresses harder).

    Training: per-dimension [vmin, vmax] over the same bounded
    smallest-id sample the coarse quantizer uses, in the module's
    scaled-integer domain (floor(v·10^4)). Encoding and ADC
    reconstruction are pure integer Column arithmetic —
    code_d = clip(⌊(x_d − vmin_d)·255 / Δ_d⌋, 0, 255),
    recon_d = vmin_d + ⌊code_d·Δ_d / 255⌋ — so the oracle replays
    them exactly (⌊·⌋ is FLOOR division on both engines; the only
    negative operand, an out-of-range candidate below vmin, clamps
    to 0 either way). Scoring is asymmetric (full-precision query ×
    reconstructed candidate), the FAISS ADC convention.

    At 100 TB this is the memory lever in its simplest form: a
    64-dim float64 vector is 512 bytes, its SQ8 code 64 bytes — the
    scoring join shuffles 1/8th the bytes with no codebook at all;
    the min/max table is 2·dim BIGINTs, broadcast-trivial. Output:
    (query_id, neighbor_id, cosine, rn).

    r8: split into :func:`sq8_train` / :func:`sq8_encode` /
    :func:`sq8_score` so the persistent artifact path
    (operators/annindex.py::write_sq8_index) shares the identical
    integer encode/reconstruct/score expressions — bit-parity between
    the in-session and from-index answers is by construction."""
    cents, vmin, vdiff = sq8_train(
        candidates, id_col, vec_col, n_cells, sample_n, train_iters
    )
    coded = sq8_encode(candidates, id_col, vec_col, cents, vmin, vdiff)
    return sq8_score(
        queries, coded, cents, vmin, vdiff, id_col, vec_col, k=k, nprobe=nprobe
    )


def sq8_train(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    sample_n: int,
    train_iters: int,
) -> tuple[list, list[int], list[int]]:
    """(centroids, vmin, vdiff): the full SQ8 training state — the
    coarse quantizer plus the per-dimension scalar ranges, both from
    the same bounded smallest-id sample."""
    sample = _collect_vec_sample(candidates, id_col, vec_col, max(sample_n, n_cells))
    cents = kmeans_centroids_int(sample, n_cells, train_iters)
    ints = [_int_vec(v) for _sid, v in sample[:sample_n]]
    vmin = [min(col) for col in zip(*ints)]
    vdiff = [max(col) - mn for col, mn in zip(zip(*ints), vmin)]
    return cents, vmin, vdiff


def _sq8_el(arr, i):
    return F.element_at(arr, (i + 1).cast("int"))


def sq8_encode(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list,
    vmin: list[int],
    vdiff: list[int],
) -> DataFrame:
    """(neighbor_id, cell, codes): 8-bit per-dimension codes in pure
    Column arithmetic — code_d = clip(⌊(x_d − vmin_d)·255 / Δ_d⌋,
    0, 255)."""
    assign1 = ivf_cells_int_udf(cents, 1)
    vminc = F.array(*[F.lit(int(m)) for m in vmin])
    vdiffc = F.array(*[F.lit(int(d_)) for d_ in vdiff])

    def _code(x, i):
        d_ = _sq8_el(vdiffc, i)
        raw = F.floor(((x - _sq8_el(vminc, i)) * 255) / d_).cast("bigint")
        return F.when(
            d_ > 0, F.least(F.lit(255), F.greatest(F.lit(0), raw))
        ).otherwise(F.lit(0))

    xi = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda v: F.floor(v * F.lit(KMEANS_SCALE)).cast("bigint"),
    )
    return candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
        xi.alias("xi"),
    ).select(
        "neighbor_id", "cell", F.transform("xi", _code).alias("codes")
    )


def sq8_score(
    queries: DataFrame,
    coded: DataFrame,
    cents: list,
    vmin: list[int],
    vdiff: list[int],
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 4,
) -> DataFrame:
    """ADC scoring tail over an (neighbor_id, cell, codes) relation —
    recon_d = vmin_d + ⌊code_d·Δ_d / 255⌋, asymmetric cosine against
    the full-precision query, WindowGroupLimit top-k."""
    assignp = ivf_cells_int_udf(cents, nprobe)
    vminc = F.array(*[F.lit(int(m)) for m in vmin])
    vdiffc = F.array(*[F.lit(int(d_)) for d_ in vdiff])

    def _recon(cd, i):
        d_ = _sq8_el(vdiffc, i)
        return (
            _sq8_el(vminc, i) + F.floor((cd * d_) / 255).cast("bigint")
        ) / F.lit(KMEANS_SCALE)

    c = coded.withColumn("rvec", F.transform("codes", _recon))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_vec", "rvec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def ivf_topk_range_filtered(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    attr_col: str,
    radius: int,
    bin_width: int,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
) -> DataFrame:
    """RANGE-predicate filtered IVF-Flat top-k (r7 — generalizes
    :func:`ivf_topk_filtered` beyond key equality): nearest neighbors
    among candidates with |attr_c − attr_q| ≤ radius (the "within ±R
    of my timestamp / price / version" shape). The pre-filter
    property is preserved through BIN COMPOSITION: the orderable
    attribute is quantized into bins of ``bin_width`` (integer
    division — the attribute contract is non-negative integers, where
    truncating and floor division agree across engines), the
    candidate index key is (cell, bin), and each query probes only
    the ⌈2R/W⌉+1 bins its window covers — candidates outside those
    bins are never joined (partition pruning on the attribute), and
    the exact |Δ| ≤ R check runs on two integers BEFORE any cosine
    arithmetic. Never score-then-discard. At 100 TB (cell, bin) is
    the partition key; bin_width ≈ radius keeps probe fan-out ≤ 3
    bins per (query, cell). Output: (query_id, neighbor_id, cosine,
    rn)."""
    sample = _collect_vec_sample(candidates, id_col, vec_col, max(sample_n, n_cells))
    cents = kmeans_centroids_int(sample, n_cells, train_iters)
    assign1 = ivf_cells_int_udf(cents, 1)
    assignp = ivf_cells_int_udf(cents, nprobe)
    w = int(bin_width)
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(attr_col).cast("bigint").alias("c_attr"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    ).withColumn("bin", F.expr(f"c_attr div {w}"))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col(attr_col).cast("bigint").alias("q_attr"),
            F.explode(assignp(F.col(vec_col))).alias("cell"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.expr(f"greatest(q_attr - {int(radius)}, 0) div {w}"),
                    F.expr(f"(q_attr + {int(radius)}) div {w}"),
                )
            ),
        )
    )
    scored = (
        c.join(q, ["cell", "bin"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # the exact window check: two integers, BEFORE the cosine
        .filter(F.abs(F.col("c_attr") - F.col("q_attr")) <= radius)
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
    m: int = 16,
    ksub: int = 256,
    dim: int = 64,
    pq_sample_n: int = 1024,
    rerank_r: int | None = None,
    residual: bool = True,
) -> DataFrame:
    """IVF-PQ approximate top-k: the IVF coarse quantizer shortlists
    candidates (``nprobe`` cells per query), PQ codes score them —
    the candidate VECTORS never join into the scoring stage, only
    their ``m`` small-int codes travel.

    ``residual=True`` (r6 default — FAISS IVFPQ's actual semantics,
    Jégou et al. §IV.B): codebooks train on and codes encode the
    coarse-quantizer RESIDUAL x − c(x); ADC reconstructs
    cents[cell] + decode(codes). Within a tight cluster raw vectors
    collapse onto near-identical codes (the documented 8-bit ranking
    noise); their residuals spread over the codebook's full dynamic
    range, so residual ADC resolves intra-cluster order
    (tests/test_knn_pq.py measures the lift on the clustered
    corpus). ``residual=False`` keeps the r3 raw-vector encoding for
    comparison.

    This is the memory/shuffle lever that matters at 100 TB: a 64-dim
    float64 vector is 512 bytes, its 16×8-bit PQ code is 16 bytes —
    the searchable index (cell + codes) is ~30× smaller than the raw
    vectors, so the scoring join shuffles 1/30th the bytes and a
    1000-executor scan holds the codebooks (m × ksub × sub ints)
    broadcast in cache. The coarse quantizer trains on the same
    256-vector sample as IVF-Flat (so cells match knn_ivf exactly);
    the finer codebooks train on a 1024-vector sample — both bounded
    driver collects, independent of corpus size.

    ``rerank_r``: the production pattern — ADC ranks a top-R
    shortlist per query, then ONLY those R rows join the full vector
    relation for an exact cosine re-rank (measured on the clustered
    test corpus: ADC-only recall@3 0.60, shortlist@32 contains the
    true top-3 with p=0.993, so re-rank recovers IVF-Flat recall
    while fetching 32 instead of |cell| full vectors per query).
    Quantization ranking noise is inherent — within a tight cluster
    all members look alike at 8-bit resolution; the re-rank is how PQ
    deployments (FAISS IVFPQ + refine) resolve it.

    Training, encoding and scoring are all exact scaled-integer
    arithmetic (engine-portable; the oracle unrolls identical
    centroids, codes, ADC scores and the re-rank). Output without
    re-rank: (query_id, neighbor_id, score_hat, rn); with re-rank:
    (query_id, neighbor_id, cosine, rn) — exact cosines.
    """
    cents, books, c = ivf_pq_encode(
        candidates, id_col, vec_col,
        n_cells=n_cells, sample_n=sample_n, train_iters=train_iters,
        m=m, ksub=ksub, dim=dim, pq_sample_n=pq_sample_n, residual=residual,
    )
    cand_vecs = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return pq_score_rank(
        queries, c, cents, books, id_col, vec_col,
        k=k, nprobe=nprobe, rerank_r=rerank_r, cand_vecs=cand_vecs,
        residual=residual,
    )


def ivf_pq_encode(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    sample_n: int = 256,
    train_iters: int = 3,
    m: int = 16,
    ksub: int = 256,
    dim: int = 64,
    pq_sample_n: int = 1024,
    residual: bool = True,
) -> tuple[list[list[int]], list[list[list[int]]], DataFrame]:
    """The shared IVF-PQ TRAINING + ENCODING prefix of
    :func:`ivf_pq_topk` (r12 factor-out): one bounded sample collect,
    the coarse quantizer + per-subspace codebooks (driver NumPy over
    the sample), and ONE encode pass over the corpus. Returns
    (cents, books, coded) with coded = (neighbor_id, cell, codes).

    Factored out so composites that score the SAME index several ways
    (ADC-only and ADC+re-rank in ``knn_pq_suite``) train and encode
    once instead of per leg — at corpus scale the encode pass IS the
    expensive full scan, and it is identical across legs by
    construction."""
    assert dim % m == 0, f"dim={dim} must split evenly into m={m} subspaces"
    sample = _collect_vec_sample(
        candidates, id_col, vec_col, max(sample_n, pq_sample_n, n_cells, ksub), dim=dim
    )
    cents = kmeans_centroids_int(sample[:sample_n], n_cells, train_iters)
    books = pq_train_codebooks(
        sample[:pq_sample_n], m, ksub, train_iters, dim,
        cents=cents if residual else None,
    )
    assign1 = ivf_cells_int_udf(cents, 1)
    codes = pq_codes_udf(books, cents=cents if residual else None)
    with_cell = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    c = with_cell.select(
        "neighbor_id",
        "cell",
        (
            codes(F.col("v"), F.col("cell")) if residual else codes(F.col("v"))
        ).alias("codes"),
    ).filter(F.col("codes").isNotNull())
    return cents, books, c


def ivf_pq_topk_both(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 256,
    train_iters: int = 3,
    m: int = 16,
    ksub: int = 256,
    dim: int = 64,
    pq_sample_n: int = 1024,
    rerank_r: int = 32,
    residual: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """ADC-only top-k AND ADC+exact-re-rank top-k from ONE trained
    index, ONE corpus encode pass and ONE ADC scoring join (r12 —
    ``knn_pq_suite`` previously ran :func:`ivf_pq_topk` once per leg,
    so the sample collect, the codebooks, the two Arrow encode passes
    and the probe-cell scoring join all executed twice for
    bit-identical intermediate results). Returns (adc_top, rerank_top)
    with exactly :func:`ivf_pq_topk`'s two output schemas.

    The scored relation is narrowed to (query_id, neighbor_id, score)
    before the checkpoint — the re-rank re-attaches q_vec by query_id
    (functionally equivalent: query_id determines the vector), so the
    checkpoint holds 24-byte rows, not 512-byte vectors. Checkpoint is
    EAGER: under AQE both consumers' shuffle stages materialize
    concurrently, and a lazy mark lets each recompute the full scoring
    chain before either persists it (measured on pipeline_cc_ingest:
    the lazy variant ran the shared chain twice)."""
    cents, books, coded = ivf_pq_encode(
        candidates, id_col, vec_col,
        n_cells=n_cells, sample_n=sample_n, train_iters=train_iters,
        m=m, ksub=ksub, dim=dim, pq_sample_n=pq_sample_n, residual=residual,
    )
    # checkpoint the CODES, not the scored pairs: codes are the small
    # per-row state (cell + m bytes), one eager encode pass serves
    # both tails, and the two scoring tails below stay INDEPENDENT
    # subtrees — Spark overlaps their stages inside the one action,
    # which matters when each is a narrow Python stage (an eager
    # checkpoint of the scored relation was measured SLOWER at sf0.1:
    # it serialized the whole chain before either tail could start).
    coded = coded.localCheckpoint(eager=True)
    assignp = ivf_cells_int_udf(cents, nprobe)
    adc = adc_score_udf(books, cents=cents if residual else None)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        coded.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            adc(F.col("q_vec"), F.col("cell"), F.col("codes"))
            if residual
            else adc(F.col("q_vec"), F.col("codes")),
        )
        # same non-finite guard as pq_score_rank (NaN sorts greatest)
        .filter(~F.isnan(F.col("score")))
        .select("query_id", "neighbor_id", "score")
    )
    adc_top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    ).select(
        "query_id", "neighbor_id", fround("score", 6).alias("score_hat"), "rn"
    )
    shortlist = grouped_topk(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("neighbor_id").asc()],
        rerank_r,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cand_vecs = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    exact = (
        shortlist.join(qv, "query_id")
        .join(cand_vecs, "neighbor_id")
        .withColumn("cosine", cosine_similarity("q_vec", "c_vec"))
    )
    rerank_top = grouped_topk(
        exact,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    ).select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )
    return adc_top, rerank_top


def pq_score_rank(
    queries: DataFrame,
    coded: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int,
    rerank_r: int | None,
    cand_vecs: DataFrame | None,
    residual: bool = True,
) -> DataFrame:
    """Shared IVF-PQ scoring tail: probe-cell join against an
    ALREADY-ENCODED candidate relation (neighbor_id, cell, codes) —
    used by in-session :func:`ivf_pq_topk` and by the persistent-
    index read path (operators/annindex.py), so both produce
    bit-identical results from the same centroids/codebooks.
    ``residual`` must match how ``coded`` was encoded."""
    assignp = ivf_cells_int_udf(cents, nprobe)
    adc = adc_score_udf(books, cents=cents if residual else None)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        coded.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            adc(F.col("q_vec"), F.col("cell"), F.col("codes"))
            if residual
            else adc(F.col("q_vec"), F.col("codes")),
        )
        # the ADC UDF emits NaN for malformed inputs or a zero-norm
        # reconstruction; Spark sorts NaN GREATEST under DESC, so an
        # unfiltered degenerate code would outrank every real
        # candidate (and diverge from the oracle's inf/NaN division).
        # Drop non-finite scores, mirroring the null-drop on codes —
        # the oracle applies the same isfinite() guard.
        .filter(~F.isnan(F.col("score")))
    )
    if rerank_r is None:
        top = grouped_topk(
            scored,
            ["query_id"],
            [F.col("score").desc(), F.col("neighbor_id").asc()],
            k,
            rank_col="rn",
            keep_rank=True,
        )
        return top.select(
            "query_id", "neighbor_id", fround("score", 6).alias("score_hat"), "rn"
        )
    shortlist = grouped_topk(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("neighbor_id").asc()],
        rerank_r,
    ).select("query_id", "neighbor_id", "q_vec")
    if cand_vecs is None:
        raise ValueError("rerank_r requires cand_vecs (full-vector relation)")
    exact = shortlist.join(cand_vecs, "neighbor_id").withColumn(
        "cosine", cosine_similarity("q_vec", "c_vec")
    )
    top = grouped_topk(
        exact,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rn",
        keep_rank=True,
    )
    return top.select(
        "query_id", "neighbor_id", fround("cosine", 6).alias("cosine"), "rn"
    )
