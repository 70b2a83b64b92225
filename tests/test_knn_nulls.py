"""NULL / malformed embedding rows must be silently skipped by the
ANN and near-dup paths (the JVM expressions they replaced produced
NULL), never crash the Arrow kernels."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _embeddings_with_bad_rows(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    # NULL, too-short AND too-long: the over-length row is the nasty
    # one — it passes any >= length filter and then makes np.stack /
    # np.vstack ragged, killing the whole Arrow batch (ADVICE r2).
    bad = spark.createDataFrame(
        [
            (10_000_001, None),
            (10_000_002, [1.0, 2.0]),
            (10_000_003, [float(i) for i in range(65)]),
        ],
        schema,
    )
    return e.unionByName(bad)


def test_srp_topk_skips_null_and_short_vectors(spark, sf_dir):
    from queryengine_spark.operators.knn import srp_bucketed_topk

    e = _embeddings_with_bad_rows(spark, sf_dir)
    q = e.filter((F.col("vec_id") % 50 == 0) & F.col("embedding").isNotNull())
    got = srp_bucketed_topk(q, e, "vec_id", "embedding", k=3)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["neighbor_id"] < 10_000_001 for r in rows)


def test_ivf_topk_skips_null_and_short_vectors(spark, sf_dir):
    from queryengine_spark.operators.knn import ivf_topk

    e = _embeddings_with_bad_rows(spark, sf_dir)
    q = e.filter((F.col("vec_id") % 50 == 0) & F.col("embedding").isNotNull())
    got = ivf_topk(q, e, "vec_id", "embedding", k=3)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["neighbor_id"] < 10_000_001 for r in rows)


def test_embedding_neardup_lsh_skips_bad_rows(spark, sf_dir):
    from queryengine_spark.operators.dedup import embedding_neardup_pairs_lsh

    e = _embeddings_with_bad_rows(spark, sf_dir)
    got = embedding_neardup_pairs_lsh(
        e, "vec_id", "embedding", threshold=0.35, n_bits=3, dim=64, n_tables=8
    )
    rows = got.collect()
    assert all(
        r["id_a"] < 10_000_001 and r["id_b"] < 10_000_001 for r in rows
    )


def test_knn_filtered_prefilter_property(spark, sf_dir):
    """Leg 'eq': every returned neighbor must share the query's label
    (the pre-filter is part of the join key, so a violation is
    impossible-by-plan — this pins it behaviorally). Leg 'range'
    (r7): every returned neighbor must sit within ±R of the query's
    attribute. Both legs' folded recall vs their own predicate-
    filtered brute force must be positive."""
    from pyspark.sql import functions as F

    from queryengine_spark.queries.knn import KNN_RANGE_R, knn_filtered
    from queryengine_spark.sources.tables import load_table

    out = knn_filtered(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    j = (
        out.filter(F.col("leg") == "eq")
        .join(e.withColumnRenamed("vec_id", "query_id")
               .withColumnRenamed("label", "q_label"), "query_id")
        .join(e.withColumnRenamed("vec_id", "neighbor_id")
               .withColumnRenamed("label", "n_label"), "neighbor_id")
    )
    assert j.count() > 0
    assert j.filter(F.col("q_label") != F.col("n_label")).count() == 0
    mean_recall = j.select("query_id", "recall").distinct().agg(
        F.avg("recall")
    ).collect()[0][0]
    assert mean_recall > 0.2, mean_recall

    r = out.filter(F.col("leg") == "range")
    assert r.count() > 0
    assert (
        r.filter(
            F.abs(F.col("neighbor_id") - F.col("query_id")) > KNN_RANGE_R
        ).count()
        == 0
    )
    range_recall = r.select("query_id", "recall").distinct().agg(
        F.avg("recall")
    ).collect()[0][0]
    assert range_recall > 0.2, range_recall


def test_knn_filtered_plan(spark, sf_dir):
    from queryengine_spark.queries.knn import knn_filtered

    plan = (
        knn_filtered(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
