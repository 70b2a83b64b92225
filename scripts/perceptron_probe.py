#!/usr/bin/env python
"""Perceptron convergence probe (r8 — verdict item 9): measure
confident-set agreement between the planted TEACHER and the student
after EACH training iteration, at 1x and a staged 10x corpus, so the
shipped iters=4 is a measured choice. Prints one line per
(scale, iteration); paste the table into BASELINE.md.

Usage: python scripts/perceptron_probe.py [max_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from queryengine_spark.operators.curation import (
    _hashed_bucket,
    _hashed_feature_buckets,
    _weights_df,
)
from queryengine_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS, WEIGHT_SPAN, TAU = 65536, 1000, 100


def probe(spark, docs, label: str, max_iters: int) -> None:
    fb = _hashed_feature_buckets(docs, "doc_id", "text", N_BUCKETS).cache()
    teacher_w = (
        _hashed_bucket(F.concat(F.lit("w:"), F.col("bucket").cast("string")))
        % (2 * WEIGHT_SPAN + 1)
    ) - WEIGHT_SPAN
    doc = (
        fb.withColumn("wt", teacher_w)
        .groupBy("id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("wt")).cast("bigint").alias("margin"),
        )
        .withColumn("y", F.when(F.col("margin") >= 0, 1).otherwise(-1))
        .withColumn(
            "confident",
            (F.abs(F.col("margin")) >= TAU * F.col("n_feats")).cast("int"),
        )
        .cache()
    )
    train = doc.filter(F.col("confident") == 1).select("id", "y").cache()
    n_conf = train.count()
    n_all = doc.count()
    weights: dict[int, int] = {}
    for t in range(1, max_iters + 1):
        t0 = time.time()
        if not weights:
            mis = train
        else:
            margins = (
                fb.join(F.broadcast(_weights_df(spark, weights)), "bucket")
                .groupBy("id")
                .agg(F.sum(F.col("c") * F.col("w")).alias("m"))
            )
            mis = (
                train.join(margins, "id", "left")
                .filter(F.col("y") * F.coalesce(F.col("m"), F.lit(0)) <= 0)
                .select("id", "y")
            )
        n_mis = mis.count()
        upd = (
            fb.join(mis.select("id", "y"), "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("c")).alias("dw"))
            .collect()
        )
        for row in upd:
            weights[row["bucket"]] = weights.get(row["bucket"], 0) + int(row["dw"])
        served = (
            fb.join(F.broadcast(_weights_df(spark, weights)), "bucket")
            .groupBy("id")
            .agg(F.sum(F.col("c") * F.col("w")).alias("tm"))
        )
        ag = (
            train.join(served, "id", "left")
            .select(
                (
                    (F.coalesce(F.col("tm"), F.lit(0)) >= 0)
                    == (F.col("y") == 1)
                ).cast("int").alias("ok")
            )
            .agg(F.sum("ok"))
            .collect()[0][0]
        )
        print(
            f"{label} iter={t} misclassified={n_mis} "
            f"confident_agree={ag}/{n_conf} ({ag / n_conf:.4f}) "
            f"n_docs={n_all} wall={time.time() - t0:.1f}s",
            flush=True,
        )
    fb.unpersist()
    doc.unpersist()
    train.unpersist()


def main() -> None:
    max_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("perceptron-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(SRC, "documents.parquet")).select(
        "doc_id", "text"
    )
    probe(spark, d, "1x", max_iters)
    mx = d.agg(F.max("doc_id")).collect()[0][0] + 1
    d10 = d
    for i in range(1, 10):
        d10 = d10.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx))
        )
    probe(spark, d10.localCheckpoint(), "10x", max_iters)


if __name__ == "__main__":
    main()
