#!/usr/bin/env python
"""Scale probe for the STREAMING twins (docs/SCALE.md, r12 — r11
verdict item 9): drive each foreachBatch twin through a staged
file-source stream at 1× and N× shard counts and report the wall
ratio. The batch kernels inside the twins are the already-probed
zero-shuffle maps, so the question this answers is whether the
STREAMING wrapper (file-source listing, micro-batch scheduling,
parquet append) adds any super-linear term.

Usage: python scripts/stream_probe.py [N] [twin ...]
Twins: pdf avro sqlite tfrecord hardneg rrf
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from queryengine_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
#: shards per probe at 1× (each twin synthesizes its own payloads)
BASE = 200
#: micro-batches the shard set is split into
N_BATCHES = 4


def _run_twin(spark, twin: str, n: int, workdir: str) -> float:
    from queryengine_spark.sources.avro import synthesize_avro
    from queryengine_spark.sources.pdf import synthesize_pdf
    from queryengine_spark.sources.sqlitefile import synthesize_sqlite
    from queryengine_spark.sources.tfrecord import synthesize_tfrecord
    from queryengine_spark.streaming import (
        stream_avro_records,
        stream_hard_negatives,
        stream_pdf_text,
        stream_sqlite_rows,
        stream_tfrecord_examples,
    )

    watch = os.path.join(workdir, "watch")
    out = os.path.join(workdir, "out")
    os.makedirs(watch)

    if twin == "hardneg":
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        # replicate ANCHORS n×10 (id-shifted); corpus stays static —
        # the production shape: anchor stream vs corpus snapshot
        shift = 10_000_000
        anchors = emb.filter(F.col("vec_id") % 50 == 0)
        parts = []
        for r in range(n):
            parts.append(
                anchors.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(r * shift)
                )
            )
        alldf = parts[0]
        for p in parts[1:]:
            alldf = alldf.unionByName(p)
        for k in range(N_BATCHES):
            alldf.filter(F.col("vec_id") % N_BATCHES == k).write.mode(
                "append"
            ).parquet(watch)
        stream = (
            spark.readStream.schema(alldf.schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(watch)
        )
        t0 = time.perf_counter()
        q = stream_hard_negatives(stream, emb, out)
        q.awaitTermination()
        return time.perf_counter() - t0

    synth = {
        "pdf": (synthesize_pdf, stream_pdf_text, "doc_id"),
        "avro": (synthesize_avro, stream_avro_records, "shard_id"),
        "sqlite": (synthesize_sqlite, stream_sqlite_rows, "shard_id"),
        "tfrecord": (
            synthesize_tfrecord, stream_tfrecord_examples, "shard_id",
        ),
    }[twin]
    make, twin_fn, id_col = synth
    ids = spark.range(0, BASE * n).select(F.col("id").alias(id_col))
    docs = make(ids.repartition(32))
    for k in range(N_BATCHES):
        docs.filter(F.col(id_col) % N_BATCHES == k).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(watch)
    )
    t0 = time.perf_counter()
    q = twin_fn(stream, out)
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    twins = sys.argv[2:] or ["pdf", "avro", "sqlite", "tfrecord", "hardneg"]
    spark = get_spark()
    # warm the session (first started streaming query pays several
    # seconds of one-time setup that would skew the 1× leg)
    wd = tempfile.mkdtemp(prefix="stream-probe-warm-")
    try:
        _run_twin(spark, "tfrecord", 1, wd)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    for twin in twins:
        walls = []
        for scale in (1, n):
            workdir = tempfile.mkdtemp(prefix=f"stream-probe-{twin}-")
            try:
                walls.append(_run_twin(spark, twin, scale, workdir))
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
        import math

        exp = math.log(walls[1] / walls[0], 10) / math.log(n, 10)
        print(
            f"{twin}\t1x {walls[0]:.1f}s\t{n}x {walls[1]:.1f}s\t"
            f"exp/decade {exp:.2f}"
        )


if __name__ == "__main__":
    main()
