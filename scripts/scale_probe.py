#!/usr/bin/env python
"""10× scale probe (docs/SCALE.md): stage an N×-replicated corpus
(id-shifted copies — a pessimistic model: every doc gains N-1 exact
near-dups, so pair-generating work grows ~N², not N) and time the
pair-generating / join-heavy queries against it.

Usage: python scripts/scale_probe.py [N] [query ...]
Stages into /tmp/queryengine-scale-probe-<N>x (reused if present).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from queryengine_spark.queries import all_queries
from queryengine_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "dedup_minhash_suite",
    "dedup_ngram_jaccard",
    "dedup_simhash_suite",
    "dedup_keep_canonical",
    "dedup_decontaminate_suite",
    "dedup_embedding",
    "knn_ann_suite",
    "fuzzy_candidates_coverage",
    "fuzzy_match_full",
    "text_repetition_stats",
    "text_gopher_quality",
]

ID_COLS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "part": "p_partkey",
    "lineitem": None,  # replicated without id shift (not id-joined here)
    "orders": None,
    "events": "event_id",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "nation": None,
    "region": None,
}


def stage(spark, n: int) -> str:
    # r8: the staging dir is keyed by SOURCE too — a 10x staging of
    # sf0.01 must never be silently reused as a 10x of sf0.1
    base = os.path.basename(os.path.normpath(SRC))
    dst = f"/tmp/queryengine-scale-probe-{base}-{n}x"
    # a sentinel written only after ALL tables staged — a crashed
    # partial staging must re-run, not be silently reused
    sentinel = os.path.join(dst, "_STAGED")
    if os.path.isfile(sentinel):
        return dst
    os.makedirs(dst, exist_ok=True)
    for tbl, id_col in ID_COLS.items():
        src_path = os.path.join(SRC, f"{tbl}.parquet")
        df = spark.read.parquet(src_path)
        if id_col is None or n == 1:
            out = df
        else:
            max_id = df.agg(F.max(id_col)).collect()[0][0] or 0
            shift = int(max_id) + 1
            copies = [
                df.withColumn(id_col, F.col(id_col) + F.lit(i * shift))
                for i in range(n)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{tbl}.parquet"))
    with open(sentinel, "w") as f:
        f.write(f"src={SRC} n={n}\n")
    return dst


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dst = stage(spark, n)
    print(f"# staged {n}x at {dst}")
    queries = all_queries()
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, dst).write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - t0)
        print(f"{name}\t{best:.1f}s")


if __name__ == "__main__":
    main()
