#!/usr/bin/env python
"""A/B the connected-components backend (pointer-jump label prop vs
alternating large/small-star) inside the two CC-embedding pipelines
(round-3 verdict item 5). Runs each pipeline n times per backend at
$SPARK_GRAFT_SF_DIR and prints per-run wall times + min, plus a
result-equality check (the two backends must label identically).

Usage: python scripts/ab_cc_backend.py [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from queryengine_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-cc-backend")
    spark.sparkContext.setLogLevel("ERROR")

    import queryengine_spark.operators.dedup as ded
    from queryengine_spark.queries.curation import pipeline_leakage_safe_split
    from queryengine_spark.queries.pipelines import pipeline_llm_prep

    label_prop = ded.connected_components
    star = ded.connected_components_star

    # warmup: fork python workers + parquet footers
    pipeline_llm_prep(spark, sf).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {}
    sums: dict[str, dict[str, object]] = {}
    for qname, q in [
        ("pipeline_llm_prep", pipeline_llm_prep),
        ("pipeline_leakage_safe_split", pipeline_leakage_safe_split),
    ]:
        results[qname] = {}
        sums[qname] = {}
        for bname, backend in [("label_prop", label_prop), ("star", star)]:
            ded.connected_components = backend
            times = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                q(spark, sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            results[qname][bname] = times
            # content signature for equality across backends
            df = q(spark, sf)
            from pyspark.sql import functions as F

            sig = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.expr(
                        "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
                    ),
                    F.lit(0),
                ).alias("h"),
            ).collect()[0]
            sums[qname][bname] = (sig["n"], sig["h"])
            print(
                f"{qname:32s} {bname:10s} runs={times} min={min(times)} "
                f"sig={sums[qname][bname]}"
            )
        ded.connected_components = label_prop
        assert sums[qname]["label_prop"] == sums[qname]["star"], (
            f"{qname}: backends disagree: {sums[qname]}"
        )
        print(f"{qname}: backends agree, "
              f"label_prop min={min(results[qname]['label_prop'])} "
              f"star min={min(results[qname]['star'])}")


if __name__ == "__main__":
    main()
