#!/usr/bin/env python
"""Timed salted-vs-plain join on the adversarial hot-bigram
vocabulary (docs/SKEW.md closes its loop with this measurement).

Workload: the tests/test_fuzzy_skew.py generator scaled up — every
reference shares a 12-char hot core (bigram df = 1.0), so the
unguarded inverted bigram join reproduces |Q|x|R| candidate pairs
through the hot keys. We time the candidate equi-join (the skewed
stage) three ways, min-of-2 each, on the session's normal config
(AQE skew-join on):

  plain   — hot keys land per-reducer (AQE may split post-shuffle)
  salted  — plans.salted_join, n_salts=8, result-identical
  guarded — stop-bigram df guard at 0.1 (approximation: the
            production operating point; pairs drop ~|Q|x|R| -> rare)

Usage: python scripts/skew_bench.py [n_refs] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from queryengine_spark.operators.fuzzy_join import candidates_inverted, prepare_terms
from queryengine_spark.plans import salted_join
from queryengine_spark.session import get_spark

HOT_CORE = "abababababab"


def _tail(i: int) -> str:
    return "x" + "".join(chr(97 + (i // 26**k) % 26) for k in range(4))


def main() -> None:
    n_refs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    refs = spark.createDataFrame(
        [(i, f"{HOT_CORE}{_tail(i)}") for i in range(n_refs)], ["id", "term"]
    )
    queries = spark.createDataFrame(
        [
            (i, f"{HOT_CORE[:-1]}z{_tail(i * (n_refs // n_queries))}")
            for i in range(n_queries)
        ],
        ["id", "term"],
    )
    q = prepare_terms(queries, "term", "id", "q").cache()
    r = prepare_terms(refs, "term", "id", "r").cache()
    q.count(), r.count()

    q_bi = (
        q.select("q_id", F.explode("q_bigrams").alias("bg"))
        .groupBy("q_id", "bg")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    r_bi = r.select("r_id", F.explode(F.array_distinct("r_bigrams")).alias("bg"))

    def timed(label, thunk):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            best = min(best or 1e9, time.perf_counter() - t0)
        print(f"{label}\t{best:.1f}s")

    timed(
        "plain_join",
        lambda: q_bi.join(r_bi, "bg")
        .groupBy("q_id", "r_id")
        .agg(F.sum("mult").alias("hits")),
    )
    timed(
        "salted_join(8)",
        lambda: salted_join(r_bi, q_bi, ["bg"], n_salts=8)
        .groupBy("q_id", "r_id")
        .agg(F.sum("mult").alias("hits")),
    )
    timed(
        "guarded(df0.1)",
        lambda: candidates_inverted(q, r, 0.1, broadcast_queries=False),
    )


if __name__ == "__main__":
    main()
