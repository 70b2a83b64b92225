"""CLI driver mirroring the reference's argparse surface
(/root/reference/src/heurFuzz.py:172-195): -q/--query -r/--reference
-o/--OutputFile -n/--topN -s/--scoreCutOff -b/--bufferSize, with the
reference's actual code defaults (topN=10, scoreCutOff=90,
bufferSize=500 — SURVEY §2.3 Q4 notes the README disagrees)."""

from __future__ import annotations

import argparse

from queryengine_spark.config import FuzzyConfig
from queryengine_spark.operators.fuzzy_join import fuzzy_match, map_ratio
from queryengine_spark.session import get_spark
from queryengine_spark.sinks import to_local_tsv
from queryengine_spark.sources.text import read_lines


def run(
    query_file: str,
    ref_file: str,
    top_k: int,
    score_cutoff: int,
    buffer_size: int,
    output_file: str,
) -> None:
    spark = get_spark("heurfuzz-cli")
    cfg = FuzzyConfig(top_k=top_k, score_cutoff=score_cutoff, buffer_size=buffer_size)
    queries = read_lines(spark, query_file)
    refs = read_lines(spark, ref_file)
    result = fuzzy_match(
        queries, refs, query_col="term", ref_col="term",
        query_id="line_id", ref_id="line_id", config=cfg,
    )
    result = result.cache()
    tsv = to_local_tsv(
        result.select("q_id", "query", "match"), ["query", "match"], order_by="q_id"
    )
    with open(output_file, "w") as out:
        out.write(tsv)
    ratio = map_ratio(result).collect()[0]
    print(f"\tMap ratio: {ratio['map_ratio']}% ({ratio['mapped']} / {ratio['total']})")


def main() -> None:
    parser = argparse.ArgumentParser(description="Process query and reference files.")
    parser.add_argument("-q", "--query", type=str, required=True)
    parser.add_argument("-r", "--reference", type=str, required=True)
    parser.add_argument("-o", "--OutputFile", type=str, required=True)
    parser.add_argument("-n", "--topN", type=int, default=10)
    parser.add_argument("-s", "--scoreCutOff", type=int, default=90)
    parser.add_argument("-b", "--bufferSize", type=int, default=500)
    args = parser.parse_args()
    run(args.query, args.reference, args.topN, args.scoreCutOff, args.bufferSize, args.OutputFile)


if __name__ == "__main__":
    main()
