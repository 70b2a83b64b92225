"""ETL pipeline equivalent of the reference's real-world example
(/root/reference/src/example_helpers/parse_inputs.py): prepare a
dirty query vocabulary from a TSV-with-header column and a reference
vocabulary from a pipe-delimited dump, then run the fuzzy match.

Reference steps reproduced (parse_inputs.py:27-42):
- TSV column extract → lower → filter len(trim) > 1 → distinct
  (:30-35, set-comprehension semantics);
- names.dmp: field 1 of split('|'), trimmed (:39-42);
- feed both into the match pipeline (:45-48, topK=100 cutoff=90).

The remote fetch + unzip step (parse_inputs.py:6-25) is out-of-engine
ingest (the driver supplies local data; no network here by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.config import FuzzyConfig
from queryengine_spark.functions.text import ws_trim
from queryengine_spark.operators.fuzzy_join import fuzzy_match
from queryengine_spark.sources.text import read_pipe_names, read_tsv


def clean_vocabulary(df: DataFrame, column: str) -> DataFrame:
    """Lowercased, deduplicated, length-filtered term list
    (parse_inputs.py:31-35 semantics: len(trim(lower(x))) > 1)."""
    term = ws_trim(F.lower(F.col(column)))
    return (
        df.select(term.alias("term"))
        .filter(F.length("term") > 1)
        .distinct()
    )


def etl_fuzzy_pipeline(
    spark: SparkSession,
    tsv_path: str,
    tsv_column: str,
    dmp_path: str,
    config: FuzzyConfig | None = None,
) -> DataFrame:
    """TSV hosts × pipe-dump names end-to-end, like the reference's
    BV-BRC × NCBI taxonomy run (topK=100, cutoff=90 defaults there)."""
    cfg = config or FuzzyConfig(top_k=100, score_cutoff=90)
    queries = clean_vocabulary(read_tsv(spark, tsv_path), tsv_column)
    refs = read_pipe_names(spark, dmp_path).select(F.col("name").alias("term"))
    return fuzzy_match(queries, refs, config=cfg)
