"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference engine's
fuzzy top-k similarity join on dirtied part names — SURVEY.md §7 M1).
``queries()``/``oracle_sql()`` expose the full operator inventory of
SURVEY.md §2.2 plus the LLM-pipeline extensions (dedup, similarity
search, text analysis, multimodal), each paired with DuckDB-parity
ANSI SQL where expressible (rows-only otherwise: the partial_ratio
refine and the mapInPandas feature extraction).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from queryengine_spark.queries import all_oracle_sql, all_queries
from queryengine_spark.queries.fuzzy import fuzzy_match_flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's entire pipeline (heuristic candidate
    join → top-K → partial_ratio refine → argmax → NA fill) matching
    dirtied part names back to the clean p_name vocabulary."""
    return fuzzy_match_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
