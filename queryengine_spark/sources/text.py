"""Text sources (reference S1-S3, SURVEY.md §2.1).

- S1 line-text scan (/root/reference/src/heurFuzz.py:10-20): one term
  per line, Python-strip trimmed, with an input-line-order id (the
  reference's output preserves input order, so the id is part of the
  source contract).
- S2 TSV with header (/root/reference/src/example_helpers/parse_inputs.py:30-31).
- S3 pipe-delimited name dump (field 1 of split('|'), trimmed —
  parse_inputs.py:39-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from queryengine_spark.functions.text import ws_trim

_LINES_SCHEMA = StructType(
    [StructField("line_id", LongType(), False), StructField("term", StringType(), True)]
)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line scan with a deterministic input-order ``line_id``.

    zipWithIndex assigns contiguous ids in file order (one pass to
    size partitions, one to index) — the one place an RDD is justified:
    Spark has no built-in row-order id for text sources, and the
    reference's tie-breaks/output order depend on line order.
    """
    rdd = spark.read.text(path).rdd.map(lambda r: r[0]).zipWithIndex()
    return spark.createDataFrame(rdd.map(lambda t: (t[1], t[0])), _LINES_SCHEMA).select(
        "line_id", ws_trim(F.col("term")).alias("term")
    )


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """TSV with header row (reference S2)."""
    return spark.read.option("sep", "\t").option("header", True).csv(path)


def read_pipe_names(spark: SparkSession, path: str) -> DataFrame:
    """Pipe-delimited dump → trimmed ``name`` column = field index 1 of
    split('|') (reference S3, parse_inputs.py:39-42)."""
    return (
        spark.read.text(path)
        .select(F.split(F.col("value"), "\\|").alias("fields"))
        .filter(F.size("fields") > 1)
        .select(ws_trim(F.col("fields").getItem(1)).alias("name"))
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source (beyond the reference: the interchange format
    LLM-corpus pipelines actually ship). An explicit schema skips the
    sampling inference pass — at 100 TB, schema inference is a full
    extra scan; always pass one in production."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """JSON-lines sink, optionally hive-partitioned. Partitioning by a
    low-cardinality column (lang, source, date) is the layout that
    makes downstream partition pruning free."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — the other columnar interchange format warehouses
    ship; same pushdown/pruning machinery as parquet in Spark."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink, optionally hive-partitioned."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Hive-partitioned parquet sink — the standard corpus layout:
    directory per partition value, prunable by any engine."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
