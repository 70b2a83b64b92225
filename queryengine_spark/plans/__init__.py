"""Plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a narrow relation before a row-multiplying operator
    (explode / crossJoin / UDF scoring).

    Single-file parquet inputs arrive as ONE partition (file-size
    splitting, spark.sql.files.maxPartitionBytes), so an explode that
    multiplies rows 100× would otherwise run on one core. One cheap
    shuffle of the narrow input buys full-cluster parallelism for the
    expensive stage — the classic fan-out-before-explode shape. At
    real scale (many input files) this is a no-op decision; keep it
    for small-file robustness."""
    if df.rdd.getNumPartitions() >= (partitions or df.sparkSession.sparkContext.defaultParallelism):
        return df
    return df.repartition(partitions) if partitions else df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
