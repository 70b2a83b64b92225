"""Multimodal driver-contract queries: binary payload columns built
from ``documents`` (the container has no real media; the plumbing —
binary type, metadata, hashing, Arrow batch extraction — is the real
thing). Stats query has a DuckDB oracle (blob semantics match);
feature extraction goes through mapInPandas → rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.multimodal import attach_payload, extract_features
from queryengine_spark.queries.base import t


def _assets(spark: SparkSession, sf: str) -> DataFrame:
    return attach_payload(t(spark, sf, "documents"), "doc_id", "text", "text/plain")


def multimodal_binary_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-media-type payload stats computed on the binary column."""
    a = _assets(spark, sf)
    return a.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.md5("payload")).alias("min_hash"),
        F.max(F.md5("payload")).alias("max_hash"),
    )


BINARY_STATS_SQL = """
SELECT 'text/plain' AS media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
       MIN(md5(text)) AS min_hash,
       MAX(md5(text)) AS max_hash
FROM documents
"""


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over binary
    payloads — decode stubbed deterministically, Spark plumbing real.
    Not SQL-expressible → rows-only."""
    return extract_features(_assets(spark, sf))


QUERIES = {
    "multimodal_binary_stats": (multimodal_binary_stats, BINARY_STATS_SQL),
    "multimodal_features": (multimodal_features, None),
}
