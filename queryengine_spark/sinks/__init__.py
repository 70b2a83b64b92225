"""Sinks (reference K1, /root/reference/src/heurFuzz.py:131-136):
two-column TSV with header, input order preserved."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, order_by: str | None = None) -> None:
    """Distributed TSV sink with header (scale path: a directory of
    part files; Spark preserves sort order within the write when the
    plan ends in a sort)."""
    out = df.orderBy(order_by) if order_by else df
    out.write.mode("overwrite").option("sep", "\t").option("header", True).csv(path)


def to_local_tsv(df: DataFrame, columns: list[str], order_by: str | None = None) -> str:
    """Materialize a (small) result as a single TSV string — used for
    golden-file byte-parity tests and the CLI single-file output,
    mirroring the reference's single-node sink exactly."""
    out = df.orderBy(order_by) if order_by else df
    rows = out.select(*columns).collect()
    lines = ["\t".join(columns)]
    lines.extend("\t".join("" if v is None else str(v) for v in row) for row in rows)
    return "\n".join(lines) + "\n"
