"""Pluggable Python DataSource (Spark 4 API) for the reference
engine's line-text input format (SURVEY §2.1 S1:
/root/reference/src/heurFuzz.py:10-20 — one term per line).

Registered as ``spark.read.format("heurfuzz_text")``. Unlike the
driver-side ``spark.read.text`` + zipWithIndex path in
``sources/text.py`` (which needs a global pass for input-order ids),
this source keys every line by its BYTE OFFSET in the file — a
globally ordered id each task computes locally, so a 100 TB input
splits into independent byte-range partitions with no coordination:

- partitions(): byte ranges of ``chunk_bytes`` (no alignment scan —
  planning touches only the file SIZE);
- read(): seek to range start; if not at 0, skip the tail of the
  line the previous range owns (first-newline protocol), then emit
  (offset, line) until the first newline AT/after range end — every
  line is produced by exactly one task, boundaries included.

Lines are emitted raw (bytes-decoded, newline-stripped); trimming
and the 2..500-byte contract stay in prepare_terms so this source
composes with the same pipeline as every other scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

LINE_SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("term", StringType(), True),
    ]
)

DEFAULT_CHUNK_BYTES = 32 * 1024 * 1024


@dataclass
class _Range(InputPartition):
    path: str
    start: int
    end: int  # exclusive planning bound; reader finishes the spanning line


class LineTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("heurfuzz_text requires a path")
        self.chunk = int(options.get("chunk_bytes", DEFAULT_CHUNK_BYTES))

    def partitions(self):
        size = os.path.getsize(self.path)
        if size == 0:
            return [_Range(self.path, 0, 0)]
        starts = list(range(0, size, self.chunk))
        return [
            _Range(self.path, s, min(s + self.chunk, size)) for s in starts
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            pos = partition.start
            if pos > 0:
                # a task owns a line iff the line's FIRST byte is in
                # its range (the Hadoop LineRecordReader protocol):
                # peek at start-1 — if it is not a newline, the range
                # begins mid-line and the previous task owns that
                # line; skip to its end. If it IS a newline, start is
                # a line start and belongs to us.
                f.seek(pos - 1)
                if f.read(1) != b"\n":
                    skipped = f.readline()
                    pos += len(skipped)
            else:
                f.seek(0)
            while pos < partition.end:
                raw = f.readline()
                if not raw:
                    break
                line_start = pos
                pos += len(raw)
                yield (
                    line_start,
                    raw.rstrip(b"\r\n").decode("utf-8", errors="replace"),
                )


class LineTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "heurfuzz_text"

    def schema(self):
        return LINE_SCHEMA

    def reader(self, schema) -> LineTextReader:
        return LineTextReader(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('heurfuzz_text')``."""
    spark.dataSource.register(LineTextDataSource)
