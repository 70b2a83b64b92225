"""M0 kernels (SURVEY §7): trim / byte length / byte bigrams parity
with the reference semantics, tested against hand values and a pure
Python replication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queryengine_spark.functions.text import (
    byte_bigrams,
    byte_length,
    char_ngrams,
    tokenize_ws,
    ws_trim,
)


def _py_byte_bigrams(s: str) -> list[bytes]:
    b = s.encode("utf-8")
    return [b[i : i + 2] for i in range(len(b) - 1)]


CASES = [
    "test",
    "a yellow banana from the store",
    " vanilla \t",
    "héllo",          # multi-byte: é is 2 bytes → byte-level bigrams
    "日本語",          # 3-byte chars
    "ab",
    " nbsp padded ",
    "\x1cseparators\x1f",
]


def test_ws_trim_matches_python_strip(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = [r[0] for r in df.select(ws_trim("s")).collect()]
    assert got == [s.strip() for s in CASES]


def test_byte_length_is_utf8_bytes(spark):
    df = spark.createDataFrame([(s.strip(),) for s in CASES], ["s"])
    got = [r[0] for r in df.select(byte_length("s")).collect()]
    assert got == [len(s.strip().encode("utf-8")) for s in CASES]


def test_byte_bigrams_matches_reference_replication(spark):
    stripped = [s.strip() for s in CASES if len(s.strip().encode()) >= 2]
    df = spark.createDataFrame([(s,) for s in stripped], ["s"])
    got = [list(r[0]) for r in df.select(byte_bigrams("s")).collect()]
    want = [[bytearray(bg) for bg in _py_byte_bigrams(s)] for s in stripped]
    assert [[bytes(x) for x in row] for row in got] == [
        [bytes(x) for x in row] for row in want
    ]


def test_byte_bigrams_short_input_is_empty_not_crash(spark):
    df = spark.createDataFrame([("a",), ("",)], ["s"])
    got = [r[0] for r in df.select(byte_bigrams("s")).collect()]
    assert got == [[], []]


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("a",)], ["s"])
    got = [r[0] for r in df.select(char_ngrams("s", 3)).collect()]
    assert got == [["abc", "bcd"], [], []]


def test_tokenize_ws(spark):
    df = spark.createDataFrame([("  a  b\tc \n",), ("", )], ["s"])
    got = [r[0] for r in df.select(tokenize_ws("s")).collect()]
    assert got == [["a", "b", "c"], []]


def test_register_sql_functions(spark):
    from queryengine_spark.functions.similarity import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT partial_ratio('test', 'testing') AS s, partial_ratio('ab', 'xy') AS z"
    ).collect()[0]
    assert row["s"] == 100.0 and row["z"] == 0.0
