"""Scalar string kernels (SURVEY.md §2.1 P1-P5) as pure JVM-side
column expressions — no UDFs, so they stay inside whole-stage codegen.

Reference semantics being matched (file:line cites are into
/root/reference/):
- P1 trim: Python ``str.strip()`` strips *all* Unicode whitespace
  (src/heurFuzz.py:15); Spark's ``F.trim`` strips only ASCII spaces,
  so we use a regexp with the Unicode whitespace class Python uses.
- P3 byte length: count of non-zero bytes of the UTF-8 buffer
  (src/heurFuzz.py:72-79) == ``octet_length``, NOT ``length`` (chars).
- P5 bigrams: sliding window over UTF-8 *bytes* (src/heurFuzz.py:23-32)
  — multi-byte chars produce byte-level bigrams. We slice the binary
  encode() output so the join keys are 2-byte binaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.strip() whitespace set (characters for which str.isspace()
# is True), expressed as a Java regex character class.
_PY_WS_CLASS = "[\\x09-\\x0d\\x1c-\\x1f\\x20\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"


def ws_trim(col: Column | str) -> Column:
    """Python ``str.strip()`` parity trim (reference src/heurFuzz.py:15)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"^{_PY_WS_CLASS}+|{_PY_WS_CLASS}+$", "")


def byte_length(col: Column | str) -> Column:
    """UTF-8 byte length (reference src/heurFuzz.py:72-79)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.octet_length(c)


def byte_bigrams(col: Column | str) -> Column:
    """Sliding byte-bigram array over the UTF-8 encoding of ``col``
    (reference ``as_bigram``, src/heurFuzz.py:23-32).

    Returns ``array<binary>`` of the ``octet_length - 1`` 2-byte
    windows. Input contract: the term must be >= 2 bytes (SURVEY §1.3);
    shorter inputs yield an empty array instead of crashing like the
    reference.
    """
    c = F.col(col) if isinstance(col, str) else col
    b = F.encode(c, "UTF-8")
    idx = F.sequence(F.lit(1), F.octet_length(c) - F.lit(1))
    grams = F.transform(idx, lambda i: b.substr(i, F.lit(2)))
    return F.when(F.octet_length(c) >= 2, grams).otherwise(
        F.array().cast("array<binary>")
    )


def char_bigrams(col: Column | str) -> Column:
    """Character-level bigrams (``array<string>``); equals byte-level
    bigrams for pure-ASCII data. Used where a DuckDB oracle needs the
    same expression in ANSI SQL."""
    return char_ngrams(col, 2)


def char_ngrams(col: Column | str, n: int) -> Column:
    """Character n-grams as ``array<string>`` (empty when shorter than n)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: c.substr(i, F.lit(n)))
    return F.when(F.length(c) >= n, grams).otherwise(F.array().cast("array<string>"))


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokenizer → array<string>, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(ws_trim(c), "\\s+"), lambda t: t != F.lit(""))
