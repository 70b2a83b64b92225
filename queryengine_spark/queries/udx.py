"""User-extension surface (SURVEY §2.2 UDF/UDAF/UDTF row): the
engine's extension points demonstrated as first-class, oracle-checked
queries — not just API stubs.

- UDAF: a grouped-aggregate Arrow pandas UDF (``rms_udaf``). To stay
  engine-portable the aggregate never sums raw doubles (partial-agg
  order would flip low bits): each x² is floor-scaled to an exact
  BIGINT per row, the BIGINTs sum order-independently inside numpy,
  and one division + one correctly-rounded sqrt produce the result —
  the identical IEEE sequence DuckDB's SQL twin runs.
- UDTF (table function) parity is pinned in tests/test_udtf.py (a
  row-expanding Python UDTF vs the native explode plan — UDTFs are
  the slow path, so they are a tested extension point, not a contract
  query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from queryengine_spark.queries.base import t

_SCALE = 10000.0


@F.pandas_udf(DoubleType())
def rms_udaf(v: pd.Series) -> float:
    """Root-mean-square as a grouped-agg Arrow UDAF. Spark feeds each
    group's values as one Series (or Arrow chunks merged by the
    runner); the scaled-integer sum makes the result independent of
    row order and partial-aggregation splits."""
    x = v.to_numpy(dtype=np.float64)
    scaled = np.floor(x * x * _SCALE + 0.5).astype(np.int64)
    if len(scaled) == 0:
        return float("nan")
    total = int(scaled.sum())  # exact: int64 sums, order-free
    return float(np.sqrt(total / _SCALE / len(scaled)))


def agg_udaf_rms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-returnflag RMS of l_quantity via the pandas UDAF. (Spark
    disallows mixing a grouped-agg pandas UDF with native aggregates
    in one ``agg`` — compose via a join when both are needed.)"""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(rms_udaf("l_quantity").alias("rms_qty"))


AGG_UDAF_RMS_SQL = f"""
SELECT l_returnflag,
       sqrt(SUM(CAST(floor(l_quantity * l_quantity * {_SCALE} + 0.5) AS BIGINT))
            / {_SCALE} / count(*)) AS rms_qty
FROM lineitem
GROUP BY l_returnflag
"""


WINDOW_TOKENS = 5


def udtf_token_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Row-expanding Python UDTF as a first-class, oracle-checked
    query: chunk each document into fixed-size token windows (the
    context-window preprocessing shape of an LLM data pipeline). The
    UDTF tokenizes with the explicit ASCII whitespace class
    [ \\t\\n\\x0b\\f\\r] — exactly Java's regex \\s, so Python, Spark
    and DuckDB (RE2) split identically."""
    from pyspark.sql.functions import udtf

    size = WINDOW_TOKENS

    @udtf(returnType="doc_id bigint, win_idx int, window_text string")
    class TokenWindows:
        def eval(self, doc_id, text):
            import re

            if text is None:
                return
            toks = [
                tk
                for tk in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" \t\n\x0b\f\r"))
                if tk
            ]
            for i in range(0, len(toks), size):
                yield doc_id, i // size, " ".join(toks[i : i + size])

    spark.udtf.register("token_windows", TokenWindows)
    t(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT w.doc_id, w.win_idx, w.window_text "
        "FROM documents, LATERAL token_windows(doc_id, text) w"
    )


_TOKS_RAW = (
    "list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),"
    " '\\s+'), t0 -> t0 <> '')"
)

UDTF_WINDOWS_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS_RAW} AS toks FROM documents),
w AS (SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / {WINDOW_TOKENS}.0) AS INT))) AS win_idx
      FROM d WHERE len(toks) > 0)
SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
       array_to_string(toks[win_idx * {WINDOW_TOKENS} + 1 : win_idx * {WINDOW_TOKENS} + {WINDOW_TOKENS}], ' ') AS window_text
FROM w
"""


QUERIES = {
    "agg_udaf_rms": (agg_udaf_rms, AGG_UDAF_RMS_SQL),
    "udtf_token_windows": (udtf_token_windows, UDTF_WINDOWS_SQL),
}
