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


QUERIES = {
    "agg_udaf_rms": (agg_udaf_rms, AGG_UDAF_RMS_SQL),
}
