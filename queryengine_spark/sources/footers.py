"""Parquet footer introspection — metadata-only query answering.

The oldest OLAP trick at 100 TB: COUNT / MIN / MAX / null-count
questions over immutable parquet are answerable from ROW-GROUP
FOOTERS alone — kilobytes per file — without scanning a single data
page. This is the machinery predicate pushdown and partition pruning
stand on (a scan planner consults exactly these statistics to skip
row groups), surfaced as a first-class profiling operator: the table
health check a pipeline runs before committing to a full pass.

Correctness story: Spark answers FROM THE FOOTERS (pyarrow
``ParquetFile.metadata``, fanned over executors in one mapInPandas
pass — the driver never opens a file), while the DuckDB oracle
answers the same questions FROM THE DATA (plain aggregates). A hash
match therefore certifies that the footer statistics are faithful to
the rows they summarize — min/max/null_count per column chunk,
row counts per row group — which is precisely the property
stats-based row-group skipping relies on.

Profiled columns are the numeric ones (parquet string statistics may
be TRUNCATED by writers — sorting-safe but not value-faithful — so
certifying them against data would be wrong by spec, not by bug).

Scale shape: one (table, column) request row per footer question;
at 100 TB the path relation comes from a file listing and each
executor reads only the ~KB footer of the files it owns. No data
I/O, no shuffle beyond the final small aggregate.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: table → numeric columns profiled (mirrored by the oracle SQL)
PROFILE_COLS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_acctbal"],
    "supplier": ["s_suppkey", "s_acctbal"],
    "part": ["p_partkey", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_totalprice"],
    "lineitem": ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    "events": ["event_id", "user_id", "value"],
    "documents": ["doc_id", "n_chars"],
    "embeddings": ["vec_id", "label"],
}

FOOTER_SCHEMA = StructType(
    [
        StructField("tbl", StringType()),
        StructField("col", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_nulls", LongType()),
        StructField("min_val", DoubleType()),
        StructField("max_val", DoubleType()),
    ]
)


def parquet_footer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tbl, col, n_rows, n_nulls, min_val, max_val) answered from
    footers only. Columns whose statistics are absent report NULL
    min/max (never a guessed value); row counts come from the file
    metadata regardless."""
    reqs = [
        (t, os.path.join(sf_dir, f"{t}.parquet"), c)
        for t, cols in PROFILE_COLS.items()
        for c in cols
    ]
    rows_df = spark.createDataFrame(reqs, "tbl string, path string, col string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import glob as _glob

        import pyarrow.parquet as pq

        def _files(path: str) -> list[str]:
            # a "table" is one parquet file OR a directory of part
            # files (how Spark writes) — footers merge across parts
            if os.path.isdir(path):
                return sorted(_glob.glob(os.path.join(path, "*.parquet")))
            return [path]

        for pdf in batches:
            out = []
            for path in pdf["path"].unique():
                sub = pdf[pdf["path"] == path]
                mds = [pq.ParquetFile(f).metadata for f in _files(path)]
                idx = {}
                for md in mds:
                    if md.num_row_groups:
                        idx = {
                            md.row_group(0).column(i).path_in_schema: i
                            for i in range(md.num_columns)
                        }
                        break
                n_rows = sum(md.num_rows for md in mds)
                for tname, c in zip(sub["tbl"], sub["col"]):
                    # Per-chunk semantics (r8): a chunk MISSING stats
                    # makes only the facts that chunk withheld
                    # unknown, not the whole column. An all-null row
                    # group (null_count == num_rows, has_min_max
                    # False — a legitimate writer shape) contributes
                    # its nulls and simply has no values to fold into
                    # min/max; only a chunk that HAS values but no
                    # min/max stats poisons min/max, and only a chunk
                    # with no null_count poisons n_nulls.
                    nnull = 0
                    nnull_ok = c in idx
                    mn = mx = None
                    mm_ok = c in idx
                    for md in mds:
                        if c not in idx:
                            break
                        for rg in range(md.num_row_groups):
                            rgm = md.row_group(rg)
                            st = rgm.column(idx[c]).statistics
                            nc = None if st is None else st.null_count
                            if nc is None:
                                nnull_ok = False
                            else:
                                nnull += int(nc)
                            if nc is not None and int(nc) == rgm.num_rows:
                                continue  # all-null chunk: no values
                            if st is None or not st.has_min_max:
                                mm_ok = False
                                continue
                            mn = st.min if mn is None else min(mn, st.min)
                            mx = st.max if mx is None else max(mx, st.max)
                    out.append(
                        (
                            str(tname),
                            str(c),
                            int(n_rows),
                            int(nnull) if nnull_ok else None,
                            # + 0.0 canonicalizes IEEE -0.0 (parquet
                            # float stats legitimately store -0.0 as
                            # a min where the data aggregate says
                            # 0.0; they compare equal, so normalize)
                            float(mn) + 0.0 if mm_ok and mn is not None else None,
                            float(mx) + 0.0 if mm_ok and mx is not None else None,
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FOOTER_SCHEMA.fields]
            )

    # spread the tiny request relation so footer reads parallelize
    return rows_df.repartition(8).mapInPandas(run, FOOTER_SCHEMA)


def footer_profile_oracle_sql() -> str:
    """The same questions answered FROM THE DATA: one aggregate
    SELECT per (table, column), UNION ALL."""
    parts = []
    for t, cols in PROFILE_COLS.items():
        for c in cols:
            parts.append(
                f"""SELECT '{t}' AS tbl, '{c}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(MIN({c}) AS DOUBLE) + 0.0 AS min_val,
       CAST(MAX({c}) AS DOUBLE) + 0.0 AS max_val
FROM {t}"""
            )
    return "\nUNION ALL\n".join(parts)
