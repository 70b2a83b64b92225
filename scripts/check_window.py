#!/usr/bin/env python
"""Pre-driver replication of the round's correctness window: run the
first N (default 50) entries of ``queries()`` — exactly the slice the
driver oracles — on Spark AND DuckDB at $SPARK_GRAFT_SF_DIR (default
sf0.01, the driver's gate scale), comparing row count, column set,
and order-insensitive canonical values per query.

Usage: python scripts/check_window.py [N] [query ...]
(explicit query names override the window slice). Prints one line
per query (OK / MISMATCH / rows-only / ERR) and a final summary;
exit code 1 on any failure.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# lazy oracle builders train from the oracle corpus — pin before the
# oracle map is materialized
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from queryengine_spark.session import get_spark  # noqa: E402
from queryengine_spark.sources.tables import TABLES  # noqa: E402


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    return repr(v)


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False)
    )
    return cols, rows


def main() -> int:
    args = sys.argv[1:]
    n = 50
    names: list[str] = []
    for a in args:
        if a.isdigit():
            n = int(a)
        else:
            names.append(a)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if not names:
        names = list(queries)[:n]

    spark = get_spark()
    con = duckdb.connect()
    for t_ in TABLES:
        con.sql(
            f"CREATE VIEW {t_} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, t_)}.parquet'"
        )

    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            sql = oracles.get(name)
            if sql is None:
                status = f"rows-only ({len(sdf)} rows)"
            else:
                odf = con.execute(sql).fetchdf()
                sc, sr = _canon(sdf)
                oc, orows = _canon(odf)
                if sc != oc:
                    status = f"MISMATCH schema {sc} vs {oc}"
                    failures += 1
                elif len(sr) != len(orows):
                    status = f"MISMATCH rows {len(sr)} vs {len(orows)}"
                    failures += 1
                elif sr != orows:
                    bad = sum(a != b for a, b in zip(sr, orows))
                    status = f"MISMATCH values ({bad} rows differ)"
                    failures += 1
                else:
                    status = f"OK ({len(sr)} rows)"
        except Exception:
            status = "ERR " + traceback.format_exc().strip().splitlines()[-1]
            failures += 1
        print(f"{name}\t{status}\t{time.time() - t0:.1f}s", flush=True)
    print(f"# window check: {len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
