"""Local replication of the driver's correctness gate: every
``queries()`` entry runs on Spark and (when an oracle exists) the
``oracle_sql()`` runs on DuckDB over the same parquet, then row
count + schema + order-insensitive values are compared exactly.

Run at sf0.001 by default for speed (driver uses sf0.01 — set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to replicate exactly).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

# lazy oracle builders (text_bpe_tokenize) train from the oracle
# corpus — pin it to the sf this replication run compares at BEFORE
# the ORACLES map is built below
os.environ.setdefault(
    "SPARK_GRAFT_ORACLE_SF_DIR",
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
)

import __spark_entry__ as entry_mod
from queryengine_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{os.path.join(sf_dir, name)}.parquet'"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # full precision: bit-level float divergence must fail loudly
        return repr(v)
    return repr(v)


def _canon(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)
    )
    return cols, rows


ALL_QUERIES = sorted(entry_mod.queries())
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"q_id", "query", "match", "score"}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_against_oracle(spark, sf_dir, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, deterministic
        assert len(sdf.columns) > 0
        return
    ddf = duck.sql(ORACLES[name]).df()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs oracle {len(ddf)}"
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={s_rows[mism[0]]} oracle={d_rows[mism[0]]}"
    )
