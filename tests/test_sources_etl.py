"""S2/S3 sources and the ETL pipeline (FIXTURES.md F4/F5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from queryengine_spark.config import FuzzyConfig
from queryengine_spark.etl import clean_vocabulary, etl_fuzzy_pipeline
from queryengine_spark.sources.text import read_pipe_names, read_tsv


@pytest.fixture(scope="module")
def tsv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("etl") / "hosts.tsv"
    p.write_text(
        "host_name\tcol_b\tcol_c\n"
        "Homo Sapiens\tx\t1\n"
        "homo sapiens\ty\t2\n"      # dup after lower
        "  Mus musculus \tz\t3\n"   # needs trim
        "a\tw\t4\n"                 # single char -> filtered
        "\tv\t5\n"                  # empty -> filtered
    )
    return str(p)


@pytest.fixture(scope="module")
def dmp_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("etl2") / "names.dmp"
    p.write_text(
        "1\t|\tHomo sapiens\t|\tauthority\n"
        "2\t|\tMus musculus\t|\t\n"
        "3\t|\tDanio rerio\t|\tx\n"
    )
    return str(p)


def test_read_tsv_header(spark, tsv_file):
    df = read_tsv(spark, tsv_file)
    assert df.columns == ["host_name", "col_b", "col_c"]
    assert df.count() == 5


def test_clean_vocabulary_semantics(spark, tsv_file):
    got = sorted(
        r["term"] for r in clean_vocabulary(read_tsv(spark, tsv_file), "host_name").collect()
    )
    assert got == ["homo sapiens", "mus musculus"]


def test_read_pipe_names_field1(spark, dmp_file):
    got = sorted(r["name"] for r in read_pipe_names(spark, dmp_file).collect())
    assert got == ["Danio rerio", "Homo sapiens", "Mus musculus"]


def test_etl_pipeline_end_to_end(spark, tsv_file, dmp_file):
    out = etl_fuzzy_pipeline(
        spark, tsv_file, "host_name", dmp_file,
        FuzzyConfig(top_k=100, score_cutoff=90),
    )
    matches = {r["query"]: r["match"] for r in out.collect()}
    # lowercased queries match the original-case refs via the
    # refine stage's str.lower processor (reference parity)
    assert matches == {
        "homo sapiens": "Homo sapiens",
        "mus musculus": "Mus musculus",
    }


def test_jsonl_roundtrip_partitioned(spark, sf_dir, tmp_path):
    """JSONL source/sink + hive-partitioned parquet sink: the corpus
    interchange layouts. The partitioned read must prune to one
    directory (PartitionFilters, not a post-scan filter)."""
    from queryengine_spark.sources.tables import load_table
    from queryengine_spark.sources.text import (
        read_jsonl,
        write_jsonl,
        write_partitioned_parquet,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    jl = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, jl, partition_by=["lang"])
    back = read_jsonl(spark, jl, schema="doc_id bigint, text string, source string, lang string")
    assert back.count() == docs.count()
    assert {r["lang"] for r in back.select("lang").distinct().collect()} == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }

    pq = str(tmp_path / "docs_pq")
    write_partitioned_parquet(docs, pq, ["lang"])
    one = spark.read.parquet(pq).filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters: [" in scan and "lang" in scan.split("PartitionFilters:")[1]
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' WHERE lang = 'en'"
    ).fetchone()[0]
    assert one.count() == want


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC source/sink roundtrip with hive partitioning; values and
    schema survive the format boundary."""
    from queryengine_spark.sources.tables import load_table
    from queryengine_spark.sources.text import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["n_chars"] for r in back.collect()}
    b = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert a == b


class TestFooterProfile:
    """r7: parquet footer introspection (sources/footers.py) — the
    footer answers must equal data-scan answers, and the operator
    must actually be metadata-only."""

    def test_footer_answers_equal_data_answers(self, spark, sf_dir):
        from queryengine_spark.sources.footers import (
            PROFILE_COLS,
            parquet_footer_profile,
        )
        from queryengine_spark.sources.tables import load_table

        got = {
            (r["tbl"], r["col"]): (r["n_rows"], r["n_nulls"], r["min_val"], r["max_val"])
            for r in parquet_footer_profile(spark, sf_dir).collect()
        }
        assert len(got) == sum(len(v) for v in PROFILE_COLS.values())
        import pyspark.sql.functions as F

        for t, cols in PROFILE_COLS.items():
            df = load_table(spark, sf_dir, t)
            for c in cols:
                row = df.agg(
                    F.count(F.lit(1)), F.count(c), F.min(c), F.max(c)
                ).collect()[0]
                n, nn = row[0], row[0] - row[1]
                mn, mx = float(row[2]) + 0.0, float(row[3]) + 0.0
                assert got[(t, c)] == (n, nn, mn, mx), (t, c, got[(t, c)])

    def test_footer_rowgroup_sums_match_file_meta(self, sf_dir):
        import os

        import pyarrow.parquet as pq

        md = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata
        assert sum(
            md.row_group(i).num_rows for i in range(md.num_row_groups)
        ) == md.num_rows
