"""Bloom-prefiltered semi/anti joins must equal the plain joins
exactly (no false negatives by construction; false positives removed
by the residual), and the bitmap build must stay bounded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queryengine_spark.operators.bloom import (
    DEFAULT_K,
    build_bloom_bitmap,
    bloom_join,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def contamination(spark, docs):
    # every 17th document's fingerprint is "contaminated"
    return (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select(F.md5("text").alias("bad_hash"))
        .distinct()
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_bloom_join_equals_plain_join(spark, docs, contamination, how):
    probe = docs.withColumn("h", F.md5("text"))
    got = bloom_join(probe, contamination, "h", "bad_hash", how=how)
    want = probe.join(
        contamination, probe["h"] == contamination["bad_hash"], how
    )
    assert _ids(got) == _ids(want)
    assert len(_ids(got)) > 0


def test_bloom_join_null_probe_keys(spark, contamination, docs):
    probe = docs.withColumn(
        "h", F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.md5("text"))
    )
    for how in ("left_semi", "left_anti"):
        got = bloom_join(probe, contamination, "h", "bad_hash", how=how)
        want = probe.join(
            contamination, probe["h"] == contamination["bad_hash"], how
        )
        assert _ids(got) == _ids(want), how


def test_bloom_join_empty_build(spark, docs):
    empty = docs.filter(F.lit(False)).select(F.md5("text").alias("bad_hash"))
    probe = docs.withColumn("h", F.md5("text"))
    assert bloom_join(probe, empty, "h", "bad_hash", "left_semi").count() == 0
    assert (
        bloom_join(probe, empty, "h", "bad_hash", "left_anti").count()
        == probe.count()
    )


def test_bitmap_bounded_and_selective(spark, docs, contamination):
    m_bits = 1 << 18
    bm = build_bloom_bitmap(contamination, "bad_hash", m_bits=m_bits)
    assert bm.shape == (m_bits // 64,)
    n_keys = contamination.count()
    set_bits = int(sum(bin(int(w)).count("1") for w in bm))
    assert 0 < set_bits <= n_keys * DEFAULT_K
    # selectivity: non-members should mostly be filtered before the
    # residual (fpp at this load factor is well under 5%)
    probe = docs.withColumn("h", F.md5(F.concat(F.lit("x"), "text")))
    semi = bloom_join(probe, contamination, "h", "bad_hash", "left_semi")
    assert semi.count() == 0
