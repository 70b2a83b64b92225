"""Z-order layout: the footer-statistics pruning win must be real
and measurable, not asserted — we stage the same relation three ways
(unordered, single-column sort, z-order) and compare how much of the
fileset a selective range predicate can prove away from min-max
stats alone."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from queryengine_spark.plans.zorder import (
    compact_files,
    minmax_skip_fraction,
    zorder_write,
)

#: enough files that each of the two interleaved dimensions gets
#: ~2-3 bits of file-level resolution (with 8 files a mid-domain
#: probe straddles the single top-bit boundary and skips nothing)
N_FILES = 32


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    paths = {
        "plain": str(base / "plain"),
        "sorted": str(base / "sorted"),
        "zorder": str(base / "zorder"),
    }
    li.repartition(N_FILES).write.parquet(paths["plain"])
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(paths["sorted"])
    )
    zorder_write(li, ["l_partkey", "l_suppkey"], paths["zorder"], n_files=N_FILES)
    ranges = {}
    row = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    ranges["l_partkey"] = (row[0], row[1])
    ranges["l_suppkey"] = (row[2], row[3])
    return paths, ranges


def _narrow(lo, hi, frac=0.05, center=0.3):
    # off-center probe: a range centered exactly on the domain
    # midpoint sits on the coarsest z-boundary — the one query even a
    # perfect layout cannot prune at low file counts
    mid = lo + (hi - lo) * center
    half = max(1, math.ceil((hi - lo) * frac / 2))
    return mid - half, mid + half


class TestZorderPruning:
    def test_zorder_prunes_both_dimensions(self, staged):
        paths, ranges = staged
        for col in ("l_partkey", "l_suppkey"):
            lo, hi = _narrow(*ranges[col])
            plain = minmax_skip_fraction(paths["plain"], col, lo, hi)
            z = minmax_skip_fraction(paths["zorder"], col, lo, hi)
            # unordered files all overlap a mid-range predicate;
            # z-ordered files must prove away at least half the input
            assert plain < 0.25, (col, plain)
            assert z >= 0.5, (col, z)

    def test_single_sort_fails_second_dimension(self, staged):
        paths, ranges = staged
        lo, hi = _narrow(*ranges["l_suppkey"])
        srt = minmax_skip_fraction(paths["sorted"], "l_suppkey", lo, hi)
        z = minmax_skip_fraction(paths["zorder"], "l_suppkey", lo, hi)
        # the linear sort's second column is unclustered: near-zero
        # skipping; z-order must beat it decisively
        assert z > srt + 0.4, (srt, z)

    def test_zorder_preserves_rows(self, spark, staged):
        paths, _ = staged
        a = spark.read.parquet(paths["plain"])
        b = spark.read.parquet(paths["zorder"])
        assert a.count() == b.count()
        assert (
            a.agg(F.sum("l_quantity")).collect()[0][0]
            == b.agg(F.sum("l_quantity")).collect()[0][0]
        )


class TestCompaction:
    def test_compacts_to_target_file_count(self, spark, tmp_path, sf_dir):
        src = str(tmp_path / "many")
        dst = str(tmp_path / "compact")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li.repartition(64).write.parquet(src)  # simulate micro-batch litter
        import os

        n_before = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
        assert n_before == 64
        n = compact_files(spark, src, dst, target_mb=128)
        n_after = sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))
        assert n_after == n <= 4  # small corpus → a handful of files
        assert spark.read.parquet(dst).count() == li.count()
