"""Semantics pins for operators/merge.py (CDC apply, SCD2 history)
against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from queryengine_spark.operators.merge import apply_cdc, scd2_history


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, attr string, val double",
    )


class TestApplyCdc:
    def test_upsert_delete_and_insert(self, spark):
        changes = spark.createDataFrame(
            [
                (2, "b2", 21.0, 1, "U"),  # update existing
                (3, "c", 30.0, 1, "D"),  # delete existing
                (9, "new", 90.0, 1, "U"),  # insert unseen key
            ],
            "k bigint, attr string, val double, seq bigint, op string",
        )
        out = {
            r["k"]: (r["attr"], r["val"])
            for r in apply_cdc(_snap(spark), changes, ["k"], "seq").collect()
        }
        assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 9: ("new", 90.0)}

    def test_latest_seq_wins_including_resurrection(self, spark):
        changes = spark.createDataFrame(
            [
                (1, "x", 11.0, 1, "U"),
                (1, "y", 12.0, 3, "U"),  # latest wins
                (1, "z", 13.0, 2, "U"),
                (2, "dead", 0.0, 1, "D"),
                (2, "back", 22.0, 2, "U"),  # delete then re-insert
                (3, "gone", 0.0, 5, "D"),
            ],
            "k bigint, attr string, val double, seq bigint, op string",
        )
        out = {
            r["k"]: (r["attr"], r["val"])
            for r in apply_cdc(_snap(spark), changes, ["k"], "seq").collect()
        }
        assert out == {1: ("y", 12.0), 2: ("back", 22.0)}

    def test_empty_changes_identity(self, spark):
        changes = spark.createDataFrame(
            [], "k bigint, attr string, val double, seq bigint, op string"
        )
        out = apply_cdc(_snap(spark), changes, ["k"], "seq")
        assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


class TestScd2:
    def test_collapse_and_intervals(self, spark):
        ch = spark.createDataFrame(
            [
                (1, 10, "A"),
                (1, 20, "A"),  # consecutive repeat — collapsed
                (1, 30, "B"),
                (1, 40, "A"),  # A returns: new version, not merged
                (2, 15, "X"),
            ],
            "k bigint, seq bigint, attr string",
        )
        rows = sorted(
            (
                r["k"],
                r["attr"],
                r["effective_from"],
                r["effective_to"],
                r["is_current"],
            )
            for r in scd2_history(ch, ["k"], "seq", "attr").collect()
        )
        assert rows == [
            (1, "A", 10, 30, 0),
            (1, "A", 40, None, 1),
            (1, "B", 30, 40, 0),
            (2, "X", 15, None, 1),
        ]

    def test_null_attr_is_a_version(self, spark):
        ch = spark.createDataFrame(
            [(1, 10, "A"), (1, 20, None), (1, 30, None), (1, 40, "A")],
            "k bigint, seq bigint, attr string",
        )
        rows = sorted(
            (
                (r["attr"], r["effective_from"], r["effective_to"])
                for r in scd2_history(ch, ["k"], "seq", "attr").collect()
            ),
            key=lambda t: t[1],
        )
        # NULL run collapses to one version; A→NULL→A is 3 versions
        assert rows == [("A", 10, 20), (None, 20, 40), ("A", 40, None)]

    def test_intervals_are_contiguous_per_key(self, spark):
        import random

        rng = random.Random(5)
        ch = [
            (k, s * 10, rng.choice("AB"))
            for k in range(4)
            for s in range(1, 9)
        ]
        df = spark.createDataFrame(ch, "k bigint, seq bigint, attr string")
        hist = scd2_history(df, ["k"], "seq", "attr").collect()
        by_k: dict[int, list] = {}
        for r in hist:
            by_k.setdefault(r["k"], []).append(r)
        for k, rows in by_k.items():
            rows.sort(key=lambda r: r["effective_from"])
            assert rows[0]["effective_from"] == 10
            for a, b in zip(rows, rows[1:]):
                assert a["effective_to"] == b["effective_from"], k
            assert rows[-1]["effective_to"] is None
            assert sum(r["is_current"] for r in rows) == 1


class TestSnapshotDiff:
    def test_diff_classes_match_cdc_synthesis(self, spark, sf_dir):
        """The %10-update and %100==7-delete sets are disjoint (7 is
        not a multiple of 10), so the diff must classify exactly:
        changed = updates, removed = deletes, added = 0."""
        from pyspark.sql import functions as F

        from queryengine_spark.queries.etlq import etl_snapshot_diff
        from queryengine_spark.sources.tables import load_table

        o = load_table(spark, sf_dir, "orders")
        n = o.count()
        n_upd = o.filter(F.col("o_orderkey") % 10 == 0).count()
        n_del = o.filter(F.col("o_orderkey") % 100 == 7).count()
        got = {
            r["change_type"]: r["n"]
            for r in etl_snapshot_diff(spark, sf_dir).collect()
        }
        assert got.get("changed", 0) == n_upd
        assert got.get("removed", 0) == n_del
        assert "added" not in got
        assert got["unchanged"] == n - n_upd - n_del


class TestWeightedSample:
    def test_keys_match_reference_and_weights_bias_inclusion(self, spark):
        import hashlib

        from queryengine_spark.operators.sampling import weighted_sample_wor

        rows = [(i, (i % 7) * 140 + 10) for i in range(400)]  # weights 10..850
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        out = weighted_sample_wor(df, "doc_id", "w", 80).collect()

        def key(i, w):
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
            return (u * 10_000) // w

        want = sorted(((key(i, w), i) for i, w in rows))[:80]
        got = sorted((r["skey"], r["doc_id"]) for r in out)
        assert got == want
        # inclusion must skew toward heavy rows: the top weight class
        # (850) must place several times more rows than the bottom (10)
        by_w = {}
        for r in out:
            by_w[r["w"]] = by_w.get(r["w"], 0) + 1
        assert by_w.get(850, 0) >= 3 * max(1, by_w.get(10, 0))
