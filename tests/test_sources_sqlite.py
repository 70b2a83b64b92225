"""From-scratch SQLite file reader (sources/sqlitefile.py):
round-trips against REAL stdlib-sqlite3-written databases (the
encoder the decoder must agree with byte-for-byte), structural
probes (interior pages, overflow chains, rowid alias, serial-type
widths), and honest-refusal probes (WAL, encodings, truncations,
bit flips)."""

from __future__ import annotations

import random
import sqlite3

import pytest

from queryengine_spark.sources.sqlitefile import (
    make_sqlite_shard,
    parse_sqlite_table,
    sql_n_rows,
    sql_name,
    sql_opt,
    sql_payload,
    sql_rowid,
    sql_score_q,
    sql_small,
)


@pytest.mark.parametrize("s", list(range(12)))
def test_roundtrip_matches_formula(s):
    got = parse_sqlite_table(make_sqlite_shard(s))
    assert got == [
        [
            sql_rowid(s, i),
            sql_name(s, i),
            sql_score_q(s, i) / 32.0,
            sql_payload(s, i),
            sql_opt(s, i),
            sql_small(s, i),
        ]
        for i in range(sql_n_rows(s))
    ]


def test_structures_really_exercised():
    """The corpus shape must hit interior table pages (type 5) and
    overflow pages, or the walk is only being tested on a single
    leaf."""
    b = make_sqlite_shard(3)
    ps = 512
    types = [b[p * ps + (100 if p == 0 else 0)] for p in range(len(b) // ps)]
    assert 5 in types  # interior table page
    assert 13 in types  # leaf table pages
    # long rows exist (overflow chains)
    assert any(len(sql_name(3, i)) > 512 for i in range(sql_n_rows(3)))
    # serial-type width coverage: 1..4 and 6-byte ints, both signs
    smalls = [sql_small(3, i) for i in range(sql_n_rows(3))]
    assert any(v < 0 for v in smalls) and any(v > 1 << 40 for v in smalls)


def _db_bytes(sql_stmts, page_size=512):
    con = sqlite3.connect(":memory:")
    con.execute(f"PRAGMA page_size={page_size}")
    for stmt, args in sql_stmts:
        con.execute(stmt, args)
    con.commit()
    out = bytes(con.serialize())
    con.close()
    return out


def test_hand_value_types():
    """Every serial-type family decodes: NULL, the 0/1 constants,
    multi-width ints, negative ints, float, text, blob, empties."""
    b = _db_bytes(
        [
            ("CREATE TABLE docs (rid INTEGER PRIMARY KEY, name TEXT,"
             " score REAL, payload BLOB, opt INTEGER, small INTEGER)", ()),
            ("INSERT INTO docs VALUES (1, '', 0.0, X'', NULL, 0)", ()),
            ("INSERT INTO docs VALUES (2, 'a', -1.5, X'ff', 1, -1)", ()),
            (
                "INSERT INTO docs VALUES (3, ?, 2.0, ?, 130, ?)",
                ("txt", b"\x00\x01", -(1 << 35)),
            ),
        ]
    )
    got = parse_sqlite_table(b)
    assert got == [
        [1, "", 0.0, b"", None, 0],
        [2, "a", -1.5, b"\xff", 1, -1],
        [3, "txt", 2.0, b"\x00\x01", 130, -(1 << 35)],
    ]


def test_missing_table_and_index_refusals():
    b = _db_bytes(
        [
            ("CREATE TABLE other (x INTEGER PRIMARY KEY, y TEXT)", ()),
            ("INSERT INTO other VALUES (1, 'z')", ()),
            ("CREATE INDEX oy ON other (y)", ()),
        ]
    )
    assert parse_sqlite_table(b, "docs") is None  # table missing
    assert parse_sqlite_table(b, "other") == [[1, "z"]]
    assert parse_sqlite_table(b, "oy") is None  # index root: refuse


def test_refusals():
    good = make_sqlite_shard(1)
    # bad magic
    assert parse_sqlite_table(b"Not a database" + good[14:]) is None
    # WAL versions (offsets 18/19) now PARSE when the capture is
    # checkpoint-clean (r12 — the main file alone carries the rows);
    # truly unknown versions still refuse
    wal = bytearray(good)
    wal[18] = wal[19] = 2
    assert parse_sqlite_table(bytes(wal)) is not None
    unk = bytearray(good)
    unk[18] = unk[19] = 3
    assert parse_sqlite_table(bytes(unk)) is None
    mixed = bytearray(good)
    mixed[18], mixed[19] = 1, 2
    assert parse_sqlite_table(bytes(mixed)) is None
    # non-UTF-8 encoding (offset 56): UTF-16le
    enc = bytearray(good)
    enc[56:60] = (2).to_bytes(4, "big")
    assert parse_sqlite_table(bytes(enc)) is None
    # ragged length / truncation
    assert parse_sqlite_table(good[: len(good) - 100]) is None
    assert parse_sqlite_table(b"") is None
    # non-power-of-two page size
    ps = bytearray(good)
    ps[16:18] = (600).to_bytes(2, "big")
    assert parse_sqlite_table(bytes(ps)) is None


def test_truncations_and_bitflips_never_crash():
    for s in (0, 5):
        b = make_sqlite_shard(s)
        step = max(1, len(b) // 40)
        for cut in range(0, len(b), step):
            parse_sqlite_table(b[:cut])  # must not raise
        rng = random.Random(s)
        for _ in range(150):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_sqlite_table(bytes(fb))  # must not raise


def test_spark_rows_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.sources.sqlitefile import (
        sqlite_rows,
        synthesize_sqlite,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("shard_id"))
    df = sqlite_rows(synthesize_sqlite(ids))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert len(rows) == sum(sql_n_rows(s) for s in range(6))
    for r in rows[:40]:
        s = r.shard_id
        i = (r.rid - s * 100000 - 1) // 3
        assert r.name_len == len(sql_name(s, i))
        assert r.score_q == sql_score_q(s, i)
        assert r.small == sql_small(s, i)
        assert (r.opt is None) == (sql_opt(s, i) is None)


# ---------------------------------------------------------------------------
# r12 ADVICE regressions
# ---------------------------------------------------------------------------


def test_spark_alien_column_layout_skipped(spark):
    """A valid database whose ``docs`` table has a DIFFERENT column
    layout walks fine but breaks the 6-way unpack — the shard must
    skip like a parse refusal, not fail the task (r12 ADVICE)."""
    from queryengine_spark.sources.sqlitefile import (
        make_sqlite_shard,
        parse_sqlite_table,
        sql_n_rows,
        sqlite_rows,
    )

    alien = _db_bytes(
        [
            ("CREATE TABLE docs (a INTEGER PRIMARY KEY, b TEXT)", ()),
            ("INSERT INTO docs VALUES (1, 'x')", ()),
        ]
    )
    assert parse_sqlite_table(alien) is not None  # walks fine...
    good = make_sqlite_shard(0)

    assets = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(alien))],
        "shard_id long, payload binary",
    )
    rows = sqlite_rows(assets).collect()
    assert len(rows) == sql_n_rows(0)
    assert {r.shard_id for r in rows} == {0}


# ---------------------------------------------------------------------------
# r12: WAL-mode captures
# ---------------------------------------------------------------------------


def _expected_rows(s):
    from queryengine_spark.sources.sqlitefile import (
        sql_name,
        sql_opt,
        sql_payload,
        sql_rowid,
        sql_score_q,
        sql_small,
    )

    return [
        [sql_rowid(s, i), sql_name(s, i), sql_score_q(s, i) / 32.0,
         sql_payload(s, i), sql_opt(s, i), sql_small(s, i)]
        for i in range(sql_n_rows(s))
    ]


@pytest.mark.parametrize("s", [3, 7, 11, 15, 19, 23, 27, 31, 35])
def test_wal_capture_matches_formula(s):
    """All three WAL sub-variants (no checkpoint + multi-version
    pages, mid-life FULL checkpoint, final TRUNCATE checkpoint)
    merge to the formula rows."""
    from queryengine_spark.sources.sqlitefile import (
        make_sqlite_wal_shard,
        parse_sqlite_table,
    )

    got = parse_sqlite_table(make_sqlite_wal_shard(s))
    assert got is not None
    assert sorted(map(tuple, got)) == sorted(map(tuple, _expected_rows(s)))


def test_wal_structures_really_exercised():
    """Variant 3 must really carry WAL frames (incl. multi-version
    pages); variant 11 must really be checkpoint-clean."""
    from queryengine_spark.sources.sqlitefile import (
        _parse_wal,
        make_sqlite_wal_shard,
    )

    b3 = make_sqlite_wal_shard(3)
    mp = int.from_bytes(b3[28:32], "big")
    wal = b3[mp * 512:]
    assert wal[:4] in (b"\x37\x7f\x06\x82", b"\x37\x7f\x06\x83")
    overrides, commit_pages = _parse_wal(wal, 512)
    assert overrides and commit_pages is not None
    # multiple frames for at least one page (overwrite + restore)
    n_frames = (len(wal) - 32) // (24 + 512)
    assert n_frames > len(overrides)
    b11 = make_sqlite_wal_shard(11)
    assert len(b11) == int.from_bytes(b11[28:32], "big") * 512  # no WAL
    assert b11[18] == 2 and b11[19] == 2  # still a WAL-mode header


def test_wal_refusals_and_recovery():
    from queryengine_spark.sources.sqlitefile import (
        make_sqlite_wal_shard,
        parse_sqlite_table,
    )

    b = make_sqlite_wal_shard(3)
    mp = int.from_bytes(b[28:32], "big")
    wal_at = mp * 512
    # truncated WAL header refuses
    assert parse_sqlite_table(b[: wal_at + 16]) is None
    # bad WAL magic refuses
    bb = bytearray(b)
    bb[wal_at] ^= 0xFF
    assert parse_sqlite_table(bytes(bb)) is None
    # header-checksum lie refuses
    bb = bytearray(b)
    bb[wal_at + 25] ^= 1
    assert parse_sqlite_table(bytes(bb)) is None
    # an invalid FRAME ends the valid region (recovery semantic):
    # never a crash, and never the full row set
    bb = bytearray(b)
    bb[wal_at + 32 + 8] ^= 1  # first frame's salt
    r = parse_sqlite_table(bytes(bb))
    assert r is None or len(r) < sql_n_rows(3)
    # torn tail (partial trailing frame) is tolerated per the doc
    r2 = parse_sqlite_table(b[:-100])
    assert r2 is None or isinstance(r2, list)


def test_wal_truncations_and_bitflips_never_crash():
    import random as _random

    from queryengine_spark.sources.sqlitefile import (
        make_sqlite_wal_shard,
        parse_sqlite_table,
    )

    for s in (3, 7):
        b = make_sqlite_wal_shard(s)
        step = max(1, len(b) // 40)
        for cut in range(0, len(b), step):
            parse_sqlite_table(b[:cut])  # must not raise
        rng = _random.Random(s)
        for _ in range(150):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_sqlite_table(bytes(fb))  # must not raise
