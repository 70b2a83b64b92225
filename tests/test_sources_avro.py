"""From-scratch Avro OCF source (sources/avro.py): writer↔parser
round-trips against the record formulas across all three codecs, the
from-scratch snappy decoder vs the real encoder, hand-built byte
vectors (negative-count array blocks, named-type refusals), and
strict-refusal probes (sync mismatch, CRC lies, ragged blocks)."""

from __future__ import annotations

import json
import random
import struct
import zlib

import pytest

from queryengine_spark.sources.avro import (
    AVRO_MAGIC,
    avro_n_recs,
    avro_record,
    make_avro_shard,
    parse_avro,
    snappy_decompress,
)


# ---------------------------------------------------------------------------
# snappy
# ---------------------------------------------------------------------------


def _real_snappy(data: bytes) -> bytes:
    pa = pytest.importorskip("pyarrow")
    if not pa.Codec.is_available("snappy"):
        pytest.skip("pyarrow snappy codec unavailable")
    return bytes(pa.Codec("snappy").compress(data))


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"a",
        b"hello hello hello hello hello!",
        bytes(range(256)) * 50,
        b"ab" * 8000,  # long runs -> overlapping copies
        b"The quick brown fox jumps over the lazy dog. " * 300,
    ],
)
def test_snappy_vs_real_encoder(payload):
    assert snappy_decompress(_real_snappy(payload)) == payload


def test_snappy_hand_vectors_and_refusals():
    # hand literal: len 5, tag (5-1)<<2 | 0
    assert snappy_decompress(b"\x05" + bytes([4 << 2]) + b"hello") == b"hello"
    # copy with 1-byte offset: "ababab" = literal "ab" + copy off 2 len 4
    frame = b"\x06" + bytes([1 << 2]) + b"ab" + bytes([(4 - 4) << 2 | 1, 2])
    assert snappy_decompress(frame) == b"ababab"
    # declared length lie
    assert snappy_decompress(b"\x06" + bytes([4 << 2]) + b"hello") is None
    # offset beyond output
    assert (
        snappy_decompress(b"\x04" + bytes([(4 - 4) << 2 | 1, 9])) is None
    )
    # truncated literal
    assert snappy_decompress(b"\x05" + bytes([4 << 2]) + b"hel") is None
    assert snappy_decompress(b"") is None


# ---------------------------------------------------------------------------
# container round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s", list(range(12)))
def test_roundtrip_matches_formula(s):
    got = parse_avro(make_avro_shard(s))
    assert got == [avro_record(s, i) for i in range(avro_n_recs(s))]


def test_all_codecs_exercised():
    assert b"null" in make_avro_shard(0)
    assert b"deflate" in make_avro_shard(1)
    assert b"snappy" in make_avro_shard(2)
    # multi-block bodies: sync marker appears once after the header
    # and once per block
    b = make_avro_shard(0)
    n_blocks = -(-avro_n_recs(0) // 7)
    import hashlib

    sync = hashlib.md5(b"avro-sync-0").digest()
    assert b.count(sync) == 1 + n_blocks


# ---------------------------------------------------------------------------
# hand vectors the writer never emits
# ---------------------------------------------------------------------------


def _hand_ocf(schema: dict, blocks: list[bytes], counts: list[int],
              codec: bytes = b"null", sync: bytes = b"S" * 16) -> bytes:
    def zz(n):
        u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = bytearray()
        u &= (1 << 64) - 1
        while True:
            c = u & 0x7F
            u >>= 7
            if u:
                out.append(c | 0x80)
            else:
                out.append(c)
                return bytes(out)

    def es(b_):
        return zz(len(b_)) + b_

    out = bytearray(AVRO_MAGIC)
    schema_b = json.dumps(schema).encode()
    out += zz(2)
    out += es(b"avro.schema") + es(schema_b)
    out += es(b"avro.codec") + es(codec)
    out += zz(0)
    out += sync
    for count, data in zip(counts, blocks):
        out += zz(count) + zz(len(data)) + data + sync
    return bytes(out)


def test_hand_negative_count_array_blocks():
    """Array/map blocks with NEGATIVE counts carry a byte-size
    prefix (spec §binary encoding) — the writer never emits them,
    the reader must."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}}
        ],
    }
    # array: block count -2 (so size follows), size 2, items 3, 4,
    # then terminator 0
    body = bytes([3, 4]) + bytes([6, 8]) + b"\x00"
    # zigzag(-2) = 3; zigzag(2)=4; zigzag(3)=6; zigzag(4)=8
    assert body[0] == 3
    rec = bytes([3, 4, 6, 8, 0])
    b = _hand_ocf(schema, [rec], [1])
    assert parse_avro(b) == [{"xs": [3, 4]}]


def test_hand_refusals():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": "long"}],
    }
    good = _hand_ocf(schema, [bytes([2, 4])], [2])  # two records: 1, 2
    assert parse_avro(good) == [{"x": 1}, {"x": 2}]
    # sync mismatch
    bad = bytearray(good)
    bad[-1] ^= 1
    assert parse_avro(bytes(bad)) is None
    # count lies (block bytes not exactly consumed)
    assert parse_avro(_hand_ocf(schema, [bytes([2, 4])], [1])) is None
    assert parse_avro(_hand_ocf(schema, [bytes([2, 4])], [3])) is None
    # unknown codec refuses
    assert (
        parse_avro(_hand_ocf(schema, [bytes([2])], [1], codec=b"zstandard"))
        is None
    )
    # named-type REFERENCE refuses (unsupported subset)
    ref_schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": "SomeNamedType"}],
    }
    assert parse_avro(_hand_ocf(ref_schema, [b"\x00"], [1])) is None
    # bad boolean byte refuses
    bschema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "b", "type": "boolean"}],
    }
    assert parse_avro(_hand_ocf(bschema, [b"\x02"], [1])) is None
    # varint overflow (11 continuation bytes)
    assert (
        parse_avro(_hand_ocf(schema, [b"\xff" * 11], [1])) is None
    )
    # missing schema / wrong magic / empty
    assert parse_avro(b"") is None
    assert parse_avro(b"Obj\x02" + good[4:]) is None


def test_huge_zero_byte_element_counts_refuse_fast():
    """Adversarial DoS shape: an array-of-null (zero bytes per
    element) declaring a 2^40 block count must refuse immediately,
    not loop for hours; same for a file block count past the cap."""
    import time

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "null"}}
        ],
    }

    def zz(n):
        u = n << 1 if n >= 0 else ((-n) << 1) - 1
        out = bytearray()
        while True:
            c = u & 0x7F
            u >>= 7
            out.append(c | 0x80 if u else c)
            if not u:
                return bytes(out)

    rec = zz(1 << 40)  # array block count 2^40, zero element bytes
    t0 = time.time()
    assert parse_avro(_hand_ocf(schema, [rec], [1])) is None
    assert time.time() - t0 < 1.0
    # zero-field record schemas refuse outright (same degenerate class)
    empty_rec = {"type": "record", "name": "R", "fields": []}
    assert parse_avro(_hand_ocf(empty_rec, [b""], [1])) is None


def test_snappy_crc_enforced():
    b = bytearray(make_avro_shard(2))  # snappy shard
    # flip one bit inside the last block's CRC (last 20 bytes are
    # crc(4) + sync(16))
    b[-20] ^= 1
    assert parse_avro(bytes(b)) is None


def test_truncations_and_bitflips_never_crash():
    for s in (0, 1, 2):
        b = make_avro_shard(s)
        step = max(1, len(b) // 50)
        for cut in range(0, len(b), step):
            parse_avro(b[:cut])  # must not raise
        rng = random.Random(s)
        for _ in range(150):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_avro(bytes(fb))  # must not raise


def test_float_and_double_primitives():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
        ],
    }
    body = struct.pack("<f", 1.5) + struct.pack("<d", -2.25)
    got = parse_avro(_hand_ocf(schema, [body], [1]))
    assert got == [{"f": 1.5, "d": -2.25}]


def test_deflate_strictness():
    """Deflate blocks with trailing garbage inside the compressed
    stream refuse (the decompressor must consume the block
    exactly)."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "x", "type": "long"}],
    }
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = co.compress(bytes([2])) + co.flush()
    good = _hand_ocf(schema, [data], [1], codec=b"deflate")
    assert parse_avro(good) == [{"x": 1}]


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def test_spark_records_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.sources.avro import (
        avro_records,
        synthesize_avro,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("shard_id"))
    df = avro_records(synthesize_avro(ids))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert len(rows) == sum(avro_n_recs(s) for s in range(6))
    for r in rows[:50]:
        rec = avro_record(r.shard_id, r.rec_idx)
        assert r.rid == rec["rid"]
        assert r.name_len == len(rec["name"])
        assert r.score_q == int(rec["score"] * 16)
        assert r.payload_sum == sum(rec["payload"])
        assert (r.opt is None) == (rec["opt"] is None)


# ---------------------------------------------------------------------------
# r12 ADVICE regressions
# ---------------------------------------------------------------------------

_LONG_REC = {
    "type": "record",
    "name": "R",
    "fields": [{"name": "x", "type": "long"}],
}


def test_deflate_block_trailing_garbage_refuses():
    """Junk AFTER the deflate end-of-stream but INSIDE the declared
    block byte range lands in zlib's unused_data (unconsumed_tail
    only fills under a max_length call) — must refuse, not silently
    accept (r12 ADVICE)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = co.compress(bytes([2])) + co.flush()
    good = _hand_ocf(_LONG_REC, [data], [1], codec=b"deflate")
    assert parse_avro(good) == [{"x": 1}]
    bad = _hand_ocf(_LONG_REC, [data + b"JUNK"], [1], codec=b"deflate")
    assert parse_avro(bad) is None


def test_deflate_unterminated_stream_refuses():
    """A sync-flushed (never finalized) deflate stream leaves eof
    False — refuse rather than return a short decode."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    part = co.compress(bytes([2])) + co.flush(zlib.Z_SYNC_FLUSH)
    assert parse_avro(
        _hand_ocf(_LONG_REC, [part], [1], codec=b"deflate")
    ) is None


def test_varint_wider_than_64_bits_refuses():
    """A 10-byte varint whose final byte carries bits past bit 63
    cannot encode a 64-bit Avro long — refuse, never return a
    wider-than-64-bit length/rid (r12 ADVICE). The canonical 10-byte
    extreme (long MIN) must still parse."""
    over = bytes([0xFF] * 9 + [0x7F])  # 70 bits set
    assert parse_avro(_hand_ocf(_LONG_REC, [over], [1])) is None
    lo_min = bytes([0xFF] * 9 + [0x01])  # zigzag(-2^63), exactly 64 bits
    assert parse_avro(_hand_ocf(_LONG_REC, [lo_min], [1])) == [
        {"x": -(1 << 63)}
    ]


def test_spark_alien_schema_shard_skipped(spark):
    """A structurally VALID OCF carrying a different record schema
    parses but breaks the fixed projection — the shard must skip
    like a parse refusal, not fail the Spark task (r12 ADVICE)."""
    alien_schema = {
        "type": "record",
        "name": "Other",
        "fields": [{"name": "z", "type": "long"}],
    }
    alien = _hand_ocf(alien_schema, [bytes([2])], [1])
    assert parse_avro(alien) == [{"z": 1}]  # parses fine...
    good = make_avro_shard(0)

    from queryengine_spark.sources.avro import avro_records

    assets = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(alien))],
        "shard_id long, payload binary",
    )
    rows = avro_records(assets).collect()
    assert len(rows) == avro_n_recs(0)
    assert {r.shard_id for r in rows} == {0}


# ---------------------------------------------------------------------------
# r12: full codec matrix + reader-schema resolution
# ---------------------------------------------------------------------------


def test_six_codec_matrix_roundtrip():
    for s in range(12):
        got = parse_avro(make_avro_shard(s))
        assert got == [avro_record(s, i) for i in range(avro_n_recs(s))], s
    # each codec name really lands in the metadata
    for s, codec in enumerate(
        (b"null", b"deflate", b"snappy", b"bzip2", b"xz", b"zstandard")
    ):
        assert codec in make_avro_shard(s), codec


def test_new_codecs_strictness():
    import bz2 as _bz2

    # trailing garbage inside a bzip2 block refuses
    co = _bz2.compress(bytes([2]), 9)
    bad = _hand_ocf(_LONG_REC, [co + b"JUNK"], [1], codec=b"bzip2")
    assert parse_avro(bad) is None
    good = _hand_ocf(_LONG_REC, [co], [1], codec=b"bzip2")
    assert parse_avro(good) == [{"x": 1}]
    # unknown codec names refuse
    assert parse_avro(
        _hand_ocf(_LONG_REC, [bytes([2])], [1], codec=b"lz4")
    ) is None


def test_reader_schema_resolution():
    import copy

    from queryengine_spark.sources.avro import AVRO_SCHEMA

    reader = copy.deepcopy(AVRO_SCHEMA)
    f = next(x for x in reader["fields"] if x["name"] == "name")
    f["name"] = "title"
    f["aliases"] = ["name"]
    reader["fields"] = [
        x for x in reader["fields"] if x["name"] != "payload"
    ]
    reader["fields"].append({"name": "extra", "type": "int", "default": 7})
    next(x for x in reader["fields"] if x["name"] == "rid")["type"] = "double"
    got = parse_avro(make_avro_shard(5), reader_schema=reader)
    exp = avro_record(5, 0)
    g = got[0]
    assert g["title"] == exp["name"]          # alias rename
    assert "payload" not in g                 # writer-only field dropped
    assert g["extra"] == 7                    # reader default injected
    assert g["rid"] == float(exp["rid"]) and isinstance(g["rid"], float)
    # string->bytes promotion
    r2 = copy.deepcopy(AVRO_SCHEMA)
    next(x for x in r2["fields"] if x["name"] == "name")["type"] = "bytes"
    assert parse_avro(make_avro_shard(4), reader_schema=r2)[0][
        "name"
    ] == avro_record(4, 0)["name"].encode()
    # a reader field with no writer match and no default refuses
    bad = copy.deepcopy(AVRO_SCHEMA)
    bad["fields"].append({"name": "nodefault", "type": "int"})
    assert parse_avro(make_avro_shard(5), reader_schema=bad) is None
    # an unresolvable type change refuses (long -> boolean)
    bad2 = copy.deepcopy(AVRO_SCHEMA)
    next(x for x in bad2["fields"] if x["name"] == "rid")["type"] = "boolean"
    assert parse_avro(make_avro_shard(5), reader_schema=bad2) is None
