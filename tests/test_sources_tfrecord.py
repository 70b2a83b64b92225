"""From-scratch TFRecord / tf.Example reader (sources/tfrecord.py):
CRC32C against the published check value, framing round-trips, hand
wire-format vectors (unknown-field skipping, unpacked lists,
negative varints), and strict-refusal probes."""

from __future__ import annotations

import random
import struct

import pytest

from queryengine_spark.sources.tfrecord import (
    crc32c,
    make_example,
    make_tfrecord_shard,
    masked_crc32c,
    parse_example,
    parse_tfrecord,
    tfr_n_recs,
    tfr_toks,
    tfr_txt,
    tfr_w_q,
)


def test_crc32c_published_check_value():
    """The CRC-32/ISCSI (Castagnoli) check value for '123456789' —
    the externally-pinnable anchor for the framing layer."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # masking is the TensorFlow rotate-and-add
    c = crc32c(b"length bytes")
    assert masked_crc32c(b"length bytes") == (
        (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    )


@pytest.mark.parametrize("s", list(range(10)))
def test_roundtrip_matches_formula(s):
    from queryengine_spark.sources.tfrecord import parse_sequence_example

    if s % 4 == 2:  # r12: SequenceExample shards
        got = parse_tfrecord(
            make_tfrecord_shard(s), record_parser=parse_sequence_example
        )
        assert got is not None and len(got) == tfr_n_recs(s)
        for i, ex in enumerate(got):
            assert ex["context"]["rid"] == ("int64", [s * 1000 + i])
            toks = [v for f in ex["lists"]["toks"] for v in f[1]]
            assert toks == tfr_toks(s, i)
            assert ex["lists"]["txt"] == [("bytes", [tfr_txt(s, i)])]
            kind, vals = ex["context"]["w"]
            assert kind == "float" and vals == [tfr_w_q(s, i) / 8.0]
        return
    got = parse_tfrecord(make_tfrecord_shard(s))
    assert got is not None and len(got) == tfr_n_recs(s)
    for i, ex in enumerate(got):
        assert ex["rid"] == ("int64", [s * 1000 + i])
        assert ex["toks"] == ("int64", tfr_toks(s, i))
        assert ex["txt"] == ("bytes", [tfr_txt(s, i)])
        kind, vals = ex["w"]
        assert kind == "float" and vals == [tfr_w_q(s, i) / 8.0]


def test_negative_int64_exercised():
    """i % 6 == 2 rows carry a negative token — the 10-byte varint
    two's-complement path must really occur in the corpus."""
    assert any(
        any(v < 0 for v in tfr_toks(3, i)) for i in range(tfr_n_recs(3))
    )
    b = make_example(3, 2)
    assert b"\x01" in b  # 10-byte varints end in 0x01
    ex = parse_example(b)
    assert min(ex["toks"][1]) < 0


def test_hand_unknown_field_skipping():
    """Unknown fields at every message level skip per spec instead
    of refusing (forward compatibility — the wire-format rule)."""
    base = make_example(1, 1)
    # prepend an unknown varint field (field 9, wire 0) to Example
    patched = bytes([9 << 3 | 0, 0x2A]) + base
    assert parse_example(patched) == parse_example(base)
    # unknown 64-bit field (field 7, wire 1)
    patched = bytes([7 << 3 | 1]) + b"\x00" * 8 + base
    assert parse_example(patched) == parse_example(base)


def test_hand_unpacked_int64_list():
    """Int64List values may arrive UNPACKED (one varint field per
    value) — our writer packs, real writers sometimes don't."""
    # Feature{int64_list=3 -> Int64List{value=1}} with two unpacked
    # varint fields
    il = bytes([1 << 3 | 0, 5, 1 << 3 | 0, 7])
    feat = bytes([3 << 3 | 2, len(il)]) + il
    entry = (
        bytes([1 << 3 | 2, 1]) + b"k"
        + bytes([2 << 3 | 2, len(feat)]) + feat
    )
    feats = bytes([1 << 3 | 2, len(entry)]) + entry
    ex = bytes([1 << 3 | 2, len(feats)]) + feats
    assert parse_example(ex) == {"k": ("int64", [5, 7])}


def test_framing_refusals():
    good = make_tfrecord_shard(0)
    # flip a byte of the first record's data -> data CRC fails
    bad = bytearray(good)
    bad[14] ^= 1
    assert parse_tfrecord(bytes(bad)) is None
    # flip the length CRC
    bad = bytearray(good)
    bad[9] ^= 1
    assert parse_tfrecord(bytes(bad)) is None
    # trailing garbage / truncation
    assert parse_tfrecord(good + b"x") is None
    assert parse_tfrecord(good[:-3]) is None
    assert parse_tfrecord(b"") == []
    # gzip flavor: trailing garbage refuses
    gz = make_tfrecord_shard(1)
    assert parse_tfrecord(gz) is not None
    assert parse_tfrecord(gz + b"junk") is None
    # duplicate Feature oneof refuses
    il = bytes([1 << 3 | 2, 1, 3])
    feat = (bytes([3 << 3 | 2, len(il)]) + il) * 2
    entry = (
        bytes([1 << 3 | 2, 1]) + b"k"
        + bytes([2 << 3 | 2, len(feat)]) + feat
    )
    feats = bytes([1 << 3 | 2, len(entry)]) + entry
    ex = bytes([1 << 3 | 2, len(feats)]) + feats
    assert parse_example(ex) is None


def test_truncations_and_bitflips_never_crash():
    for s in (0, 1):
        b = make_tfrecord_shard(s)
        step = max(1, len(b) // 40)
        for cut in range(0, len(b), step):
            parse_tfrecord(b[:cut])  # must not raise
        rng = random.Random(s)
        for _ in range(150):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_tfrecord(bytes(fb))  # must not raise


def test_spark_examples_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.sources.tfrecord import (
        synthesize_tfrecord,
        tfrecord_examples,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("shard_id"))
    df = tfrecord_examples(synthesize_tfrecord(ids))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert len(rows) == sum(tfr_n_recs(s) for s in range(6))
    for r in rows[:40]:
        s, i = r.shard_id, r.rec_idx
        assert r.rid == s * 1000 + i
        assert r.toks_sum == sum(tfr_toks(s, i))
        assert r.txt_sum == sum(tfr_txt(s, i))
        assert r.w_q == tfr_w_q(s, i)
    _ = struct


# ---------------------------------------------------------------------------
# r12 ADVICE regressions
# ---------------------------------------------------------------------------


def test_gzip_bomb_refuses_bounded():
    """A small gzip shard expanding past the per-shard inflate
    ceiling refuses via the max_length decompress (input left in
    unconsumed_tail) instead of materializing the bomb (r12
    ADVICE)."""
    import gzip

    from queryengine_spark.sources.tfrecord import _MAX_INFLATE

    bomb = gzip.compress(b"\x00" * (_MAX_INFLATE + 1), 6)
    assert len(bomb) < 1 << 20  # it really is a bomb
    assert parse_tfrecord(bomb) is None


def test_spark_alien_feature_set_skipped(spark):
    """A valid TFRecord stream whose Examples carry a DIFFERENT
    feature set parses but breaks the fixed projection — the shard
    must skip like a parse refusal, not fail the task (r12
    ADVICE)."""
    from queryengine_spark.sources.tfrecord import (
        _feature_int64,
        _pb_len,
        tfrecord_examples,
    )

    entry = _pb_len(1, b"zz") + _pb_len(2, _feature_int64([7]))
    ex = _pb_len(1, _pb_len(1, entry))
    assert parse_example(ex) == {"zz": ("int64", [7])}  # parses fine...
    ln = struct.pack("<Q", len(ex))
    alien = (
        ln
        + struct.pack("<I", masked_crc32c(ln))
        + ex
        + struct.pack("<I", masked_crc32c(ex))
    )
    assert parse_tfrecord(alien) is not None
    good = make_tfrecord_shard(0)

    assets = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(alien))],
        "shard_id long, payload binary",
    )
    rows = tfrecord_examples(assets).collect()
    assert len(rows) == tfr_n_recs(0)
    assert {r.shard_id for r in rows} == {0}


# ---------------------------------------------------------------------------
# r12: SequenceExample
# ---------------------------------------------------------------------------


def test_sequence_example_structure_really_exercised():
    """Multi-entry FeatureLists must actually occur (token lists
    split into ≤3-value Features), and the wire shape must carry
    BOTH context and feature_lists."""
    from queryengine_spark.sources.tfrecord import (
        make_sequence_example,
        parse_sequence_example,
    )

    found_multi = False
    for i in range(tfr_n_recs(2)):
        ex = parse_sequence_example(make_sequence_example(2, i))
        assert set(ex["context"]) == {"rid", "w"}
        assert set(ex["lists"]) == {"toks", "txt"}
        if len(ex["lists"]["toks"]) > 1:
            found_multi = True
    assert found_multi


def test_sequence_example_refusals_and_skips():
    from queryengine_spark.sources.tfrecord import (
        _pb_len,
        make_sequence_example,
        parse_sequence_example,
    )

    good = make_sequence_example(2, 0)
    # truncations never crash
    for cut in range(len(good)):
        parse_sequence_example(good[:cut])
    # unknown top-level fields skip per spec
    ex = parse_sequence_example(good + _pb_len(9, b"ignored"))
    assert ex is not None and "rid" in ex["context"]
    # a FeatureList entry with a non-LEN Feature refuses
    bad_fl = _pb_len(1, _pb_len(1, b"z") + _pb_len(2, bytes([1 << 3, 5])))
    assert parse_sequence_example(_pb_len(2, bad_fl)) is None


def test_seq_shards_parse_as_examples_mismatch_skips(spark):
    """A SequenceExample shard read through the tf.Example parser
    yields a different feature shape — the projection's shape guard
    must skip it rather than crash (the %4 routing prevents this in
    the corpus; this pins the failure mode)."""
    from queryengine_spark.sources.tfrecord import tfrecord_examples

    # shard_id 0 routes as Example, but carries SEQ payload bytes
    seq_payload = make_tfrecord_shard(2)
    assets = spark.createDataFrame(
        [(0, bytearray(seq_payload))], "shard_id long, payload binary"
    )
    assert tfrecord_examples(assets).collect() == []
