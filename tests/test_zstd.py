"""From-scratch RFC 8878 zstd decoder (sources/zstd.py): round-trips
against the real zstd encoder bundled in pyarrow (public Spark
dependency — encode/test side only), hand-built frames pinning each
header/block/mode branch, and strict-refusal probes."""

from __future__ import annotations

import random
import struct

import pytest

from queryengine_spark.sources.zstd import (
    ZSTD_MAGIC,
    decompress_zstd,
    xxh64,
)


def _zc(level: int):
    pa = pytest.importorskip("pyarrow")
    if not pa.Codec.is_available("zstd"):
        pytest.skip("pyarrow zstd codec unavailable")
    return pa.Codec("zstd", compression_level=level)


def _compress(data: bytes, level: int = 3) -> bytes:
    return bytes(_zc(level).compress(data))


# ---------------------------------------------------------------- XXH64
def test_xxh64_published_vectors():
    """The xxHash reference's own published sanity vectors."""
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # structural: every length residue around the 32/8/4/1 chunking
    for n in range(0, 70):
        h = xxh64(bytes(range(n)))
        assert 0 <= h < 1 << 64


# ------------------------------------------------------------ round-trips
CORPORA = [
    b"",
    b"a",
    b"ab" * 3,
    b"hello world " * 100,
    bytes(range(256)) * 40,
    b"\x00" * 10000,
    b"abcabcabcabd" * 500,
]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_levels(level):
    for data in CORPORA:
        assert decompress_zstd(_compress(data, level)) == data


def test_roundtrip_incompressible():
    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(5000))
    assert decompress_zstd(_compress(data, 3)) == data


def test_roundtrip_multiblock():
    """>128 KiB content forces multiple blocks — exercises the
    cross-block repeat modes (sequence tables, treeless literals) and
    the repeat-offset history carrying across blocks."""
    rng = random.Random(7)
    words = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(2, 12)))
        for _ in range(500)
    ]
    doc = b" ".join(rng.choice(words) for _ in range(60_000))
    assert len(doc) > 3 * (1 << 17)
    for level in (1, 3, 19):
        assert decompress_zstd(_compress(doc, level)) == doc


def test_roundtrip_tar_shards():
    from queryengine_spark.sources.archives import make_tar_shard

    for sid in range(8):
        raw = make_tar_shard(sid)
        assert decompress_zstd(_compress(raw, 6)) == raw


# ------------------------------------------------------------ hand vectors
def _raw_block_frame(content: bytes, fhd: int = 0x20) -> bytearray:
    """Single-segment frame: FHD, 1-byte FCS, one raw last-block."""
    out = bytearray(ZSTD_MAGIC)
    out += bytes([fhd, len(content)])
    out += struct.pack("<I", 1 | (0 << 1) | (len(content) << 3))[:3]
    out += content
    return out


def test_hand_raw_and_rle_blocks():
    assert bytes(decompress_zstd(bytes(_raw_block_frame(b"abc")))) == b"abc"
    # RLE block: size field is the REGENERATED size, body is 1 byte
    fr = bytearray(ZSTD_MAGIC) + bytes([0x20, 40])
    fr += struct.pack("<I", 1 | (1 << 1) | (40 << 3))[:3] + b"Q"
    assert decompress_zstd(bytes(fr)) == b"Q" * 40


def test_hand_content_checksum():
    content = b"checksummed payload"
    fr = _raw_block_frame(content, fhd=0x20 | 0x04)
    fr += struct.pack("<I", xxh64(content) & 0xFFFFFFFF)
    assert decompress_zstd(bytes(fr)) == content
    bad = bytearray(fr)
    bad[-1] ^= 1
    assert decompress_zstd(bytes(bad)) is None


def test_refusals():
    content = b"refusal probes"
    good = bytes(_raw_block_frame(content))
    # content-size lie
    lie = bytearray(good)
    lie[5] += 1
    assert decompress_zstd(bytes(lie)) is None
    # nonzero dictionary id
    fr = bytearray(ZSTD_MAGIC) + bytes([0x20 | 0x01, 7, 3])
    fr += struct.pack("<I", 1 | (0 << 1) | (3 << 3))[:3] + b"abc"
    assert decompress_zstd(bytes(fr)) is None
    # reserved FHD bit
    assert decompress_zstd(bytes(_raw_block_frame(content, 0x20 | 0x08))) is None
    # reserved block type
    fr = bytearray(ZSTD_MAGIC) + bytes([0x20, 3])
    fr += struct.pack("<I", 1 | (3 << 1) | (3 << 3))[:3] + b"abc"
    assert decompress_zstd(bytes(fr)) is None
    # an ALL-skippable buffer carries no content claim: refuse
    assert decompress_zstd(b"\x50\x2a\x4d\x18\x04\x00\x00\x00abcd") is None
    # truncated skippable payload
    assert (
        decompress_zstd(good + b"\x50\x2a\x4d\x18\x08\x00\x00\x00ab") is None
    )
    # trailing garbage still refuses
    assert decompress_zstd(good + b"x") is None
    # wrong magic / empty
    assert decompress_zstd(b"") is None
    assert decompress_zstd(b"\x00" * 32) is None


def test_multi_frame_streams():
    """RFC 8878 §3: a stream is one or MORE frames (``cat a.zst
    b.zst``, pzstd output); skippable frames (§3.1.2) are ignored
    wherever they sit."""
    a, b_ = b"first frame " * 40, b"second frame " * 30
    fa, fb = _compress(a, 3), _compress(b_, 9)
    assert decompress_zstd(fa + fb) == a + b_
    assert decompress_zstd(fa + fa + fb) == a + a + b_
    # hand frames concatenate too (checksum per-frame)
    ga = bytes(_raw_block_frame(a[:20]))
    assert decompress_zstd(ga + fb) == a[:20] + b_
    # skippable frames: leading, between, trailing — all ignored;
    # every magic in the 0x184D2A50..5F family works
    for low in (0x50, 0x57, 0x5F):
        sk = bytes([low]) + b"\x2a\x4d\x18" + struct.pack("<I", 5) + b"HELLO"
        assert decompress_zstd(sk + fa) == a
        assert decompress_zstd(fa + sk + fb) == a + b_
        assert decompress_zstd(fa + sk) == a
    # zero-length skippable payload
    sk0 = b"\x50\x2a\x4d\x18" + struct.pack("<I", 0)
    assert decompress_zstd(sk0 + fa + sk0) == a
    # a corrupt SECOND frame refuses the whole stream
    bad = bytearray(fb)
    bad[5] ^= 0xFF
    assert decompress_zstd(fa + bytes(bad)) is None


def test_multi_frame_window_isolation():
    """Frames are independent: a match offset reaching before its own
    frame's start (into the previous frame's output) must refuse, not
    serve bytes across the frame boundary. Unit-level probe of the
    sequence executor with a non-zero frame_base."""
    from queryengine_spark.sources.zstd import _exec_sequences

    # within-frame match: fine (offset 2 against 4 own bytes)
    out = bytearray(b"PREVFRAME!")
    _exec_sequences(out, b"abcd", [(4, 2 + 3, 3)], [1, 4, 8], 10, 1 << 20)
    assert bytes(out) == b"PREVFRAME!abcdcdc"
    # the SAME sequence with only 1 own byte must refuse even though
    # the combined buffer is long enough
    out = bytearray(b"PREVFRAME!")
    with pytest.raises(ValueError):
        _exec_sequences(out, b"a", [(1, 2 + 3, 3)], [1, 4, 8], 10, 1 << 20)
    # a within-frame offset farther back than the declared window
    # refuses (RFC 8878 §3.1.1.1.2)
    out = bytearray()
    with pytest.raises(ValueError):
        _exec_sequences(out, b"abcd", [(4, 2 + 3, 3)], [1, 4, 8], 0, 1)
    # frame_base 0 (single frame) keeps the old semantics
    out = bytearray()
    _exec_sequences(out, b"xy", [(2, 2 + 3, 4)], [1, 4, 8], 0, 1 << 20)
    assert bytes(out) == b"xyxyxy"


def test_truncations_never_crash():
    data = b"the quick brown fox " * 400
    f = _compress(data, 3)
    assert decompress_zstd(f) == data
    step = max(1, len(f) // 60)
    for cut in range(0, len(f), step):
        assert decompress_zstd(f[:cut]) is None


def test_bitflips_never_crash():
    """Every single-bit corruption must either refuse or decode to
    SOMETHING (entropy-coded data without a checksum can decode
    consistently-wrong) — never raise into the Spark task."""
    data = b"zstd bit flip probe " * 300
    f = _compress(data, 3)
    rng = random.Random(1)
    for _ in range(200):
        i = rng.randrange(len(f))
        fb = bytearray(f)
        fb[i] ^= 1 << rng.randrange(8)
        decompress_zstd(bytes(fb))  # must not raise


# ---------------------------------------------------------------------------
# r12: raw-content dictionaries
# ---------------------------------------------------------------------------


def _skip(payload, nib=0xD):
    return (
        bytes([0x50 | nib]) + b"\x2a\x4d\x18"
        + len(payload).to_bytes(4, "little") + payload
    )


def test_dict_frame_roundtrip_and_refusals():
    from queryengine_spark.sources.zstd import build_dict_frame

    rng = random.Random(12)
    for n, k in ((64, 8), (500, 100), (5000, 1000), (40, 40),
                 (200000, 4000), (9, 8)):
        content = bytes(rng.randrange(256) for _ in range(n))
        fr = build_dict_frame(content, k)
        assert decompress_zstd(fr, dictionary=content[:k]) == content
        # no dictionary: the far offset reaches before frame start
        assert decompress_zstd(fr) is None
        # WRONG dictionary: caught by the content checksum
        assert decompress_zstd(fr, dictionary=bytes(k)) is None


def test_in_band_dictionary_semantics():
    from queryengine_spark.sources.zstd import build_dict_frame

    rng = random.Random(13)
    content = bytes(rng.randrange(256) for _ in range(3000))
    fr = build_dict_frame(content, 600)
    d = content[:600]
    # leading 0x184D2A5D skippable frame carries the dictionary
    assert decompress_zstd(_skip(d) + fr) == content
    # ... possibly itself zstd-compressed (the CC convention)
    assert decompress_zstd(_skip(_compress(d, 3)) + fr) == content
    # entropy-table dictionaries (structured magic) refuse
    assert decompress_zstd(
        _skip(b"\x37\xa4\x30\xec" + b"x" * 32) + fr) is None
    assert decompress_zstd(
        fr, dictionary=b"\x37\xa4\x30\xec" + b"x" * 32) is None
    # a non-0x5D leading skippable is NOT a dictionary
    assert decompress_zstd(_skip(d, nib=0xE) + fr) is None
    # a 0x5D frame that is NOT leading stays a plain skippable
    plain = _compress(b"plain " * 100, 3)
    assert decompress_zstd(plain + _skip(d) + fr) is None
    # an unused in-band dictionary leaves plain streams untouched
    assert decompress_zstd(_skip(b"unrelated") + plain) == b"plain " * 100


def test_dict_never_crashes_on_damage():
    from queryengine_spark.sources.zstd import build_dict_frame

    rng = random.Random(14)
    content = bytes(rng.randrange(256) for _ in range(800))
    stream = _skip(content[:200]) + build_dict_frame(content, 200)
    step = max(1, len(stream) // 40)
    for cut in range(0, len(stream), step):
        decompress_zstd(stream[:cut])  # must not raise
    for _ in range(200):
        i = rng.randrange(len(stream))
        fb = bytearray(stream)
        fb[i] ^= 1 << rng.randrange(8)
        decompress_zstd(bytes(fb))  # must not raise
