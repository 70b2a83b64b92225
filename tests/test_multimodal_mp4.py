"""MP4/ISO-BMFF container (multimodal/mp4.py): parser pinned against
the writer's layout plus hand-mutated byte probes — the lying-offset,
fragmentation, and foreign-codec cases a real corpus contains."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from queryengine_spark.multimodal.jpeg import block_dc, decode_jpeg_dc
from queryengine_spark.multimodal.mp4 import (
    MP4_FM,
    make_mp4,
    mp4_frame_jpeg,
    mp4_video_params,
    parse_mp4,
)


@pytest.mark.parametrize("a", list(range(12)))
def test_roundtrip_matches_formula(a):
    bw, bh, nf, fps = mp4_video_params(a)
    parsed = parse_mp4(make_mp4(a))
    assert parsed is not None
    w, h, nf2, fps2, frames = parsed
    assert (w, h, nf2, fps2) == (8 * bw, 8 * bh, nf, fps)
    assert len(frames) == nf
    for f, fb in enumerate(frames):
        assert fb == mp4_frame_jpeg(a, f)
        img = decode_jpeg_dc(fb)
        assert img is not None and img.shape == (h, w), (a, f)
        exp = sum(
            64 * (block_dc(a + MP4_FM * f, bx, by) + 128)
            for by in range(bh)
            for bx in range(bw)
        )
        assert int(img.astype(np.int64).sum()) == exp, (a, f)


def test_two_per_chunk_layout_forces_stsc_walk():
    """nf values 2..6 must include both all-full-chunk layouts (one
    stsc run) and a short final chunk (two runs) — a parser that
    assumes one sample per chunk cannot pass the roundtrip above."""
    odd = even = False
    for a in range(10):
        nf = mp4_video_params(a)[2]
        odd |= bool(nf % 2)
        even |= not nf % 2
    assert odd and even


def _find(b: bytes, tag: bytes) -> int:
    i = b.find(tag)
    assert i > 0, tag
    return i


def test_lying_stco_offset_refused():
    b = bytearray(make_mp4(5))
    i = _find(b, b"stco")
    # first chunk offset lives 8 bytes after the fourcc (verflags +
    # entry_count); point it past the mdat payload
    (off,) = struct.unpack_from(">I", b, i + 12)
    struct.pack_into(">I", b, i + 12, off + 1 << 20)
    assert parse_mp4(bytes(b)) is None


def test_foreign_codec_refused():
    b = bytearray(make_mp4(3))
    i = _find(b, b"jpeg")  # the stsd sample-entry fourcc
    b[i : i + 4] = b"avc1"
    assert parse_mp4(bytes(b)) is None


def test_inconsistent_fragment_signals_refused():
    """r11: genuine hybrid files (moov prefix + moofs) now PARSE —
    but INCONSISTENT fragment signals still refuse: an empty mvex
    box (no trex) inside a sample-carrying moov, and a bare moof
    with no mvex announcing it."""
    good = make_mp4(4)
    # an empty mvex (no trex) inside a moov whose stbl carries samples
    i = _find(good, b"moov")
    moov_start = i - 4
    (msize,) = struct.unpack_from(">I", good, moov_start)
    mvex = struct.pack(">I", 8) + b"mvex"
    patched = bytearray(good[: moov_start + msize] + mvex)
    struct.pack_into(">I", patched, moov_start, msize + 8)
    assert parse_mp4(bytes(patched)) is None
    # a top-level moof appended to a progressive file (no mvex)
    assert parse_mp4(good + struct.pack(">I", 8) + b"moof") is None


@pytest.mark.parametrize("a", [7, 23, 39])
def test_legacy_implicit_base_roundtrip(a):
    """r11: pre-iso5 implicit traf base addressing (no tfhd
    addressing flag) decodes via the §8.8.7 moof-start default and
    matches the default-base-is-moof twin byte for byte."""
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    legacy = make_mp4_fragmented(a, legacy_base=True)
    modern = make_mp4_fragmented(a)
    assert legacy != modern  # the tfhd flag really differs
    got = parse_mp4(legacy)
    assert got is not None
    assert got == parse_mp4(modern)


@pytest.mark.parametrize("a", [15, 31, 47])
def test_hybrid_moov_prefix_plus_fragments_roundtrip(a):
    """r11: hybrid faststart files — frame 0 in the moov's own
    sample tables, the rest in moof/mdat fragments — decode to the
    same frames as the pure-progressive twin."""
    from queryengine_spark.multimodal.mp4 import make_mp4_hybrid

    got = parse_mp4(make_mp4_hybrid(a))
    assert got is not None
    assert got == parse_mp4(make_mp4(a))


def test_hybrid_lying_tfdt_refused():
    """A hybrid file whose first fragment's tfdt ignores the
    moov-resident prefix (claims baseMediaDecodeTime 0) refuses."""
    from queryengine_spark.multimodal.mp4 import make_mp4_hybrid

    b = bytearray(make_mp4_hybrid(15))
    i = _find(b, b"tfdt")  # first fragment's tfdt (v1: u64 at +4)
    (base_time,) = struct.unpack_from(">Q", b, i + 8)
    assert base_time != 0  # the prefix really is accounted for
    struct.pack_into(">Q", b, i + 8, 0)
    assert parse_mp4(bytes(b)) is None


def test_zero_length_stco_body_refused():
    """r10 ADVICE repro: a crafted file whose stco has a zero-length
    body at EOF must return the documented None refusal, not raise
    struct.error into the Spark task."""
    good = make_mp4(2)
    i = _find(good, b"stco")
    stco_start = i - 4
    (old_size,) = struct.unpack_from(">I", good, stco_start)
    delta = old_size - 12  # keep size+fourcc+verflags, drop count+offsets
    # stco closes stbl/minf/mdia/trak/moov in this writer and moov is
    # the last top-level box, so truncating it and shrinking every
    # ancestor's size keeps the box walk structurally valid — the
    # entry-count read itself is what lands at EOF
    patched = bytearray(good[: stco_start + 12])
    struct.pack_into(">I", patched, stco_start, 12)
    for tag in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        j = _find(bytes(patched), tag) - 4
        (sz,) = struct.unpack_from(">I", patched, j)
        struct.pack_into(">I", patched, j, sz - delta)
    assert parse_mp4(bytes(patched)) is None


def test_stts_stsz_disagreement_refused():
    b = bytearray(make_mp4(6))
    i = _find(b, b"stts")
    # sample count of the single run lives at +8 after the fourcc
    (cnt,) = struct.unpack_from(">I", b, i + 8)
    struct.pack_into(">I", b, i + 8, cnt + 1)
    assert parse_mp4(bytes(b)) is None


def test_dims_disagreement_refused():
    b = bytearray(make_mp4(7))
    i = _find(b, b"tkhd")
    # tkhd width is 8 bytes from the box end; halve it
    th_end = i - 4 + struct.unpack_from(">I", b, i - 4)[0]
    (tw,) = struct.unpack_from(">I", b, th_end - 8)
    struct.pack_into(">I", b, th_end - 8, tw // 2)
    assert parse_mp4(bytes(b)) is None


def test_truncation_and_garbage_refused():
    good = make_mp4(2)
    assert parse_mp4(good[: len(good) // 2]) is None
    assert parse_mp4(b"") is None
    assert parse_mp4(b"\x00" * 64) is None
    # RIFF/AVI bytes are not an MP4
    from queryengine_spark.multimodal.avi import make_avi

    assert parse_mp4(make_avi(2)) is None


def test_largesize_box_accepted():
    """Rewrite the mdat as a size-1 (64-bit largesize) box — spec
    form §4.2 — and require an identical parse. stco offsets shift
    by the 8 extra header bytes."""
    a = 9
    good = make_mp4(a)
    i = _find(good, b"mdat")
    mdat_start = i - 4
    (msize,) = struct.unpack_from(">I", good, mdat_start)
    payload = good[mdat_start + 8 : mdat_start + msize]
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    patched = bytearray(good[:mdat_start] + big + good[mdat_start + msize :])
    # every stco offset moves +8
    j = _find(patched, b"stco")
    (n,) = struct.unpack_from(">I", patched, j + 8)
    for k in range(n):
        (off,) = struct.unpack_from(">I", patched, j + 12 + 4 * k)
        struct.pack_into(">I", patched, j + 12 + 4 * k, off + 8)
    want = parse_mp4(good)
    got = parse_mp4(bytes(patched))
    assert got is not None
    assert got == want


def test_spark_frame_stats_match_formula(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.multimodal.mp4 import mp4_frame_stats, synthesize_mp4

    ids = spark.range(0, 10).select(F.col("id").alias("asset_id"))
    rows = mp4_frame_stats(synthesize_mp4(ids), stride=2).collect()
    want = []
    for a in range(10):
        bw, bh, nf, fps = mp4_video_params(a)
        for f in range(0, nf, 2):
            s = sum(
                64 * (block_dc(a + MP4_FM * f, bx, by) + 128)
                for by in range(bh)
                for bx in range(bw)
            )
            want.append((a, f, nf, fps, 8 * bw, 8 * bh, s))
    got = sorted(
        (r.asset_id, r.frame_idx, r.n_frames, r.fps, r.width, r.height, r.sum_lum)
        for r in rows
    )
    assert got == sorted(want)


def test_stats_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.multimodal.mp4 import mp4_frame_stats, synthesize_mp4

    ids = spark.range(0, 4).select(F.col("id").alias("asset_id"))
    plan = (
        mp4_frame_stats(synthesize_mp4(ids))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_co64_offset_table_accepted():
    """Rewrite the stco as a co64 (64-bit offsets — the >4 GB form,
    14496-12 §8.7.5) and require an identical parse."""
    good = make_mp4(8)
    i = _find(good, b"stco")
    box_start = i - 4
    (bsize,) = struct.unpack_from(">I", good, box_start)
    (n,) = struct.unpack_from(">I", good, i + 8)
    offs = struct.unpack_from(f">{n}I", good, i + 12)
    co64 = (
        struct.pack(">I", 16 + 8 * n)
        + b"co64"
        + struct.pack(">I", 0)
        + struct.pack(">I", n)
        + b"".join(struct.pack(">Q", o) for o in offs)
    )
    patched = bytearray(good[:box_start] + co64 + good[box_start + bsize :])
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov each grow by
    # the co64/stco size delta)
    delta = len(co64) - bsize
    for tag in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        j = _find(patched, tag)
        (sz,) = struct.unpack_from(">I", patched, j - 4)
        struct.pack_into(">I", patched, j - 4, sz + delta)
    want = parse_mp4(good)
    got = parse_mp4(bytes(patched))
    assert got == want and got is not None


def test_both_offset_tables_refused():
    """A file carrying BOTH stco and co64 is structurally ambiguous —
    refuse, never pick one."""
    good = make_mp4(8)
    i = _find(good, b"stco")
    box_start = i - 4
    (bsize,) = struct.unpack_from(">I", good, box_start)
    dup = bytearray(good[box_start : box_start + bsize])
    dup[4:8] = b"co64"  # same size: 32-bit entries reinterpreted —
    # content nonsense is fine, the dual-table refusal fires first
    patched = bytearray(
        good[: box_start + bsize] + bytes(dup) + good[box_start + bsize :]
    )
    for tag in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        j = _find(patched, tag)
        (sz,) = struct.unpack_from(">I", patched, j - 4)
        struct.pack_into(">I", patched, j - 4, sz + bsize)
    assert parse_mp4(bytes(patched)) is None


@pytest.mark.parametrize("a", list(range(8)))
def test_fragmented_roundtrip_equals_progressive(a):
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    assert parse_mp4(make_mp4_fragmented(a)) == parse_mp4(make_mp4(a))


def test_fragment_sequence_gap_refused():
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    a = 6  # nf=4 -> two fragments
    b = bytearray(make_mp4_fragmented(a))
    i = _find(b, b"mfhd")  # first fragment's sequence number
    struct.pack_into(">I", b, i + 8, 2)  # duplicate/do-over sequence
    assert parse_mp4(bytes(b)) is None


def test_fragment_lying_trun_offset_refused():
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    a = 6
    b = bytearray(make_mp4_fragmented(a))
    i = _find(b, b"trun")
    # data_offset at +12 past the fourcc (verflags + count)
    (doff,) = struct.unpack_from(">i", b, i + 12)
    struct.pack_into(">i", b, i + 12, doff + (1 << 20))
    assert parse_mp4(bytes(b)) is None


def test_fragment_without_mvex_refused():
    """moofs in a file whose moov never announced fragmentation are
    malformed — refuse, don't guess trex defaults."""
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    good = make_mp4_fragmented(5)
    i = _find(good, b"mvex")
    box_start = i - 4
    (bsize,) = struct.unpack_from(">I", good, box_start)
    # excise the mvex and shrink moov's size
    patched = bytearray(good[:box_start] + good[box_start + bsize :])
    j = _find(patched, b"moov")
    (msz,) = struct.unpack_from(">I", patched, j - 4)
    struct.pack_into(">I", patched, j - 4, msz - bsize)
    assert parse_mp4(bytes(patched)) is None


def test_fragment_variable_duration_refused():
    """A per-sample duration differing from the constant delta must
    refuse (MJPEG writers emit constant frame timing)."""
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    a = 6
    good = make_mp4_fragmented(a)
    i = _find(good, b"trun")
    (vf,) = struct.unpack_from(">I", good, i + 4)
    assert vf & 0x000100 == 0  # writer uses trex default durations
    # flip the trex default duration so timescale % delta != 0
    # (trex body: verflags, track_ID, default_sdi, default_duration —
    # the duration sits 16 bytes past the fourcc)
    j = _find(good, b"trex")
    b = bytearray(good)
    struct.pack_into(">I", b, j + 16, 101)  # default_sample_duration
    assert parse_mp4(bytes(b)) is None


def test_fragment_multiple_truns_per_traf():
    """The parser walks MULTIPLE truns within one traf (real encoders
    split runs at I/P boundaries): hand-split the writer's single
    trun into two and require an identical parse."""
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    a = 6  # nf=4 -> fragments of 2 samples
    good = make_mp4_fragmented(a)
    want = parse_mp4(good)
    i = _find(good, b"trun")
    tr_start = i - 4
    (tsz,) = struct.unpack_from(">I", good, tr_start)
    (n_s,) = struct.unpack_from(">I", good, i + 8)
    assert n_s == 2
    (doff,) = struct.unpack_from(">i", good, i + 12)
    s0, s1 = struct.unpack_from(">II", good, i + 16)
    flags = 0x000201
    trun_a = (
        struct.pack(">I", 24) + b"trun" + struct.pack(">I", flags)
        + struct.pack(">Ii", 1, doff) + struct.pack(">I", s0)
    )
    trun_b = (
        struct.pack(">I", 24) + b"trun" + struct.pack(">I", flags)
        + struct.pack(">Ii", 1, doff + s0) + struct.pack(">I", s1)
    )
    delta = len(trun_a) + len(trun_b) - tsz
    patched = bytearray(
        good[:tr_start] + trun_a + trun_b + good[tr_start + tsz :]
    )
    # grow the enclosing traf + moof sizes, then re-point both truns'
    # offsets (mdat header moved by delta)
    for tag in (b"traf", b"moof"):
        j = patched.find(tag)
        assert j > 0
        (sz,) = struct.unpack_from(">I", patched, j - 4)
        struct.pack_into(">I", patched, j - 4, sz + delta)
    j = patched.find(b"trun")
    struct.pack_into(">i", patched, j + 12, doff + delta)
    j2 = patched.find(b"trun", j + 4)
    struct.pack_into(">i", patched, j2 + 12, doff + delta + s0)
    got = parse_mp4(bytes(patched))
    assert got == want and got is not None


def test_tfdt_lying_clock_refused():
    """r10: tfdt baseMediaDecodeTime must equal the running sample
    duration — a fragment with a forged decode clock refuses."""
    from queryengine_spark.multimodal.mp4 import make_mp4_fragmented

    good = make_mp4_fragmented(6)  # nf=4 -> two fragments
    first = _find(good, b"tfdt")
    second = good.find(b"tfdt", first + 4)
    assert second > 0
    b = bytearray(good)
    struct.pack_into(">Q", b, second + 8, 1)
    assert parse_mp4(bytes(b)) is None
    # and the first fragment's base time must be zero
    b2 = bytearray(good)
    struct.pack_into(">Q", b2, first + 8, 7)
    assert parse_mp4(bytes(b2)) is None
