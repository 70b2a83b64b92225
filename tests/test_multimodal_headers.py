"""Media-container header parsing: pure-Python parser unit tests
(including formats the synthesizer never emits: GIF, JPEG, corrupt
and truncated inputs) plus the Spark round-trip synthesize→parse
equivalence with the arithmetic expectation."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from queryengine_spark.multimodal.headers import (
    make_png,
    make_wav,
    parse_header,
    parse_media_headers,
    png_params,
    synthesize_media,
    wav_params,
)


def test_parse_png_roundtrip():
    got = parse_header(make_png(640, 480))
    assert (got["fmt"], got["width"], got["height"]) == ("png", 640, 480)
    assert got["sample_rate"] is None and got["duration_ms"] is None


def test_parse_wav_roundtrip():
    got = parse_header(make_wav(16000, 2, 8000))
    assert got["fmt"] == "wav"
    assert got["sample_rate"] == 16000
    assert got["channels"] == 2
    assert got["duration_ms"] == 500  # 8000 samples @ 16 kHz


def test_parse_wav_walks_extra_chunks():
    # LIST chunk (odd length → word-aligned padding) before fmt/data
    wav = make_wav(8000, 1, 100)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = wav[:12] + extra + wav[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    got = parse_header(patched)
    assert (got["fmt"], got["sample_rate"], got["channels"]) == ("wav", 8000, 1)


def test_parse_gif():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    got = parse_header(gif)
    assert (got["fmt"], got["width"], got["height"]) == ("gif", 320, 200)


def test_parse_jpeg_sof_after_app_segments():
    app0 = b"\xff\xe0" + struct.pack(">H", 17) + b"JFIF\x00" + b"\x00" * 10
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 768, 1024) + b"\x03" + b"\x00" * 9
    got = parse_header(b"\xff\xd8" + app0 + dqt + sof0)
    assert (got["fmt"], got["width"], got["height"]) == ("jpeg", 1024, 768)


def test_parse_jpeg_skips_dht_c4_marker():
    # 0xC4 (DHT) must not be mistaken for a SOF marker
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00" * 3
    sof2 = b"\xff\xc2" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 10, 20) + b"\x01" + b"\x00" * 9
    got = parse_header(b"\xff\xd8" + dht + sof2)
    assert (got["fmt"], got["width"], got["height"]) == ("jpeg", 20, 10)


def test_parse_jpeg_fill_bytes_and_standalone_markers():
    # 0xFF padding before a marker and length-less standalone markers
    # (TEM, RST0-7) are spec-legal and must not desynchronize the walk
    fill = b"\xff"  # padding byte before the next marker
    tem = b"\xff\x01"
    rst = b"\xff\xd3"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 48, 64) + b"\x03" + b"\x00" * 9
    got = parse_header(b"\xff\xd8" + fill + tem + rst + sof0)
    assert (got["fmt"], got["width"], got["height"]) == ("jpeg", 64, 48)


def test_parse_jpeg_trailing_fill_bytes_no_crash():
    # payload ends inside a fill-byte run: the fill loop stops at
    # pos+1 == len(b) and there is no marker byte left to read
    # (ADVICE r2 — this used to IndexError)
    for payload in (
        b"\xff\xd8\xff\xff",
        b"\xff\xd8\xff\xff\xff",
        b"\xff\xd8\xff\xff\xff\xff\xff\xff\xff",
    ):
        got = parse_header(payload)
        assert got["fmt"] == "jpeg" and got["width"] is None


def test_parse_jpeg_corrupt_length_terminates():
    bad = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 0)  # seglen < 2
    got = parse_header(bad)
    assert got["fmt"] == "jpeg" and got["width"] is None


def test_parse_unknown_and_truncated():
    assert parse_header(b"")["fmt"] == "unknown"
    assert parse_header(b"plain text payload")["fmt"] == "unknown"
    # PNG signature but truncated before IHDR payload
    assert parse_header(b"\x89PNG\r\n\x1a\n\x00\x00")["fmt"] == "unknown"
    # RIFF but not WAVE
    avi = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    assert parse_header(avi)["fmt"] == "unknown"


def test_spark_roundtrip_matches_arithmetic(spark):
    ids = spark.range(0, 64).select(F.col("id").alias("asset_id"))
    rows = parse_media_headers(synthesize_media(ids)).collect()
    assert len(rows) == 64
    for r in rows:
        aid = r["asset_id"]
        if aid % 2 == 0:
            w, h = png_params(aid)
            assert (r["fmt"], r["width"], r["height"]) == ("png", w, h)
            assert r["n_bytes"] == 45
        else:
            rate, ch, n = wav_params(aid)
            assert (r["fmt"], r["sample_rate"], r["channels"]) == ("wav", rate, ch)
            assert r["duration_ms"] == n * 1000 // rate
            assert r["n_bytes"] == 44 + n * ch * 2


def test_parse_header_never_crashes_on_fuzz():
    """parse_header consumes arbitrary bytes from a media lake — on
    ANY input it must return the schema dict, never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = {"fmt", "width", "height", "sample_rate", "channels", "duration_ms"}

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(b):
        got = parse_header(b)
        assert set(got) == keys
        assert isinstance(got["fmt"], str)

    run()


def test_parse_header_fuzz_with_magic_prefixes():
    """Adversarial: valid magic bytes followed by garbage must parse
    or degrade gracefully, never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    prefixes = [
        b"\x89PNG\r\n\x1a\n",
        b"GIF89a",
        b"GIF87a",
        b"RIFF\x10\x00\x00\x00WAVE",
        b"\xff\xd8",
        b"RIFF",
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.sampled_from(prefixes), st.binary(max_size=200))
    def run(prefix, tail):
        got = parse_header(prefix + tail)
        assert isinstance(got["fmt"], str)

    run()
