"""PNG decoder correctness, independent of the synthesizer: a
hand-filtered byte vector pins the decoder (so a matched
encoder/decoder bug cannot cancel out), property tests cover the
filter inverses, and malformed-input probes pin the None paths."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from queryengine_spark.multimodal.png import (
    _filter_row,
    _paeth,
    _unfilter_row,
    decode_png,
    make_png_rgba,
    png_rgba_params,
    _pixel,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, stream: bytes) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )


def test_hand_filtered_vector():
    # 2x2 RGBA image, row 0 filter=1 (Sub), row 1 filter=4 (Paeth).
    # Raw pixels (r,g,b,a):
    #   row0: (10,20,30,40) (50,60,70,80)
    #   row1: (5,5,5,5)     (200,100,50,25)
    # Filtered bytes computed BY HAND from the PNG spec:
    # row0 Sub:  p0 unchanged (left=0) -> 10,20,30,40
    #            p1 = raw - left      -> 40,40,40,40
    # row1 Paeth: p0: left=0, up=row0 p0, ul=0 -> paeth predicts up
    #            -> (5-10)%256=251, (5-20)%256=241, 231, 221
    #             p1: left=(5,5,5,5), up=(50,60,70,80),
    #                 ul=(10,20,30,40); p=a+b-c = 45 for every byte:
    #                 byte0 pa=40 pb=5  pc=35 -> up=50   filt=200-50=150
    #                 byte1 pa=40 pb=15 pc=25 -> up=60   filt=100-60=40
    #                 byte2 pa=40 pb=25 pc=15 -> ul=30   filt=50-30=20
    #                 byte3 pa=40 pb=35 pc=5  -> ul=40   filt=(25-40)%256=241
    stream = bytes(
        [1, 10, 20, 30, 40, 40, 40, 40, 40]
        + [4, 251, 241, 231, 221, 150, 40, 20, 241]
    )
    img = decode_png(_png(2, 2, stream))
    assert img is not None
    expect = np.array(
        [
            [[10, 20, 30, 40], [50, 60, 70, 80]],
            [[5, 5, 5, 5], [200, 100, 50, 25]],
        ],
        dtype=np.uint8,
    )
    assert (img == expect).all()


def test_paeth_spec_cases():
    # spec precedence: a, then b, then c on ties
    assert _paeth(0, 0, 0) == 0
    assert _paeth(50, 40, 10) == 50  # p=80: pa=30 < pb=40 < pc=70 -> a
    assert _paeth(100, 1, 100) == 1  # p=1: pb=0 beats pa=pc=99 -> b
    assert _paeth(1, 200, 100) == 100  # p=101: pc=1 beats pa=100, pb=99 -> c


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_filter_roundtrip_all_types(ftype):
    rng = np.random.RandomState(ftype + 7)
    prev = bytes(rng.randint(0, 256, 40, dtype=np.uint8))
    raw = bytes(rng.randint(0, 256, 40, dtype=np.uint8))
    filt = _filter_row(ftype, raw, prev)
    assert _unfilter_row(ftype, filt, prev) == raw


def test_synthesized_assets_decode_to_formula():
    for aid in (0, 3, 17, 254, 100_000):
        img = decode_png(make_png_rgba(aid))
        w, h = png_rgba_params(aid)
        assert img is not None and img.shape == (h, w, 4)
        exp = np.array(
            [[_pixel(aid, x, y) for x in range(w)] for y in range(h)],
            dtype=np.uint8,
        )
        assert (img == exp).all()


def test_malformed_inputs_return_none():
    good = make_png_rgba(42)
    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n") is None
    # missing IEND only: IHDR + IDAT intact -> still decodes (decoder
    # stops at end of buffer); truncating INTO a chunk -> None
    assert decode_png(good[:-12]) is not None
    assert decode_png(good[:-20]) is None
    corrupted = bytearray(good)
    corrupted[40] ^= 0xFF  # inside IHDR/IDAT -> CRC fails
    assert decode_png(bytes(corrupted)) is None
    # syntactically valid chunks, but IDAT is not a zlib stream
    ihdr_ok = struct.pack(">II5B", 2, 2, 8, 6, 0, 0, 0)
    notz = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_ok)
        + _chunk(b"IDAT", b"not-a-zlib-stream")
        + _chunk(b"IEND", b"")
    )
    assert decode_png(notz) is None
    # color types 2 (truecolor, r9) and 4 (gray+alpha, r9) are
    # SUPPORTED: these all-zero 2x2 vectors decode (type 2 used to be
    # the wrong-color-type refusal probe); an UNDEFINED color type
    # (5) keeps the refusal path pinned
    ihdr = struct.pack(">II5B", 2, 2, 8, 2, 0, 0, 0)
    rgb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 6))))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(rgb)
    assert out is not None and out.shape == (2, 2, 3) and not out.any()
    ihdr_ga = struct.pack(">II5B", 2, 2, 8, 4, 0, 0, 0)
    ga = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_ga)
        + _chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 4))))
        + _chunk(b"IEND", b"")
    )
    out_ga = decode_png(ga)
    assert out_ga is not None and out_ga.shape == (2, 2, 2) and not out_ga.any()
    ihdr_bad = struct.pack(">II5B", 2, 2, 8, 5, 0, 0, 0)
    bad_ct = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_bad)
        + _chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 4))))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(bad_ct) is None
    # declared size mismatch: stream shorter than h*(1+4w)
    assert decode_png(_png(3, 3, bytes(5))) is None


# --- r5: grayscale (color type 0) ------------------------------------------


def test_gray_png_decodes_to_formula():
    import numpy as np

    from queryengine_spark.multimodal.png import (
        _gray_pixel,
        decode_png,
        make_png_gray,
        png_rgba_params,
    )

    for aid in (1, 7, 42, 999):
        img = decode_png(make_png_gray(aid))
        w, h = png_rgba_params(aid)
        assert img is not None and img.shape == (h, w)
        exp = np.array(
            [[_gray_pixel(aid, x, y) for x in range(w)] for y in range(h)],
            dtype=np.uint8,
        )
        assert (img == exp).all()


def test_gray_hand_filtered_vector():
    """Hand-computed Sub-filtered grayscale scanline with bpp=1: raw
    row [10, 13, 13, 200] -> filtered [10, 3, 0, 187] (left neighbor
    ONE byte back — the RGBA decoder would subtract 4 back). Pins the
    bpp dispatch independent of the synthesizer."""
    import struct
    import zlib

    import numpy as np

    from queryengine_spark.multimodal.png import _SIG, _chunk, decode_png

    stream = bytes([1, 10, 3, 0, 187])  # filter type 1 (Sub) + row
    comp = zlib.compress(stream)
    ihdr = struct.pack(">II5B", 4, 1, 8, 0, 0, 0, 0)
    b = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", comp) + _chunk(b"IEND", b"")
    img = decode_png(b)
    assert img is not None and img.shape == (1, 4)
    assert (img == np.array([[10, 13, 13, 200]], dtype=np.uint8)).all()


def test_gray_roundtrip_property():
    """Hypothesis: arbitrary grayscale pixel grids survive the
    filter-encode → container → decode pipeline for every filter
    type (the synthesizer's y%5 covers all five on multi-row
    images)."""
    import struct
    import zlib

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from queryengine_spark.multimodal.png import (
        _SIG,
        _chunk,
        _filter_row,
        decode_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 9),
        st.lists(st.lists(st.integers(0, 255), min_size=9, max_size=9), min_size=1, max_size=7),
    )
    def run(w, rows):
        rows = [r[:w] for r in rows]
        h = len(rows)
        prev = bytes(w)
        stream = bytearray()
        for y, r in enumerate(rows):
            raw = bytes(r)
            f = y % 5
            stream.append(f)
            stream += _filter_row(f, raw, prev, bpp=1)
            prev = raw
        ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
        b = (
            _SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b"")
        )
        img = decode_png(b)
        assert img is not None
        assert (img == np.array(rows, dtype=np.uint8)).all()

    run()


# --- r6: paletted (color type 3) + Adam7 interlace ---------------------------


def test_paletted_decodes_through_plte():
    """palette[index] composition, checked pixel-for-pixel against
    both formulas."""
    import numpy as np

    from queryengine_spark.multimodal.png import (
        PAL3_BM,
        PAL3_GM,
        PAL3_RM,
        _pal3_index,
        decode_png,
        make_png_palette,
        png_rgba_params,
    )

    for aid in (2, 6, 14, 102):
        img = decode_png(make_png_palette(aid))
        w, h = png_rgba_params(aid)
        assert img is not None and img.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                i = _pal3_index(aid, x, y)
                want = (
                    (PAL3_RM * i + aid) % 256,
                    (PAL3_GM * i + 7) % 256,
                    (PAL3_BM * i + 2 * aid) % 256,
                )
                assert tuple(img[y, x]) == want, (aid, x, y)


def test_paletted_out_of_range_index_refused():
    """A 2-entry palette with an index byte of 5 must be refused,
    not clamped or wrapped (the BMP paletted contract)."""
    import struct
    import zlib

    from queryengine_spark.multimodal import png as P

    plte = bytes([10, 20, 30, 40, 50, 60])  # 2 entries
    stream = bytes([0]) + bytes([0, 1, 5])  # filter None; index 5 invalid
    comp = zlib.compress(stream)
    ihdr = struct.pack(">II5B", 3, 1, 8, 3, 0, 0, 0)
    b = (
        P._SIG
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", comp)
        + P._chunk(b"IEND", b"")
    )
    assert P.decode_png(b) is None
    # same stream with valid indices decodes through the palette
    ok = zlib.compress(bytes([0]) + bytes([0, 1, 0]))
    b2 = (
        P._SIG
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", ok)
        + P._chunk(b"IEND", b"")
    )
    img = P.decode_png(b2)
    assert img is not None
    assert tuple(img[0, 0]) == (10, 20, 30)
    assert tuple(img[0, 1]) == (40, 50, 60)
    # paletted without any PLTE chunk → None
    b3 = P._SIG + P._chunk(b"IHDR", ihdr) + P._chunk(b"IDAT", ok) + P._chunk(b"IEND", b"")
    assert P.decode_png(b3) is None


def test_adam7_equals_sequential_twin():
    """The interlaced synthesis leg decodes pixel-identically to its
    sequential twin for every dims residue."""
    from queryengine_spark.multimodal.png import (
        decode_png,
        make_png_gray,
        make_png_gray_adam7,
    )

    for aid in (3, 7, 11, 19, 23, 77):
        seq = decode_png(make_png_gray(aid))
        il = decode_png(make_png_gray_adam7(aid))
        assert il is not None and (il == seq).all(), aid


def test_adam7_hand_positions_8x8():
    """Hand-pinned 8×8 Adam7 scatter: encode an image whose pixel
    value IS its pass number (1..7), decode, and check the spec's
    pass-membership pattern — pass 1 owns (0,0) only, pass 2 owns
    (4,0), pass 3 (0,4)/(4,4), pass 4 columns 2/6 of even-4 rows,
    pass 5 rows 2/6, pass 6 odd columns of even rows, pass 7 odd
    rows. A transposed or swapped scatter cannot pass."""
    import struct
    import zlib

    import numpy as np

    from queryengine_spark.multimodal import png as P

    w = h = 8
    # spec pass-number grid for an 8x8 tile (PNG spec figure)
    grid = np.array(
        [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ],
        dtype=np.uint8,
    )
    stream = bytearray()
    for pno, (x0, y0, dx, dy, pw, ph) in enumerate(P._adam7_pass_dims(w, h), start=1):
        prev = bytes(pw)
        for ry in range(ph):
            raw = bytes([pno]) * pw
            stream.append(0)  # filter None keeps the vector hand-checkable
            stream += P._filter_row(0, raw, prev, bpp=1)
            prev = raw
    comp = zlib.compress(bytes(stream))
    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 1)
    b = P._SIG + P._chunk(b"IHDR", ihdr) + P._chunk(b"IDAT", comp) + P._chunk(b"IEND", b"")
    img = P.decode_png(b)
    assert img is not None
    assert (img == grid).all()


def test_adam7_empty_pass_dims():
    """Dims small enough to drop whole passes (spec: empty passes are
    absent from the datastream) still decode exactly."""
    import struct
    import zlib

    import numpy as np

    from queryengine_spark.multimodal import png as P

    for w, h in [(1, 1), (1, 9), (9, 1), (2, 3), (3, 13)]:
        stream = bytearray()
        for x0, y0, dx, dy, pw, ph in P._adam7_pass_dims(w, h):
            prev = bytes(pw)
            for ry in range(ph):
                raw = bytes(
                    P._gray_pixel(5, x0 + rx * dx, y0 + ry * dy) for rx in range(pw)
                )
                f = ry % 5
                stream.append(f)
                stream += P._filter_row(f, raw, prev, bpp=1)
                prev = raw
        comp = zlib.compress(bytes(stream))
        ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 1)
        b = P._SIG + P._chunk(b"IHDR", ihdr) + P._chunk(b"IDAT", comp) + P._chunk(b"IEND", b"")
        img = P.decode_png(b)
        assert img is not None and img.shape == (h, w)
        exp = np.array([[P._gray_pixel(5, x, y) for x in range(w)] for y in range(h)])
        assert (img == exp).all(), (w, h)


def test_wsum_catches_misplacement():
    """The position-weighted checksum is the anti-permutation guard:
    the same multiset of pixels in a different arrangement must give
    a different wsum (here: the image vs its horizontal flip)."""
    import numpy as np

    from queryengine_spark.multimodal.png import decode_png, make_png_gray

    img = decode_png(make_png_gray(3)).astype(np.int64)
    h, w = img.shape
    weights = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
    assert (weights * img).sum() != (weights * img[:, ::-1]).sum()


def test_gray16_sub_filter_hand_vector():
    """16-bit Sub filter is BYTEWISE with the left neighbor two bytes
    back (PNG 6.2): for samples [0x1234, 0x1278], the filtered second
    sample is (0x12-0x12, 0x78-0x34) = (0x00, 0x44) — the high byte
    differences never borrow from the low byte. Hand-assembled
    container, decoded by the real chunk/zlib/unfilter path."""
    import struct
    import zlib

    import numpy as np

    import queryengine_spark.multimodal.png as P

    raw = struct.pack(">2H", 0x1234, 0x1278)
    filtered = P._filter_row(1, raw, bytes(4), bpp=2)  # Sub
    assert filtered == bytes([0x12, 0x34, 0x00, 0x44])
    stream = bytes([1]) + filtered
    ihdr = struct.pack(">II5B", 2, 1, 16, 0, 0, 0, 0)
    b = (
        P._SIG
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(stream))
        + P._chunk(b"IEND", b"")
    )
    img = P.decode_png(b)
    assert img is not None and img.dtype == np.uint16
    assert img.tolist() == [[0x1234, 0x1278]]


def test_gray16_roundtrip_formula():
    import numpy as np

    import queryengine_spark.multimodal.png as P

    for a in (5, 13, 45, 213):
        w, h = P.png_rgba_params(a)
        arr = P.decode_png(P.make_png_gray16(a))
        assert arr is not None and arr.shape == (h, w) and arr.dtype == np.uint16
        exp = np.array(
            [[P._gray16_pixel(a, x, y) for x in range(w)] for y in range(h)]
        )
        assert (arr == exp).all(), a


def test_gray16_refusals():
    """r10: every 16-bit color type decodes, sequential or Adam7 —
    only depth-16 type 3 refuses (palette indices are ≤ 8 bits by
    spec, PNG 11.2.2). Illegal depths stay refused."""
    import struct
    import zlib

    import numpy as np

    import queryengine_spark.multimodal.png as P

    def rebuild(depth, ctype, interlace, bpp):
        # one 1×1 row: filter byte + w * bytes-per-pixel of data
        stream = bytes([0]) + bytes(bpp)
        ihdr = struct.pack(">II5B", 1, 1, depth, ctype, 0, 0, interlace)
        return (
            P._SIG
            + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(stream))
            + P._chunk(b"IEND", b"")
        )

    assert P.decode_png(rebuild(16, 0, 0, 2)) is not None
    # 16-bit RGBA / gray+alpha decode since r10 (any channel count)
    rgba16 = P.decode_png(rebuild(16, 6, 0, 8))
    assert rgba16 is not None and rgba16.shape == (1, 1, 4)
    assert rgba16.dtype == np.uint16
    ga16 = P.decode_png(rebuild(16, 4, 0, 4))
    assert ga16 is not None and ga16.shape == (1, 1, 2)
    # interlaced 16-bit decodes since r10 (a 1×1 image is one pass)
    i16 = P.decode_png(rebuild(16, 0, 1, 2))
    assert i16 is not None and i16.shape == (1, 1)
    # depth-16 palette refuses BY SPEC (indices are ≤ 8 bits)
    assert P.decode_png(rebuild(16, 3, 0, 2)) is None
    # depth 4 gray is SUPPORTED since r9 (sub-byte unpack); depth 3
    # is not a legal PNG depth and stays refused
    assert P.decode_png(rebuild(4, 0, 0, 1)) is not None
    assert P.decode_png(rebuild(3, 0, 0, 1)) is None


def test_gray16_adam7_matches_sequential():
    """r10 (the last PNG refusal): the interlaced gray-16 maker and
    the sequential one decode to the SAME uint16 matrix, and both
    match the pixel formula — including sizes that exercise empty
    and partial Adam7 passes."""
    import numpy as np

    import queryengine_spark.multimodal.png as P

    for a in (5, 13, 21, 45, 53, 213):
        w, h = P.png_rgba_params(a)
        seq = P.decode_png(P.make_png_gray16(a))
        il = P.decode_png(P.make_png_gray16_adam7(a))
        assert il is not None and il.shape == (h, w) and il.dtype == np.uint16
        exp = np.array(
            [[P._gray16_pixel(a, x, y) for x in range(w)] for y in range(h)]
        )
        assert np.array_equal(il, exp), a
        assert np.array_equal(seq, il), a


def test_truecolor_rgb8_roundtrip_and_handvector():
    """Color type 2 (r9): synthesized round-trip at every filter type
    plus a HAND-FILTERED vector so a matched encoder/decoder bug pair
    cannot cancel. bpp=3 — the Sub filter's left neighbor is three
    bytes back."""
    import queryengine_spark.multimodal.png as P

    for a in range(24):
        w, h = P.png_rgba_params(a)
        img = P.decode_png(P.make_png_rgb8(a))
        assert img is not None and img.shape == (h, w, 3)
        exp = np.array(
            [[P._pixel(a, x, y)[:3] for x in range(w)] for y in range(h)],
            dtype=np.uint8,
        )
        assert (img == exp).all(), a

    # hand vector: 2×1 RGB, Sub filter (type 1). Raw pixels
    # (10,20,30) (13,24,35) → deltas (3,4,5) for the second pixel.
    stream = bytes([1, 10, 20, 30, 3, 4, 5])
    ihdr = struct.pack(">II5B", 2, 1, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img is not None
    assert img.tolist() == [[[10, 20, 30], [13, 24, 35]]]


def test_truecolor_rgb16_roundtrip_and_byteswap_sensitivity():
    """16-bit truecolor (r9): round-trip equals the formula, and the
    synthesis constants produce hi != lo bytes somewhere, so a
    byte-swapped decode CANNOT equal the correct one (the pin a
    v*257 replication formula would miss)."""
    import queryengine_spark.multimodal.png as P

    swapped_differs = False
    for a in range(24):
        w, h = P.png_rgba_params(a)
        img = P.decode_png(P.make_png_rgb16(a))
        assert img is not None and img.shape == (h, w, 3)
        assert img.dtype == np.uint16
        exp = np.array(
            [[P._rgb16_pixel(a, x, y) for x in range(w)] for y in range(h)],
            dtype=np.uint16,
        )
        assert (img == exp).all(), a
        swap = ((img & 0xFF) << 8) | (img >> 8)
        if (swap != img).any():
            swapped_differs = True
    assert swapped_differs


def test_truecolor_refusals_unchanged():
    """r10: 16-bit truecolor decodes interlaced too (shape/dtype as
    sequential), and 16-bit RGBA decodes; only structurally illegal
    shapes refuse."""
    import numpy as np

    import queryengine_spark.multimodal.png as P

    def rebuild(depth, ctype, interlace, npix_bytes):
        stream = bytes([0]) + bytes(npix_bytes)
        ihdr = struct.pack(">II5B", 1, 1, depth, ctype, 0, 0, interlace)
        return (
            P._SIG
            + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(stream))
            + P._chunk(b"IEND", b"")
        )

    assert P.decode_png(rebuild(16, 2, 0, 6)) is not None
    i16 = P.decode_png(rebuild(16, 2, 1, 6))
    assert i16 is not None and i16.shape == (1, 1, 3)
    assert i16.dtype == np.uint16
    assert P.decode_png(rebuild(16, 6, 0, 8)) is not None
    assert P.decode_png(rebuild(8, 2, 0, 3)) is not None
    # wrong datastream length for the declared geometry still refuses
    assert P.decode_png(rebuild(16, 2, 0, 5)) is None


def test_gray_alpha_interlaced_decodes_to_formulas():
    """Color type 4 (r9), Adam7-stored: both channels equal their
    formulas at every position — a swapped channel order or a
    misplaced pass breaks this exhaustive check."""
    import queryengine_spark.multimodal.png as P

    for a in (23, 55, 87, 119, 151):
        w, h = P.png_rgba_params(a)
        img = P.decode_png(P.make_png_ga_adam7(a))
        assert img is not None and img.shape == (h, w, 2)
        exp = np.stack(
            [
                np.array([[P._gray_pixel(a, x, y) for x in range(w)]
                          for y in range(h)]),
                np.array([[(x + y + a) % 256 for x in range(w)]
                          for y in range(h)]),
            ],
            axis=-1,
        )
        assert (img == exp).all(), a


def test_interlaced_rgba_equals_sequential_twin():
    import queryengine_spark.multimodal.png as P

    for a in (28, 60, 92, 124):
        il = P.decode_png(P.make_png_rgba_adam7(a))
        sq = P.decode_png(P.make_png_rgba(a))
        assert il is not None and sq is not None and (il == sq).all(), a


def test_gray1_hand_vector_and_padding():
    """1-bit hand vector: 10-px row [1,0,1,1,0,0,1,0,1,1] packs
    MSB-first as 0b10110010 0b11000000 (zero padding); filter 0. Pins
    the unpack order and padding drop with no encoder in the loop."""
    import queryengine_spark.multimodal.png as P

    stream = bytes([0, 0b10110010, 0b11000000])
    ihdr = struct.pack(">II5B", 10, 1, 1, 0, 0, 0, 0)
    png = (
        P._SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )
    img = P.decode_png(png)
    assert img is not None
    assert img.tolist() == [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1]]


def test_palette4_hand_vector():
    """4-bit palette hand vector: 3-px row, indices 5, 0, 15 pack as
    0x50 0xF0; Sub filter at BYTE granularity (second data byte
    filters against the first: 0xF0 - 0x50 = 0xA0)."""
    import queryengine_spark.multimodal.png as P

    plte = bytes(v for i in range(16) for v in (i, 2 * i, 3 * i))
    stream = bytes([1, 0x50, 0xA0])
    ihdr = struct.pack(">II5B", 3, 1, 4, 3, 0, 0, 0)
    png = (
        P._SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )
    img = P.decode_png(png)
    assert img is not None
    assert img.tolist() == [[[5, 10, 15], [0, 0, 0], [15, 30, 45]]]


def test_subbyte_refusals():
    import queryengine_spark.multimodal.png as P

    ok = P.make_png_gray1(9)
    assert P.decode_png(ok) is not None
    # sub-byte truecolor / interlaced sub-byte / out-of-palette index
    ihdr = struct.pack(">II5B", 2, 1, 4, 2, 0, 0, 0)
    bad = (
        P._SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + _chunk(b"IEND", b"")
    )
    assert P.decode_png(bad) is None
    ihdr_i = struct.pack(">II5B", 2, 1, 1, 0, 0, 0, 1)
    bad_i = (
        P._SIG
        + _chunk(b"IHDR", ihdr_i)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + _chunk(b"IEND", b"")
    )
    assert P.decode_png(bad_i) is None
    plte1 = bytes((1, 2, 3))  # one entry; index 5 is out of range
    ihdr_p = struct.pack(">II5B", 1, 1, 4, 3, 0, 0, 0)
    bad_p = (
        P._SIG
        + _chunk(b"IHDR", ihdr_p)
        + _chunk(b"PLTE", plte1)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0x50])))
        + _chunk(b"IEND", b"")
    )
    assert P.decode_png(bad_p) is None


def test_gray1_adam7_matches_sequential():
    """r10: interlaced SUB-BYTE decode — each Adam7 pass packs its
    own bit rows (padding at pass-row boundaries), so a
    sequential-minded unpacker reads garbage. The interlaced 1-bit
    maker must decode to the sequential twin and the mod-2 formula,
    including sizes with empty/partial passes."""
    import numpy as np

    import queryengine_spark.multimodal.png as P

    for a in (9, 25, 41, 57, 89, 105):
        seq = P.decode_png(P.make_png_gray1(a))
        il = P.decode_png(P.make_png_gray1_adam7(a))
        assert il is not None, a
        assert np.array_equal(seq, il), a
        w, h = P.png_rgba_params(a)
        exp = np.array(
            [[P._gray_pixel(a, x, y) % 2 for x in range(w)] for y in range(h)]
        )
        assert np.array_equal(il, exp), a
