"""Pins for the fixed-point integer IDCT pixel path (r7).

The IDCT spec (multimodal/jpeg.py::idct8_fixed) is pure integer
arithmetic so the DuckDB oracle can replicate it bit-for-bit. These
tests pin it three independent ways: (1) the literal basis table
against its defining formula, (2) hand-pinned pixel vectors computed
by a separate pure-Python implementation (so an encoder/decoder bug
pair cannot cancel), (3) proximity to the exact real-valued IDCT
(IEEE-1180-style quality bound), plus end-to-end decode parity on the
synthesized assets.
"""

import math

import numpy as np
import pytest

from queryengine_spark.multimodal.jpeg import (
    AC_POSITIONS,
    IDCT_B,
    IDCT_BIAS,
    IDCT_SHIFT,
    QUANT_AC,
    QUANT_AC16,
    QUANT_DC,
    ZIGZAG_NAT,
    block_ac,
    block_dc,
    decode_jpeg_dc,
    decode_jpeg_pixels,
    idct8_fixed,
    jpeg_params,
    make_jpeg_ac,
    make_jpeg_ac16,
    make_jpeg_dc,
    make_jpeg_progressive,
)


def test_idct_basis_matches_formula():
    """IDCT_B is a literal; re-derive every entry from the spec
    formula B[u][t] = floor(2^15·C(u)·cos((2t+1)uπ/16)/2 + 0.5)."""
    for u in range(8):
        c = 1 / math.sqrt(2) if u == 0 else 1.0
        for t in range(8):
            want = math.floor(
                (1 << IDCT_SHIFT) * c * math.cos((2 * t + 1) * u * math.pi / 16) / 2
                + 0.5
            )
            assert IDCT_B[u][t] == want, (u, t)
    assert IDCT_BIAS == 1 << (2 * IDCT_SHIFT - 1)


def _idct_independent(terms: dict) -> list:
    """Pure-Python spec replication (no numpy, no shared code path):
    terms maps natural (v, u) -> dequantized coefficient."""
    out = []
    for y in range(8):
        row = []
        for x in range(8):
            acc = sum(f * IDCT_B[u][x] * IDCT_B[v][y] for (v, u), f in terms.items())
            row.append(max(0, min(255, 128 + ((acc + IDCT_BIAS) >> (2 * IDCT_SHIFT)))))
        out.append(row)
    return out


#: hand-pinned vectors (computed offline by the independent
#: implementation above and transcribed as literals — the assertion
#: against _idct_independent then guards the transcription itself)
V1_TERMS = {(0, 1): 160}  # single horizontal-frequency AC
V1 = ((156, 152, 144, 134, 122, 112, 104, 100),) * 8
V2_TERMS = {(0, 0): 400, (4, 2): -320, (7, 7): 112}
V2 = (
    (127, 153, 204, 225, 236, 195, 159, 125),
    (227, 208, 143, 141, 110, 169, 191, 233),
    (235, 187, 176, 103, 149, 137, 213, 226),
    (120, 172, 177, 255, 203, 222, 141, 131),
    (131, 141, 222, 203, 255, 177, 172, 120),
    (226, 213, 137, 149, 103, 176, 187, 235),
    (233, 191, 169, 110, 141, 143, 208, 227),
    (125, 159, 195, 236, 225, 204, 153, 127),
)
V3_TERMS = {(0, 0): -800, (0, 2): 6300}  # 16-bit-DQT-scale: clamps both rails
V3 = ((255, 255, 0, 0, 0, 0, 255, 255),) * 8


@pytest.mark.parametrize(
    "terms,want", [(V1_TERMS, V1), (V2_TERMS, V2), (V3_TERMS, V3)]
)
def test_idct_hand_pinned_vectors(terms, want):
    co = np.zeros((1, 64), dtype=np.int64)
    for (v, u), f in terms.items():
        co[0, 8 * v + u] = f
    got = idct8_fixed(co)[0]
    assert got.tolist() == [list(r) for r in want]
    assert _idct_independent(terms) == [list(r) for r in want]


def test_idct_dc_only_collapses_exactly():
    """On DC-only blocks the fixed-point path reproduces dc + 128
    bit-exactly across far more than the planted dc range, so the
    legacy DC-collapse pixel profile is a strict special case."""
    dcs = np.arange(-128, 129, dtype=np.int64)
    co = np.zeros((len(dcs), 64), dtype=np.int64)
    co[:, 0] = dcs * QUANT_DC
    px = idct8_fixed(co)
    want = np.clip(dcs + 128, 0, 255)
    assert (px == want[:, None, None]).all()


def test_idct_within_one_of_exact_real_idct():
    """IEEE-1180-style quality: across random spectra spanning the
    full planted coefficient range (16-bit-DQT leg included), the
    fixed-point result is within ±1 of the correctly-rounded exact
    real IDCT — it is a real IDCT, not a lookalike."""
    rng = np.random.default_rng(1180)
    co = rng.integers(-6300, 6301, size=(500, 64)).astype(np.int64)
    cs = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    m = np.array(
        [
            [cs[u] * math.cos((2 * t + 1) * u * math.pi / 16) / 2 for u in range(8)]
            for t in range(8)
        ]
    )
    exact = np.einsum("nvu,xu,yv->nyx", co.reshape(-1, 8, 8).astype(float), m, m)
    want = np.clip(np.floor(exact + 0.5) + 128, 0, 255)
    got = idct8_fixed(co)
    assert np.abs(got - want).max() <= 1


def _formula_pixels(aid: int, q_ac: int) -> np.ndarray:
    """Independent end-to-end expectation: formula blocks → the
    pure-Python IDCT above, assembled into the image raster."""
    bw, bh = jpeg_params(aid)
    img = np.zeros((8 * bh, 8 * bw), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            terms = {(0, 0): QUANT_DC * block_dc(aid, bx, by)}
            for p in AC_POSITIONS:
                v, u = divmod(ZIGZAG_NAT[p], 8)
                terms[(v, u)] = q_ac * block_ac(aid, bx, by, p)
            blk = _idct_independent(terms)
            img[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = blk
    return img


@pytest.mark.parametrize("aid", [3, 5, 7, 13, 15, 29, 47])
def test_decode_pixels_sequential_matches_formula(aid):
    img = decode_jpeg_pixels(make_jpeg_ac(aid))
    assert img is not None
    assert (img.astype(np.int64) == _formula_pixels(aid, QUANT_AC)).all()


@pytest.mark.parametrize("aid", [9, 25, 41])
def test_decode_pixels_16bit_dqt_clamps(aid):
    """The q=300 leg decodes through the same path and actually
    exercises both clamp rails."""
    img = decode_jpeg_pixels(make_jpeg_ac16(aid))
    assert img is not None
    want = _formula_pixels(aid, QUANT_AC16)
    assert (img.astype(np.int64) == want).all()
    assert img.min() == 0 and img.max() == 255


@pytest.mark.parametrize("aid", [1, 17, 33])
def test_decode_pixels_progressive_matches_sequential(aid):
    """The progressive payload carries the same blocks, so its pixel
    decode must be bit-identical to the sequential leg's."""
    prog = decode_jpeg_pixels(make_jpeg_progressive(aid))
    seq = decode_jpeg_pixels(make_jpeg_ac(aid))
    assert prog is not None and seq is not None
    assert (prog == seq).all()


@pytest.mark.parametrize("aid", [0, 8, 16, 40])
def test_decode_pixels_dc_only_agrees_with_legacy_profile(aid):
    """On DC-only payloads the general pixel path and the legacy
    collapse profile agree byte-for-byte."""
    payload = make_jpeg_dc(aid)
    legacy = decode_jpeg_dc(payload)
    general = decode_jpeg_pixels(payload)
    assert legacy is not None and general is not None
    assert (legacy == general).all()


def test_decode_pixels_refuses_garbage():
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(make_jpeg_ac(3)[:40]) is None


@pytest.mark.parametrize("aid", [11, 27, 43])
def test_decode_pixels_prog3_native_planes(aid):
    """r7: the 3-component progressive PIXEL path — each plane at its
    native resolution, luma through the full IDCT (AC spectra),
    chroma DC-only → dc3 + 128 constant blocks. Independent
    expectation via the pure-Python IDCT."""
    from queryengine_spark.multimodal.jpeg import (
        block_dc3,
        decode_jpeg_pixels_prog3,
        make_jpeg_prog_420,
    )

    res = decode_jpeg_pixels_prog3(make_jpeg_prog_420(aid))
    assert res is not None
    w, h, (y, cb, cr) = res
    mw, mh = jpeg_params(aid)
    assert (w, h) == (16 * mw, 16 * mh)
    assert y.shape == (16 * mh, 16 * mw)
    assert cb.shape == cr.shape == (8 * mh, 8 * mw)
    # luma: AC-bearing blocks, independent fixed-point IDCT replay
    for by in range(2 * mh):
        for bx in range(2 * mw):
            terms = {(0, 0): QUANT_DC * block_dc3(aid, 0, bx, by)}
            for p in AC_POSITIONS:
                v, u = divmod(ZIGZAG_NAT[p], 8)
                terms[(v, u)] = QUANT_AC * block_ac(aid, bx, by, p)
            want = _idct_independent(terms)
            blk = y[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
            assert blk.tolist() == want, (aid, bx, by)
    # chroma: DC-only constant blocks at native resolution
    for c, plane in ((1, cb), (2, cr)):
        for by in range(mh):
            for bx in range(mw):
                blk = plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                assert (blk == block_dc3(aid, c, bx, by) + 128).all()


@pytest.mark.parametrize("aid", [13, 15, 29, 47])
def test_sequential_420_ac_matches_progressive(aid):
    """r7: baseline SEQUENTIAL 4:2:0 with luma AC — the dominant web
    JPEG shape — must decode bit-identically (coefficients AND
    pixels, DRI or not) to the progressive payload carrying the same
    per-component formulas."""
    from queryengine_spark.multimodal.jpeg import (
        decode_jpeg_coeffs_prog3,
        decode_jpeg_pixels_prog3,
        decode_jpeg_pixels_seq_multi,
        decode_jpeg_seq_coeffs_multi,
        make_jpeg_420_ac,
        make_jpeg_prog_420,
    )

    seq = decode_jpeg_seq_coeffs_multi(make_jpeg_420_ac(aid, dri=False))
    prog = decode_jpeg_coeffs_prog3(make_jpeg_prog_420(aid))
    assert seq is not None and prog is not None
    assert seq[:2] == prog[:2]
    for a, b in zip(seq[2], prog[2]):
        assert (a == b).all()
    ps = decode_jpeg_pixels_seq_multi(make_jpeg_420_ac(aid, dri=False))
    pd = decode_jpeg_pixels_seq_multi(make_jpeg_420_ac(aid, dri=True))
    pp = decode_jpeg_pixels_prog3(make_jpeg_prog_420(aid))
    for a, b, c in zip(ps[2], pd[2], pp[2]):
        assert (a == b).all() and (a == c).all()


def test_sequential_multi_dc_only_agrees_with_legacy_planes():
    """On DC-only subsampled payloads the full sequential decoder and
    the legacy DC-collapse planes path agree plane-for-plane."""
    from queryengine_spark.multimodal.jpeg import (
        decode_jpeg_dc_planes,
        decode_jpeg_pixels_seq_multi,
        make_jpeg_411,
        make_jpeg_420,
    )

    for aid, payload in (
        (4, make_jpeg_420(4, dri=False)),
        (6, make_jpeg_420(6, dri=True)),
        (12, make_jpeg_411(12, dri=False)),
    ):
        legacy = decode_jpeg_dc_planes(payload)
        full = decode_jpeg_pixels_seq_multi(payload)
        assert legacy is not None and full is not None, aid
        assert legacy[:2] == full[:2]
        for a, b in zip(legacy[2], full[2]):
            assert (a == b).all(), aid


def test_sequential_multi_refusals():
    from queryengine_spark.multimodal.jpeg import (
        decode_jpeg_seq_coeffs_multi,
        make_jpeg_420_ac,
    )

    good = make_jpeg_420_ac(13, dri=False)
    assert decode_jpeg_seq_coeffs_multi(b"") is None
    assert decode_jpeg_seq_coeffs_multi(good[:60]) is None
    assert decode_jpeg_seq_coeffs_multi(good[:-20]) is None  # truncated scan
