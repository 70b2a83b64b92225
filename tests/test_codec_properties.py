"""Property tests (hypothesis) for the hand-rolled codec kernels —
the parts where a single off-by-one survives example tests: LZW
encode/decode inversion over arbitrary byte strings, PNG filter/
unfilter inversion for every filter type, and JPEG DC
category/sign-extension inversion over the full coefficient range."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from queryengine_spark.multimodal.gif import lzw_decode, lzw_encode
from queryengine_spark.multimodal.png import _filter_row, _unfilter_row


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_lzw_roundtrip_any_bytes(data):
    assert lzw_decode(lzw_encode(data, 8), 8) == data


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=3),
    st.binary(min_size=0, max_size=500),
)
def test_lzw_roundtrip_small_alphabet(mcs_shift, raw):
    # min_code_size 2..5 over a clamped alphabet (valid GIF inputs:
    # every index < 2^min_code_size)
    mcs = 2 + mcs_shift
    data = bytes(b % (1 << mcs) for b in raw)
    assert lzw_decode(lzw_encode(data, mcs), mcs) == data


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=1, max_value=16),
    st.data(),
)
def test_png_filter_roundtrip(ftype, width_px, data):
    n = width_px * 4
    raw = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    prev = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    assert _unfilter_row(ftype, _filter_row(ftype, raw, prev), prev) == raw


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-255, max_value=255))
def test_jpeg_dc_category_sign_extension_roundtrip(diff):
    # encoder side (multimodal/jpeg.py make_jpeg_dc inlines this)
    from queryengine_spark.multimodal.jpeg import _category

    cat = _category(diff)
    assert 0 <= cat <= 8
    if cat == 0:
        assert diff == 0
        return
    bits = diff if diff >= 0 else diff + (1 << cat) - 1
    assert 0 <= bits < (1 << cat)
    # decoder side (decode_jpeg_dc inlines this)
    back = bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1
    assert back == diff
