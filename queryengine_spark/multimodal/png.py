"""Real PNG decode, no media libraries: PNG's pixel path is zlib
(stdlib) + per-scanline prediction filters (pure arithmetic), so —
like the BMP/WAV paths in ``multimodal/bmp.py`` — the FULL pipeline
runs for real in this sandbox: synthesize spec-valid container bytes
→ ship as a binary column → walk chunks (CRC-checked) → inflate IDAT
→ reconstruct scanlines through all five PNG filter types → aggregate
exact integer channel statistics.

The synthesizer deliberately stresses the decoder: every scanline is
encoded with filter type ``y % 5`` (None, Sub, Up, Average, Paeth),
and the compressed stream is split across two IDAT chunks, so chunk
reassembly and every unfilter branch are exercised on every asset.
The DuckDB oracle recomputes the expected channel sums FROM THE
SYNTHESIS FORMULA while Spark computes them FROM THE DECODED BYTES —
a hash match certifies filter reconstruction (including the Paeth
predictor), chunk walking, and RGBA byte order end-to-end. The
decoder is additionally pinned against a hand-filtered byte vector in
tests/test_multimodal_png.py, so an encoder/decoder bug pair cannot
cancel out.

Reference parity note: the reference engine (rickbeeloo/QueryEngine)
has no media path at all; this extends the brief's multimodal pillar
with a decoder that needs nothing beyond the Python stdlib + numpy.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: deterministic synthesis parameters (mirrored in the oracle SQL —
#: keep in sync with queries/addenda.py::MULTIMODAL_PNG_DECODE_SQL)
PNG2_W_MOD, PNG2_H_MOD = 11, 7

_SIG = b"\x89PNG\r\n\x1a\n"


def png_rgba_params(asset_id: int) -> tuple[int, int]:
    return 4 + asset_id % PNG2_W_MOD, 4 + asset_id % PNG2_H_MOD


def _pixel(asset_id: int, x: int, y: int) -> tuple[int, int, int, int]:
    """(r, g, b, a) of the synthetic image — the formula the oracle
    re-computes symbolically."""
    return (
        (x * y + asset_id) % 256,
        (asset_id + 2 * y) % 256,
        (asset_id + 3 * x) % 256,
        (x + y + asset_id) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, raw: bytes, prev: bytes, bpp: int = 4) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side)."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - bpp] if i >= bpp else 0
        up = prev[i]
        ul = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, ul)
        out[i] = (raw[i] - pred) % 256
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int = 4) -> bytes | None:
    """Reconstruct one scanline (decoder side — inverse of
    :func:`_filter_row`; sequential because Sub/Average/Paeth depend
    on already-reconstructed left neighbors)."""
    if ftype > 4:
        return None
    out = bytearray(len(filt))
    for i in range(len(filt)):
        left = out[i - bpp] if i >= bpp else 0
        up = prev[i]
        ul = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _paeth(left, up, ul)
        out[i] = (filt[i] + pred) % 256
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png_rgba(asset_id: int) -> bytes:
    """Complete spec-valid 8-bit RGBA PNG with deterministic pixels,
    per-row filter type y % 5, and the deflate stream split across
    two IDAT chunks."""
    w, h = png_rgba_params(asset_id)
    prev = bytes(w * 4)
    stream = bytearray()
    for y in range(h):
        raw = bytes(
            v for x in range(w) for v in _pixel(asset_id, x, y)
        )
        f = y % 5
        stream.append(f)
        stream += _filter_row(f, raw, prev)
        prev = raw
    comp = zlib.compress(bytes(stream), 6)
    mid = max(1, len(comp) // 2)
    ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:mid])
        + _chunk(b"IDAT", comp[mid:])
        + _chunk(b"IEND", b"")
    )


#: grayscale synthesis formula constants (mirrored in the oracle)
GRAY_X_MULT, GRAY_Y_MULT = 3, 5


def _gray_pixel(asset_id: int, x: int, y: int) -> int:
    return (GRAY_X_MULT * x + GRAY_Y_MULT * y + asset_id) % 256


def make_png_gray(asset_id: int) -> bytes:
    """Complete spec-valid 8-bit GRAYSCALE PNG (color type 0, r5
    decoder-breadth extension): same dims as the RGBA twin, per-row
    filter type y % 5 with bpp=1 (the Sub/Average/Paeth left
    neighbor is ONE byte back, a different arithmetic path than
    RGBA's bpp=4), deflate stream split across two IDAT chunks."""
    w, h = png_rgba_params(asset_id)
    prev = bytes(w)
    stream = bytearray()
    for y in range(h):
        raw = bytes(_gray_pixel(asset_id, x, y) for x in range(w))
        f = y % 5
        stream.append(f)
        stream += _filter_row(f, raw, prev, bpp=1)
        prev = raw
    comp = zlib.compress(bytes(stream), 6)
    mid = max(1, len(comp) // 2)
    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:mid])
        + _chunk(b"IDAT", comp[mid:])
        + _chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray | None:
    """bytes → (h, w, 4) uint8 RGBA array for color type 6, or
    (h, w) uint8 grayscale for color type 0 (r5), or None for
    anything else (other color types / depths / interlace). Walks
    chunks with CRC verification, reassembles multi-chunk IDAT,
    inflates, and runs the full scanline reconstruction (all 5
    filter types, with the correct bytes-per-pixel offset for each
    color type)."""
    if not b.startswith(_SIG):
        return None
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(b):
            return None
        (crc,) = struct.unpack(">I", b[pos + 8 + clen : pos + 12 + clen])
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            return None
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, ctype_, comp, filt, interlace = struct.unpack(">II5B", ihdr)
    if depth != 8 or ctype_ not in (0, 6) or (comp, filt, interlace) != (0, 0, 0):
        return None
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = 4 if ctype_ == 6 else 1
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        return None
    prev = bytes(stride)
    rows = []
    for y in range(h):
        off = y * (1 + stride)
        rec = _unfilter_row(raw[off], raw[off + 1 : off + 1 + stride], prev, bpp=bpp)
        if rec is None:
            return None
        rows.append(np.frombuffer(rec, dtype=np.uint8))
        prev = rec
    out = np.stack(rows)
    return out.reshape(h, w, 4) if ctype_ == 6 else out.reshape(h, w)


PNG_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

PNG_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("sum_a", LongType(), True),
        StructField("sum_gray", LongType(), True),
    ]
)


def synthesize_png(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """One full-pixel PNG per input row, built worker-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [make_png_rgba(a) for a in ids_],
                }
            )

    return ids.mapInPandas(run, PNG_ASSET_SCHEMA)


def synthesize_png_mixed(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Even asset_ids → 8-bit RGBA, odd → 8-bit grayscale (r5)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [
                        make_png_rgba(a) if a % 2 == 0 else make_png_gray(a)
                        for a in ids_
                    ],
                }
            )

    return ids.mapInPandas(run, PNG_ASSET_SCHEMA)


def png_pixel_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload and aggregate exact integer channel sums
    (order-invariant, engine-portable). RGBA payloads fill
    sum_r/g/b/a with sum_gray NULL; grayscale payloads fill sum_gray
    with the channels NULL. Undecodable → all NULL."""

    cols = ("width", "height", "n_px", "sum_r", "sum_g", "sum_b", "sum_a", "sum_gray")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", *cols)}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out["asset_id"].append(int(aid))
                img = decode_png(bytes(payload)) if payload is not None else None
                if img is None:
                    for k in cols:
                        out[k].append(None)
                    continue
                if img.ndim == 2:
                    h, w = img.shape
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_px"].append(w * h)
                    for k in ("sum_r", "sum_g", "sum_b", "sum_a"):
                        out[k].append(None)
                    out["sum_gray"].append(int(img.astype(np.int64).sum()))
                    continue
                h, w, _ = img.shape
                s = img.reshape(-1, 4).astype(np.int64).sum(axis=0)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                for k, v in zip(("sum_r", "sum_g", "sum_b", "sum_a"), s):
                    out[k].append(int(v))
                out["sum_gray"].append(None)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, PNG_STATS_SCHEMA)
