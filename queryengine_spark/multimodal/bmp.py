"""Real image decode, no media libraries: uncompressed 24-bit BMP
(BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
4 bytes) is decodable with struct + numpy alone — so unlike the
stubbed JPEG/PNG pixel paths (absent codec libs), this format runs
the FULL pipeline: synthesize container bytes → ship as a binary
column → parse header → decode pixel matrix → aggregate statistics.

The correctness story is the strong one: pixels are synthesized from
an arithmetic formula of (asset_id, x, y), and the DuckDB oracle
computes the expected channel sums FROM THE FORMULA while Spark
computes them FROM THE DECODED BYTES — a hash match proves the byte
layout, stride/padding handling, bottom-up flip and BGR ordering are
all exactly right, not just that a header parsed.
"""

from __future__ import annotations

import struct
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
#: keep in sync with queries/multimodal.py::BMP_DECODE_SQL)
BMP_W_MOD, BMP_H_MOD = 13, 9


def bmp_params(asset_id: int) -> tuple[int, int]:
    return 4 + asset_id % BMP_W_MOD, 4 + asset_id % BMP_H_MOD


def _pixel(asset_id: int, x: int, y: int) -> tuple[int, int, int]:
    """(r, g, b) of the synthetic image — the formula the oracle
    re-computes symbolically."""
    return (
        (x * y + asset_id) % 256,
        (asset_id + y) % 256,
        (asset_id + x) % 256,
    )


def make_bmp(asset_id: int) -> bytes:
    """Spec-valid BI_RGB 24-bit BMP with deterministic pixels."""
    w, h = bmp_params(asset_id)
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = _pixel(asset_id, x, y)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (row_stride - len(row))
        rows.append(bytes(row))
    return file_hdr + info_hdr + b"".join(rows)


def decode_bmp(b: bytes) -> np.ndarray | None:
    """bytes → (h, w, 3) uint8 RGB array (top-down), or None for
    anything that is not a well-formed uncompressed 24-bit or 8-bit
    paletted BMP. Handles the on-disk realities: pixel-data offset
    from the file header, 4-byte row padding, bottom-up row order,
    BGR channel order, (per spec) negative height = top-down storage,
    and for bpp=8 the BGRX color table after the info header with
    biClrUsed=0 meaning a full 256-entry palette (r5 extension —
    grayscale is just the identity-gray palette)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        _sig, _fsize, _r1, _r2, off = struct.unpack("<2sIHHI", b[:14])
        hdr_size, w, h_signed = struct.unpack("<Iii", b[14:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        clr_used = struct.unpack("<I", b[46:50])[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp not in (4, 8, 24):
        return None
    # BI_RGB everywhere; BI_RLE8 (compression 1) only with bpp 8
    # (r6); BI_RLE4 (compression 2) only with bpp 4 (r9)
    if compression != 0 and not (
        (compression == 1 and bpp == 8) or (compression == 2 and bpp == 4)
    ):
        return None
    top_down = h_signed < 0
    if top_down and compression in (1, 2):
        return None  # the spec forbids top-down RLE bitmaps
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        if off + stride * h > len(b):
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1]  # BGR → RGB
    # paletted (bpp 8 or 4 — r9): color table (BGRX entries) sits
    # right after the info header; indices look colors up
    n_colors = clr_used or (16 if bpp == 4 else 256)
    pal_off = 14 + hdr_size
    if n_colors > (16 if bpp == 4 else 256) or pal_off + 4 * n_colors > len(b):
        return None
    pal = np.frombuffer(b, dtype=np.uint8, count=4 * n_colors, offset=pal_off)
    pal = pal.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
    if compression == 1:  # BI_RLE8 (r6): decompress to the index grid
        idx = _decode_rle8(b[off:], w, h)
        if idx is None or idx.max() >= n_colors:
            return None
        return pal[idx][::-1]  # RLE is always bottom-up
    if compression == 2:  # BI_RLE4 (r9): nibble runs
        idx = _decode_rle4(b[off:], w, h)
        if idx is None or idx.max() >= n_colors:
            return None
        return pal[idx][::-1]
    if bpp == 4:  # uncompressed 4-bit: packed nibbles, padded rows
        stride = ((w + 1) // 2 + 3) & ~3
        if off + stride * h > len(b):
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        rows = raw.reshape(h, stride)[:, : (w + 1) // 2]
        nibs = np.empty((h, 2 * ((w + 1) // 2)), dtype=np.uint8)
        nibs[:, 0::2] = rows >> 4
        nibs[:, 1::2] = rows & 0x0F
        idx = nibs[:, :w]
        if int(idx.max()) >= n_colors:
            return None
        out = pal[idx]
        return out if top_down else out[::-1]
    stride = (w + 3) & ~3
    if off + stride * h > len(b):
        return None
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    idx = raw.reshape(h, stride)[:, :w]
    if idx.max() >= n_colors:
        return None
    rows = pal[idx]
    if not top_down:
        rows = rows[::-1]
    return rows


#: 8-bit palette/index synthesis formulas (mirrored in the oracle)
PAL_R_MULT, PAL_G_MULT, PAL_G_A, PAL_B_MULT, PAL_B_OFF = 7, 13, 2, 29, 5
IDX_Y_MULT = 3


def bmp8_palette(asset_id: int, j: int) -> tuple[int, int, int]:
    """(r, g, b) of palette entry j — linear-mod formulas the oracle
    recomputes symbolically."""
    return (
        (j * PAL_R_MULT + asset_id) % 256,
        (j * PAL_G_MULT + PAL_G_A * asset_id) % 256,
        (j * PAL_B_MULT + PAL_B_OFF) % 256,
    )


def bmp8_index(asset_id: int, x: int, y: int) -> int:
    return (x + IDX_Y_MULT * y + asset_id) % 256


def make_bmp8_paletted(
    w: int, h: int, palette: list[tuple[int, int, int]], idx_rows: list[list[int]]
) -> bytes:
    """Generic spec-valid 8-bit paletted BMP (BGRX color table,
    4-byte-aligned index rows, bottom-up) — used by the formula
    synthesizer below and directly by the property tests, so the
    container layout is exercised with arbitrary palettes/indices,
    not only formula ones."""
    n_colors = len(palette)
    stride = (w + 3) & ~3
    img_size = stride * h
    off = 14 + 40 + 4 * n_colors
    file_hdr = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, img_size, 2835, 2835, n_colors, 0
    )
    pal = b"".join(bytes((bb, gg, rr, 0)) for rr, gg, bb in palette)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytes(idx_rows[y]) + b"\x00" * (stride - w)
        rows.append(row)
    return file_hdr + info_hdr + pal + b"".join(rows)


def make_bmp8(asset_id: int) -> bytes:
    """Formula 8-bit paletted BMP: same dims as the 24-bit twin,
    palette and indices from the bmp8_* formulas."""
    w, h = bmp_params(asset_id)
    palette = [bmp8_palette(asset_id, j) for j in range(256)]
    idx_rows = [[bmp8_index(asset_id, x, y) for x in range(w)] for y in range(h)]
    return make_bmp8_paletted(w, h, palette, idx_rows)


def bmp8_index_rle(asset_id: int, x: int, y: int) -> int:
    """Index formula of the BI_RLE8 leg (r6), mirrored in the oracle:
    odd rows repeat each index three times along x (x // 3 — RLE
    encoded-mode runs), even rows are the run-free plain formula
    (absolute-mode segments), so one image exercises both RLE8
    payload shapes."""
    xe = x // 3 if y % 2 == 1 else x
    return (xe + IDX_Y_MULT * y + asset_id) % 256


def _rle8_encode_row(row: list[int]) -> bytes:
    """One stored row → RLE8 bytes (no EOL marker): runs ≥ 3 become
    encoded mode [count, index]; literal stretches of ≥ 3 become
    absolute mode [0, n, indices..., word pad]; stray 1–2 literals
    become count-1/2 encoded pairs."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 255:
            run += 1
        if run >= 3:
            out += bytes([run, row[i]])
            i += run
            continue
        # literal stretch: until the next ≥3-run starts (or row end)
        j = i
        while j < n:
            r2 = 1
            while j + r2 < n and row[j + r2] == row[j] and r2 < 255:
                r2 += 1
            if r2 >= 3:
                break
            j += r2
        lit = row[i:j]
        for s in range(0, len(lit), 255):
            chunk = lit[s : s + 255]
            if len(chunk) >= 3:
                out += bytes([0, len(chunk)]) + bytes(chunk)
                if len(chunk) & 1:
                    out += b"\x00"  # absolute runs are word-aligned
            else:
                for v in chunk:
                    out += bytes([1, v])
        i = j
    return bytes(out)


def make_bmp8_rle(asset_id: int) -> bytes:
    """BI_RLE8-compressed 8-bit paletted BMP (r6): same palette
    formula as the plain leg, bmp8_index_rle indices, rows stored
    bottom-up, [0,0] end-of-line after every row and [0,1]
    end-of-bitmap closing the stream."""
    w, h = bmp_params(asset_id)
    palette = [bmp8_palette(asset_id, j) for j in range(256)]
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        data += _rle8_encode_row([bmp8_index_rle(asset_id, x, y) for x in range(w)])
        data += b"\x00\x00" if y else b"\x00\x01"  # EOL; EOB after top row
    off = 14 + 40 + 4 * 256
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0
    )
    pal = b"".join(bytes((bb, gg, rr, 0)) for rr, gg, bb in palette)
    return file_hdr + info_hdr + pal + bytes(data)


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray | None:
    """RLE8 stream → (h, w) uint8 index array in STORED (bottom-up)
    row order, or None on corruption. Escapes per the BMP spec:
    [0,0] end of line, [0,1] end of bitmap, [0,2,dx,dy] cursor delta,
    [0,n≥3] absolute mode (word-aligned); pixels never written
    (skipped by EOL/EOB/delta) decode as index 0, the common real-
    decoder convention."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i, n = 0, len(data)
    while True:
        if i + 2 > n:
            return None  # ran out without end-of-bitmap
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                return None
            out[y, x : x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                return None
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 2 > n:
                return None
            dx, dy = data[i], data[i + 1]
            i += 2
            x += dx
            y += dy
            if x > w or y > h:
                return None
        else:  # absolute mode: v literal indices
            if i + v > n or y >= h or x + v > w:
                return None
            out[y, x : x + v] = np.frombuffer(data, np.uint8, v, i)
            x += v
            i += v + (v & 1)  # word-aligned


def bmp4_index(asset_id: int, x: int, y: int) -> int:
    """Index formula of the BI_RLE4 leg (r9), mirrored in the oracle:
    y % 4 == 3 rows ALTERNATE two indices (one encoded run per row —
    the two-nibble pattern BI_RLE4 has and RLE8 lacks), other odd
    rows repeat indices 3× (solid encoded runs), even rows are the
    run-free formula (absolute-mode nibble segments)."""
    base = (IDX_Y_MULT * y + asset_id) % 16
    if y % 4 == 3:
        return base if x % 2 == 0 else (base + 7) % 16
    xe = x // 3 if y % 2 == 1 else x
    return (xe + IDX_Y_MULT * y + asset_id) % 16


def _rle4_encode_row(row: list[int]) -> bytes:
    """One stored row → RLE4 bytes (no EOL): maximal ALTERNATING-PAIR
    runs ≥ 3 become encoded mode [count, hi<<4|lo]; literal stretches
    of ≥ 3 become absolute mode [0, n, packed nibbles, word pad];
    1–2 leftovers become short encoded pairs."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i + (run % 2)] and run < 255:
            run += 1
        if run >= 3:
            out += bytes([run, (row[i] << 4) | row[i + 1]])
            i += run
            continue
        j = i
        while j < n:
            r2 = 1
            while j + r2 < n and row[j + r2] == row[j + (r2 % 2)] and r2 < 255:
                r2 += 1
            if r2 >= 3:
                break
            j += r2
        lit = row[i:j]
        for s in range(0, len(lit), 254):
            chunk = lit[s : s + 254]
            if len(chunk) >= 3:
                packed = bytearray()
                for k in range(0, len(chunk), 2):
                    hi = chunk[k]
                    lo = chunk[k + 1] if k + 1 < len(chunk) else 0
                    packed.append((hi << 4) | lo)
                if len(packed) & 1:
                    packed.append(0)  # absolute runs are word-aligned
                out += bytes([0, len(chunk)]) + packed
            elif len(chunk) == 2:
                out += bytes([2, (chunk[0] << 4) | chunk[1]])
            else:
                out += bytes([1, chunk[0] << 4])
        i = j
    return bytes(out)


def make_bmp4_rle(asset_id: int) -> bytes:
    """BI_RLE4-compressed 4-bit paletted BMP (r9): a 16-entry palette
    from the bmp8_palette formulas, bmp4_index indices, bottom-up
    rows, [0,0] EOL per row, [0,1] EOB."""
    w, h = bmp_params(asset_id)
    palette = [bmp8_palette(asset_id, j) for j in range(16)]
    data = bytearray()
    for y in range(h - 1, -1, -1):
        data += _rle4_encode_row([bmp4_index(asset_id, x, y) for x in range(w)])
        data += b"\x00\x00" if y else b"\x00\x01"
    off = 14 + 40 + 4 * 16
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(data), 2835, 2835, 16, 0
    )
    pal = b"".join(bytes((bb, gg, rr, 0)) for rr, gg, bb in palette)
    return file_hdr + info_hdr + pal + bytes(data)


def _decode_rle4(data: bytes, w: int, h: int) -> np.ndarray | None:
    """RLE4 stream → (h, w) uint8 index array in STORED (bottom-up)
    order, or None. Same escapes as RLE8; encoded mode ALTERNATES the
    byte's two nibbles (hi first), absolute mode packs nibbles
    hi-first and pads its BYTE count to word alignment."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i, n = 0, len(data)
    while True:
        if i + 2 > n:
            return None
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run: alternate hi/lo nibbles
            if y >= h or x + c > w:
                return None
            hi, lo = v >> 4, v & 0x0F
            for k in range(c):
                out[y, x + k] = hi if k % 2 == 0 else lo
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                return None
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 2 > n:
                return None
            dx, dy = data[i], data[i + 1]
            i += 2
            x += dx
            y += dy
            if x > w or y > h:
                return None
        else:  # absolute: v literal nibbles, word-aligned byte count
            nb = (v + 1) // 2
            if i + nb > n or y >= h or x + v > w:
                return None
            for k in range(v):
                byte = data[i + k // 2]
                out[y, x + k] = (byte >> 4) if k % 2 == 0 else (byte & 0x0F)
            x += v
            i += nb + (nb & 1)


BMP_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

BMP_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
    ]
)


def synthesize_bmp(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """One BMP per input row, built worker-side (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [make_bmp(a) for a in ids_],
                }
            )

    return ids.mapInPandas(run, BMP_ASSET_SCHEMA)


def bmp_pixel_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload and aggregate exact integer channel sums
    (Arrow-batched; stats are order-invariant ints, so the result is
    engine-portable). Undecodable payloads → NULL stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out["asset_id"].append(int(aid))
                img = decode_bmp(bytes(payload)) if payload is not None else None
                if img is None:
                    for k in ("width", "height", "n_px", "sum_r", "sum_g", "sum_b"):
                        out[k].append(None)
                    continue
                h, w, _ = img.shape
                s = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------- WAV (audio)

#: deterministic waveform parameters (mirrored in the oracle SQL)
WAV_N_MOD = 300
WAV_A_MULT, WAV_I_MULT, WAV_S_MOD = 31, 17, 65536


def wav_audio_params(asset_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) — mono 16-bit."""
    return 8000 + 1000 * (asset_id % 4), 64 + asset_id % WAV_N_MOD


def _sample(asset_id: int, i: int) -> int:
    """int16 PCM sample i of the synthetic waveform — the formula the
    oracle re-computes symbolically."""
    return (asset_id * WAV_A_MULT + i * WAV_I_MULT) % WAV_S_MOD - 32768


def make_pcm_wav(asset_id: int) -> bytes:
    """Complete mono 16-bit PCM WAV with deterministic samples."""
    rate, n = wav_audio_params(asset_id)
    data = b"".join(
        struct.pack("<h", _sample(asset_id, i)) for i in range(n)
    )
    return _wav_container(rate, 16, data)


def _wav_container(rate: int, bits: int, data: bytes, fmt_tag: int = 1) -> bytes:
    width = bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate * width, width, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: µ-law byte-stream formula constants (mirrored in the oracle)
ULAW_A_MULT, ULAW_I_MULT = 37, 11
ULAW_BIAS = 0x84


def _ulaw_byte(asset_id: int, i: int) -> int:
    return (asset_id * ULAW_A_MULT + i * ULAW_I_MULT) % 256


def ulaw2linear(u: int) -> int:
    """G.711 µ-law expansion (the CCITT table as arithmetic): the
    byte is stored complemented; sign / 3-bit exponent / 4-bit
    mantissa expand to ((m·8 + 132) << e) − 132, negated on sign.
    0xFF → +0, 0x7F → −0, 0x00 → −32124."""
    u = ~u & 0xFF
    sign = u & 0x80
    mag = (((u & 0x0F) << 3) + ULAW_BIAS) << ((u >> 4) & 0x07)
    mag -= ULAW_BIAS
    return -mag if sign else mag


def make_pcm_wav_ulaw(asset_id: int) -> bytes:
    """Complete mono G.711 µ-LAW WAV (format tag 7, 8 bits/sample —
    the telephony/callcenter-corpus profile, r6). The data bytes
    follow the _ulaw_byte formula directly, so the oracle expands
    them with the same G.711 arithmetic without round-tripping an
    encoder."""
    rate, n = wav_audio_params(asset_id)
    data = bytes(_ulaw_byte(asset_id, i) for i in range(n))
    return _wav_container(rate, 8, data, fmt_tag=7)


def make_pcm_wav_f32(asset_id: int) -> bytes:
    """Complete mono IEEE-FLOAT WAV (format tag 3, 32 bits — the DAW
    /ML-dataset interchange profile, r6). Samples are the mono-16
    formula divided by 32768: exactly representable in float32
    (integer magnitude < 2^16, division by a power of two), so the
    decoder's float→PCM16 conversion floor(f·32768) reproduces the
    integer formula bit-exactly and the oracle stays in BIGINT."""
    rate, n = wav_audio_params(asset_id)
    data = b"".join(
        struct.pack("<f", _sample(asset_id, i) / 32768.0) for i in range(n)
    )
    return _wav_container(rate, 32, data, fmt_tag=3)


#: 24-bit waveform formula constants (mirrored in the oracle)
WAV24_A_MULT, WAV24_I_MULT = 7919, 104729
WAV24_MOD, WAV24_HALF = 1 << 24, 1 << 23


def _sample24(asset_id: int, i: int) -> int:
    """int24 PCM sample i of the synthetic waveform — full 24-bit
    signed range, the formula the oracle recomputes symbolically."""
    return (asset_id * WAV24_A_MULT + i * WAV24_I_MULT) % WAV24_MOD - WAV24_HALF


def pack_int24(samples: list[int]) -> bytes:
    """Little-endian signed 24-bit packing (3 bytes per sample)."""
    out = bytearray()
    for s in samples:
        u = s & 0xFFFFFF
        out += bytes((u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF))
    return bytes(out)


#: stereo right-channel offset constant (mirrored in the oracle)
STEREO_OFF = 12347


def _sample_st(asset_id: int, i: int, ch: int) -> int:
    return (
        asset_id * WAV_A_MULT + i * WAV_I_MULT + ch * STEREO_OFF
    ) % WAV_S_MOD - 32768


def make_pcm_wav_multi(asset_id: int, nch: int) -> bytes:
    """Complete nch-channel 16-bit PCM WAV: channel-interleaved
    frames (c0 c1 … c{nch-1} per frame), blockAlign 2·nch, channel
    c's formula offset by c·STEREO_OFF. nch=2 is the r5 stereo leg;
    nch=6 is the r6 5.1-layout leg."""
    rate, n = wav_audio_params(asset_id)
    data = b"".join(
        struct.pack(f"<{nch}h", *(_sample_st(asset_id, i, c) for c in range(nch)))
        for i in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_pcm_wav_stereo(asset_id: int) -> bytes:
    """Complete STEREO 16-bit PCM WAV (r5): channel-interleaved
    L0 R0 L1 R1 … frames, blockAlign 4, the formula offset by
    STEREO_OFF on the right channel."""
    return make_pcm_wav_multi(asset_id, 2)


def make_pcm_wav24(asset_id: int) -> bytes:
    """Complete mono 24-bit PCM WAV with deterministic samples (r5
    decoder-breadth extension; note an ODD byte count when n_samples
    is odd — the container pads the RIFF chunk, exercising the
    word-alignment path the 16-bit twin never hits)."""
    rate, n = wav_audio_params(asset_id)
    return _wav_container(rate, 24, pack_int24([_sample24(asset_id, i) for i in range(n)]))


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — r9
# ---------------------------------------------------------------------------
# The classic 4-bit compressed-PCM codec (IMA "Recommended Practices
# for Enhancing Digital Audio Compatibility", the DVI ADPCM of
# RFC 3551 §4.5.1): each block is independently decodable — a 4-byte
# header carrying the initial predictor (an int16 PCM sample) and
# step-table index, then two 4-bit nibbles per byte (low first),
# each expanding through the 89-entry step table with predictor
# clamping. The corpus leg flips in round 10 (rotation budget); the
# codec + pins land here.

IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

#: block size of the synthesized ADPCM legs (bytes; mono)
ADPCM_BLOCK_ALIGN = 256


def _ima_step(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """Expand one 4-bit code: (new predictor, new step index). The
    diff reconstruction uses the shift ladder (step/8 + optional
    step, step/2, step/4), predictor clamps to int16, index to
    [0, 88]."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[nibble & 7]))
    return pred, idx


def _ima_encode(samples: list[int]) -> tuple[bytes, int]:
    """Encode int16 samples into ADPCM blocks of ADPCM_BLOCK_ALIGN
    bytes (mono). The first sample of each block rides verbatim in
    the block header; the encoder tracks the DECODER's reconstruction
    so drift cannot accumulate. Returns (blocks, samples_per_block)."""
    spb = (ADPCM_BLOCK_ALIGN - 4) * 2 + 1
    out = bytearray()
    idx = 0
    for b0 in range(0, len(samples), spb):
        block = samples[b0 : b0 + spb]
        pred = block[0]
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in block[1:]:
            step = IMA_STEP_TABLE[idx]
            delta = s - pred
            code = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            nibbles.append(code)
            pred, idx = _ima_step(code, pred, idx)
        while len(nibbles) < spb - 1:  # pad the final partial block
            nibbles.append(0 if pred <= 0 else 8)  # step toward 0
            pred, idx = _ima_step(nibbles[-1], pred, idx)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out), spb


def make_wav_adpcm(asset_id: int) -> bytes:
    """Complete mono IMA-ADPCM WAV (format tag 0x11): the mono-16
    sample formula encoded block-at-a-time, the extended fmt chunk
    (cbSize=2, wSamplesPerBlock), and the MANDATORY ``fact`` chunk
    carrying the true sample count (how a decoder truncates the final
    block's padding)."""
    rate, n = wav_audio_params(asset_id)
    samples = [_sample(asset_id, i) for i in range(n)]
    blocks, spb = _ima_encode(samples)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, rate,
        (rate * ADPCM_BLOCK_ALIGN + spb - 1) // spb,  # avg byte rate
        ADPCM_BLOCK_ALIGN, 4, 2, spb,
    )
    fact = struct.pack("<I", n)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_adpcm_wav(b: bytes) -> tuple[int, np.ndarray] | None:
    """IMA-ADPCM (format 0x11) → (rate, int64 PCM16 samples), or
    None. MONO only (multi-channel IMA interleaves 4-byte channel
    groups — an honest refusal, never a guessed de-interleave); the
    fmt chunk must carry wSamplesPerBlock consistent with the block
    align, every block header's reserved byte must be 0 and its step
    index ≤ 88, and the ``fact`` count bounds the decoded stream
    (the final block's padding is truncated away, anything beyond
    the data's capacity refuses)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_body = data = fact = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        try:
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        except struct.error:
            return None
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            (fact,) = struct.unpack("<I", body[:4])
        pos += 8 + size + (size & 1)
    if fmt_body is None or data is None or fact is None or len(fmt_body) < 20:
        return None
    tag, channels, rate, _br, balign, bits, cb, spb = struct.unpack(
        "<HHIIHHHH", fmt_body[:20]
    )
    if tag != 0x11 or channels != 1 or bits != 4 or cb < 2:
        return None
    if balign < 5 or spb != (balign - 4) * 2 + 1:
        return None
    if len(data) % balign:
        return None
    n_blocks = len(data) // balign
    if not n_blocks or fact > n_blocks * spb or fact <= (n_blocks - 1) * spb:
        return None  # fact must land inside the FINAL block
    out = np.empty(n_blocks * spb, dtype=np.int64)
    w = 0
    for blk in range(n_blocks):
        off = blk * balign
        pred, idx, reserved = struct.unpack_from("<hBB", data, off)
        if reserved != 0 or idx > 88:
            return None
        out[w] = pred
        w += 1
        for byte in data[off + 4 : off + balign]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, idx = _ima_step(nib, pred, idx)
                out[w] = pred
                w += 1
    return int(rate), out[:fact]


def decode_pcm_wav(b: bytes) -> tuple[int, np.ndarray] | None:
    """bytes → (sample_rate, int64 sample array) for integer PCM
    (format 1: 16- or 24-bit, mono/multi-channel — the interleaved
    flat stream; per-channel views are one reshape away), IEEE FLOAT
    (format 3, 32-bit — converted to PCM16 via floor(f·32768),
    clamped, the standard render path — r6), or G.711 µ-LAW (format
    7, 8-bit — expanded through the CCITT arithmetic — r6); None for
    anything else. Walks RIFF chunks properly (skips unknown chunks,
    honors declared sizes + word alignment) instead of assuming a
    fixed layout."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = None
    audio_fmt = channels = bits = None
    data: bytes | None = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        try:
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        except struct.error:
            return None
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt not in (1, 3, 7):
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    # channel count: anything in the practical 1..8 range decodes
    # (the flat interleaved stream is channel-agnostic — r6 widened
    # the earlier {1, 2} gate); 0 is malformed, > 8 suspicious
    if rate is None or data is None or not 1 <= channels <= 8:
        return None
    if (
        (audio_fmt == 1 and bits not in (16, 24))
        or (audio_fmt == 3 and bits != 32)
        or (audio_fmt == 7 and bits != 8)
    ):
        return None
    if audio_fmt == 3:  # IEEE float → PCM16 render (r6)
        n = len(data) // 4
        f = np.frombuffer(data, dtype="<f4", count=n).astype(np.float64)
        return int(rate), np.clip(
            np.floor(f * 32768.0), -32768, 32767
        ).astype(np.int64)
    if audio_fmt == 7:  # µ-law expansion (r6)
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        v = ~u & 0xFF
        mag = (((v & 0x0F) << 3) + ULAW_BIAS) * (1 << ((v >> 4) & 0x07))
        mag -= ULAW_BIAS
        return int(rate), np.where(v & 0x80, -mag, mag)
    if bits == 16:
        n = len(data) // 2
        return int(rate), np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)
    # 24-bit: assemble 3 little-endian bytes, then sign-extend from
    # bit 23 (r5 extension)
    n = len(data) // 3
    raw = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(n, 3).astype(np.int64)
    u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
    return int(rate), u - (u >= (1 << 23)) * (1 << 24)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sum_amp", LongType(), True),
        StructField("sum_sq", LongType(), True),
        StructField("max_amp", IntegerType(), True),
    ]
)


def synthesize_pcm_wav(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [make_pcm_wav(a) for a in ids_],
                }
            )

    return ids.mapInPandas(run, BMP_ASSET_SCHEMA)


def synthesize_bmp_mixed(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Even asset_ids → 24-bit BI_RGB, % 4 == 1 → plain 8-bit
    paletted (r5), % 8 == 3 → BI_RLE8-compressed 8-bit paletted
    (r6), % 8 == 7 → BI_RLE4-compressed 4-BIT paletted (r9 — the
    nibble-run codec: alternating-pair encoded runs, nibble-packed
    absolute segments)."""

    def _mk(a: int) -> bytes:
        if a % 2 == 0:
            return make_bmp(a)
        if a % 4 == 1:
            return make_bmp8(a)
        return make_bmp4_rle(a) if a % 8 == 7 else make_bmp8_rle(a)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [_mk(a) for a in ids_],
                }
            )

    return ids.mapInPandas(run, BMP_ASSET_SCHEMA)


def synthesize_wav_mixed(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """asset_id % 4 == 0 → mono 16-bit, % 8 == 2 → STEREO 16-bit,
    % 8 == 6 → SIX-channel 16-bit (5.1 layout, r6); odd ids split the
    r5 all-24-bit leg: % 8 ∈ {1, 5} → mono 24-bit, % 8 == 3 →
    G.711 µ-LAW (r6), % 8 == 7 → IEEE FLOAT32 (r6)."""

    def _mk(a: int) -> bytes:
        if a % 8 == 3:
            return make_pcm_wav_ulaw(a)
        if a % 8 == 7:
            return make_pcm_wav_f32(a)
        if a % 2 == 1:
            return make_pcm_wav24(a)
        if a % 4 == 0:
            return make_pcm_wav(a)
        return make_pcm_wav_multi(a, 2 if a % 8 == 2 else 6)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [_mk(a) for a in ids_],
                }
            )

    return ids.mapInPandas(run, BMP_ASSET_SCHEMA)


def wav_sample_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload and aggregate exact integer amplitude
    stats (sum, sum of squares — the RMS numerator — and peak)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "sample_rate", "n_samples", "sum_amp", "sum_sq", "max_amp")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out["asset_id"].append(int(aid))
                dec = decode_pcm_wav(bytes(payload)) if payload is not None else None
                if dec is None:
                    for k in ("sample_rate", "n_samples", "sum_amp", "sum_sq", "max_amp"):
                        out[k].append(None)
                    continue
                rate, s = dec
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["sum_amp"].append(int(s.sum()))
                out["sum_sq"].append(int((s * s).sum()))
                out["max_amp"].append(int(np.abs(s).max()) if len(s) else None)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, WAV_STATS_SCHEMA)
