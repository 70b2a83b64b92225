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
    anything that is not a well-formed uncompressed 24-bit BMP.
    Handles the on-disk realities: pixel-data offset from the file
    header, 4-byte row padding, bottom-up row order, BGR channel
    order, and (per spec) negative height = top-down storage."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        _sig, _fsize, _r1, _r2, off = struct.unpack("<2sIHHI", b[:14])
        hdr_size, w, h_signed = struct.unpack("<Iii", b[14:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(b):
        return None
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


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
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_pcm_wav(b: bytes) -> tuple[int, np.ndarray] | None:
    """bytes → (sample_rate, int16 sample array) for mono 16-bit PCM
    WAV; None for anything else. Walks RIFF chunks properly (skips
    unknown chunks, honors declared sizes + word alignment) instead of
    assuming a fixed layout."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = None
    channels = bits = None
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
            if audio_fmt != 1:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None or channels != 1 or bits != 16:
        return None
    n = len(data) // 2
    return int(rate), np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)


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
