"""Image perceptual-hash dedup (multimodal/phash.py): the dHash
kernel is pinned against hand-computed bit vectors and an independent
pure-Python simulator (never the module's own arithmetic), the
planted-pair contract is verified, and the banded Hamming search is
checked EXACT against brute force over the full fingerprint set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from queryengine_spark.multimodal.bmp import decode_bmp
from queryengine_spark.multimodal.jpeg import decode_jpeg_rgb
from queryengine_spark.multimodal.phash import (
    dhash64,
    dhash_relation,
    image_near_dup_pairs,
    make_phash_asset,
    phash_params,
    phj_dc,
    synthesize_phash_assets,
)
from queryengine_spark.multimodal.png import decode_png
from queryengine_spark.multimodal.tiff import decode_tiff


def _decode(b: bytes) -> np.ndarray:
    if b[:2] == b"BM":
        arr = decode_bmp(b)
    elif b[:2] in (b"II", b"MM"):
        arr = decode_tiff(b)
    elif b[:2] == b"\xff\xd8":
        arr = decode_jpeg_rgb(b)  # r8: color for the 4:4:4 DC sub-leg
    else:
        arr = decode_png(b)
    assert arr is not None
    return arr


def _sim_dhash(arr: np.ndarray) -> str:
    """Independent scalar-loop simulator of the documented dHash
    definition (no numpy vectorization shared with the module)."""
    h, w = arr.shape[0], arr.shape[1]
    s = [[0] * 9 for _ in range(8)]
    n = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            r, g, b = int(arr[y, x, 0]), int(arr[y, x, 1]), int(arr[y, x, 2])
            cxx, cyy = (x * 9) // w, (y * 8) // h
            s[cyy][cxx] += 299 * r + 587 * g + 114 * b
            n[cyy][cxx] += 1
    v = 0
    for cy in range(8):
        for cx in range(8):
            if s[cy][cx] * n[cy][cx + 1] > s[cy][cx + 1] * n[cy][cx]:
                v |= 1 << (63 - (cy * 8 + cx))
    return "%016x" % v


def _ham(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def test_dhash_hand_vector():
    # 16x18 image (w=18 divisible by 9, h=16 by 8): cell (cx, cy) is
    # exactly 2x2 px. Luma = x makes every left cell darker than its
    # right neighbour -> all 64 bits ZERO; luma = -x (via reversed
    # gradient) sets all 64 bits.
    w, h = 18, 16
    inc = np.zeros((h, w, 3), dtype=np.uint8)
    inc[..., 0] = np.arange(w, dtype=np.uint8)[None, :]  # brighter rightwards
    assert dhash64(inc) == "0" * 16
    dec = np.zeros((h, w, 3), dtype=np.uint8)
    dec[..., 0] = np.arange(w, 0, -1, dtype=np.uint8)[None, :]
    assert dhash64(dec) == "f" * 16
    # single hand-placed bright cell at grid (cx=3, cy=2): brighter
    # than BOTH neighbours -> bit (2,3)=1 (left cmp at k=2*8+3=19... )
    one = np.zeros((h, w, 3), dtype=np.uint8)
    one[4:6, 6:8, 1] = 200  # rows 4-5 = cy 2, cols 6-7 = cx 3
    k = 2 * 8 + 3  # cell (3,2) vs (4,2): bit set (brighter)
    # cell (2,2) vs (3,2): left neighbour darker -> bit k-1 clear
    v = int(dhash64(one), 16)
    assert (v >> (63 - k)) & 1 == 1
    assert (v >> (63 - (k - 1))) & 1 == 0
    assert bin(v).count("1") == 1


def test_dhash_vs_independent_simulator():
    for aid in range(24):
        arr = _decode(make_phash_asset(aid))
        assert dhash64(arr) == _sim_dhash(arr), aid


def test_containers_rotate_and_decode():
    """gid % 4 routes BMP / PNG / JPEG / TIFF (r7); all decode to the
    expected dims (the JPEG leg is fixed 72×64, block == dHash cell)."""
    for aid in range(16):
        b = make_phash_asset(aid)
        gid = aid // 2
        leg = gid % 4
        if leg == 0:
            assert b[:2] == b"BM"
        elif leg == 1:
            assert b[:8] == b"\x89PNG\r\n\x1a\n"
        elif leg == 2:
            assert b[:2] == b"\xff\xd8"
        else:
            assert b[:2] == b"II"
        w, h, *_ = phash_params(gid)
        if leg == 2:
            w, h = 72, 64
        assert _decode(b).shape[:2] == (h, w)


def test_jpeg_leg_pixels_match_dc_formula():
    """The color DC sub-leg (r8): decoded RGB is exactly the pinned
    integer Rec.601 of the planted per-block Y/Cb/Cr DCs — computed
    here with scalar arithmetic independent of the module."""
    from queryengine_spark.multimodal.phash import phj_dc_chroma

    for aid in (4, 5, 20, 21):  # gid 2, 10 → gid % 8 == 2
        gid, variant = aid // 2, aid % 2
        img = decode_jpeg_rgb(make_phash_asset(aid))
        assert img is not None and img.shape == (64, 72, 3)
        for by in range(8):
            for bx in range(9):
                blk = img[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                yv = phj_dc(gid, variant, bx, by) + 128
                cb = phj_dc_chroma(gid, 1, bx, by)
                cr = phj_dc_chroma(gid, 2, bx, by)
                want = (
                    min(255, max(0, yv + (1402 * cr + 500) // 1000)),
                    min(255, max(0, yv - (344 * cb + 714 * cr + 500) // 1000)),
                    min(255, max(0, yv + (1772 * cb + 500) // 1000)),
                )
                for c in range(3):
                    assert (blk[..., c] == want[c]).all(), (aid, bx, by, c)


def test_planted_pairs_within_two_bits():
    fps = {aid: dhash64(_decode(make_phash_asset(aid))) for aid in range(80)}
    for g in range(40):
        assert _ham(fps[2 * g], fps[2 * g + 1]) <= 2, g


def test_banded_search_exact_vs_bruteforce(spark):
    n = 120
    ids = spark.range(n).select(F.col("id").alias("asset_id"))
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(ids, max_dist=3, n_bands=4).collect()
    }
    fps = {aid: dhash64(_decode(make_phash_asset(aid))) for aid in range(n)}
    want = {
        (a, b): _ham(fps[a], fps[b])
        for a in range(n)
        for b in range(a + 1, n)
        if _ham(fps[a], fps[b]) <= 3
    }
    assert got == want
    assert len(want) >= n // 2 - 2  # planted pairs dominate


def test_spark_relation_matches_local(spark):
    ids = spark.range(40).select(F.col("id").alias("asset_id"))
    rel = dhash_relation(synthesize_phash_assets(ids))
    got = {r.id: r.sim for r in rel.collect()}
    assert got == {
        aid: dhash64(_decode(make_phash_asset(aid))) for aid in range(40)
    }


def test_undecodable_payload_dropped(spark):
    pdf = pd.DataFrame(
        {"asset_id": [1, 2], "payload": [make_phash_asset(1), b"\x00garbage"]}
    )
    df = spark.createDataFrame(pdf)
    out = dhash_relation(df).collect()
    assert [r.id for r in out] == [1]


def test_no_cartesian_in_plan(spark):
    ids = spark.range(50).select(F.col("id").alias("asset_id"))
    plan = image_near_dup_pairs(ids)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
