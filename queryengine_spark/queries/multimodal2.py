"""Round-3 multimodal addition: REAL pixel decode (BMP) — registered
after the round-3 certification window (queries/__init__.py).

Unlike the stubbed JPEG/PNG pixel paths (absent codec libs), the
24-bit BMP pipeline runs end-to-end: synthesize container bytes from
an arithmetic pixel formula → binary column → struct/numpy decode →
exact integer channel sums. The oracle recomputes the sums FROM THE
FORMULA (never touching the bytes), so a hash match certifies the
byte layout, stride padding, bottom-up flip and BGR ordering of the
actual decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.multimodal.bmp import (
    BMP_H_MOD,
    BMP_W_MOD,
    IDX_Y_MULT,
    PAL_B_MULT,
    PAL_B_OFF,
    PAL_G_A,
    PAL_G_MULT,
    PAL_R_MULT,
    bmp_pixel_stats,
    synthesize_bmp_mixed,
)
from queryengine_spark.queries.base import t


def multimodal_bmp_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Mixed BMP profiles (r5, extended r6): even asset_ids are
    24-bit BI_RGB, % 4 == 1 are plain 8-bit PALETTED (BGRX color
    table, index rows), % 4 == 3 are BI_RLE8-COMPRESSED paletted
    (r6) — real run-length decompression: encoded-mode runs on odd
    rows (the index formula repeats 3× along x), absolute-mode
    word-aligned segments on even rows, end-of-line and
    end-of-bitmap escapes. All decode through the same decode_bmp
    dispatch; the oracle recomputes channel sums from the pixel
    formula (24-bit), palette[index] composition (8-bit), and the
    row-parity RLE index formula (%4==3), so the hash certifies
    stride padding, bottom-up flip, BGR(X) ordering, the
    palette-lookup path AND the RLE8 decompressor."""
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return bmp_pixel_stats(synthesize_bmp_mixed(ids))


MULTIMODAL_BMP_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
dims AS (SELECT asset_id,
                CAST(4 + asset_id % {BMP_W_MOD} AS INT) AS w,
                CAST(4 + asset_id % {BMP_H_MOD} AS INT) AS h
         FROM ids),
px AS (SELECT asset_id, w, h, CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y
       FROM dims, unnest(range(0, w)) xx(i), unnest(range(0, h)) yy(i)),
idx AS (SELECT asset_id, w, h, x, y,
               -- r6: the %4=3 BI_RLE8 leg repeats indices 3× along x
               -- on odd rows (encoded-mode runs); even rows keep the
               -- run-free formula (absolute-mode segments)
               (CASE WHEN asset_id % 4 = 3 AND y % 2 = 1
                     THEN x // 3 ELSE x END
                + {IDX_Y_MULT} * y + asset_id) % 256 AS j
        FROM px),
sums AS (SELECT asset_id, w, h,
                CAST(SUM(CASE WHEN asset_id % 2 = 0
                     THEN (x * y + asset_id) % 256
                     ELSE (j * {PAL_R_MULT} + asset_id) % 256 END) AS BIGINT) AS sum_r,
                CAST(SUM(CASE WHEN asset_id % 2 = 0
                     THEN (asset_id + y) % 256
                     ELSE (j * {PAL_G_MULT} + {PAL_G_A} * asset_id) % 256 END) AS BIGINT) AS sum_g,
                CAST(SUM(CASE WHEN asset_id % 2 = 0
                     THEN (asset_id + x) % 256
                     ELSE (j * {PAL_B_MULT} + {PAL_B_OFF}) % 256 END) AS BIGINT) AS sum_b
         FROM idx GROUP BY asset_id, w, h)
SELECT asset_id, w AS width, h AS height,
       CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b
FROM sums
"""


QUERIES = {
    "multimodal_bmp_decode": (multimodal_bmp_decode, MULTIMODAL_BMP_DECODE_SQL),
}


def multimodal_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Audio twin of the BMP path, mixed profiles (r5, extended r6):
    asset_id % 4 == 0 → mono 16-bit PCM, % 8 == 2 → STEREO 16-bit
    (interleaved L/R frames, channel c's formula offset by
    c·STEREO_OFF; n_samples counts all decoded values, 2 per frame),
    % 8 == 6 → SIX-channel 16-bit (5.1 layout — r6 widened the
    decoder's {1,2} channel gate to the practical 1..8 range), odd →
    mono 24-BIT PCM (3-byte little-endian samples with sign
    extension from bit 23, plus the RIFF word-alignment pad an odd
    byte count forces). All decode through the same RIFF chunk walk;
    the oracle recomputes the amplitude stats from each leg's
    waveform formula."""
    from queryengine_spark.multimodal.bmp import (
        synthesize_wav_mixed,
        wav_sample_stats,
    )

    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return wav_sample_stats(synthesize_wav_mixed(ids))


from queryengine_spark.multimodal.bmp import (  # noqa: E402
    STEREO_OFF,
    WAV24_A_MULT,
    WAV24_HALF,
    WAV24_I_MULT,
    WAV24_MOD,
    WAV_A_MULT,
    WAV_I_MULT,
    WAV_N_MOD,
    WAV_S_MOD,
)

MULTIMODAL_WAV_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
par AS (SELECT asset_id,
               CAST(8000 + 1000 * (asset_id % 4) AS INT) AS sample_rate,
               CAST(64 + asset_id % {WAV_N_MOD} AS BIGINT) AS n_frames
        FROM ids),
smp AS (SELECT asset_id, sample_rate, n_frames,
               CASE WHEN asset_id % 2 = 1
               THEN (asset_id * {WAV24_A_MULT} + CAST(t.i AS BIGINT) * {WAV24_I_MULT}) % {WAV24_MOD} - {WAV24_HALF}
               ELSE (asset_id * {WAV_A_MULT} + CAST(t.i AS BIGINT) * {WAV_I_MULT}
                     + CAST(c.ch AS BIGINT) * {STEREO_OFF}) % {WAV_S_MOD} - 32768
               END AS s
        FROM par,
             unnest(range(0, n_frames)) t(i),
             unnest(CASE WHEN asset_id % 8 = 6 THEN [0, 1, 2, 3, 4, 5]
                         WHEN asset_id % 8 = 2 THEN [0, 1]
                         ELSE [0] END) c(ch)
        WHERE asset_id % 2 = 0 OR c.ch = 0)
SELECT asset_id, sample_rate,
       CAST(CASE WHEN asset_id % 8 = 6 THEN 6 * n_frames
                 WHEN asset_id % 8 = 2 THEN 2 * n_frames
                 ELSE n_frames END AS BIGINT) AS n_samples,
       CAST(SUM(s) AS BIGINT) AS sum_amp,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(s)) AS INT) AS max_amp
FROM smp
GROUP BY asset_id, sample_rate, n_frames
"""

QUERIES["multimodal_wav_decode"] = (multimodal_wav_decode, MULTIMODAL_WAV_DECODE_SQL)


from queryengine_spark.multimodal.phash import (  # noqa: E402
    PH_B,
    PH_DELTA_BASE,
    PH_DELTA_MOD,
    PH_G,
    PH_H_MOD,
    PH_R,
    PH_W_MOD,
    image_near_dup_pairs,
)


def dedup_image_phash(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash image dedup (r6) — the decoder matrix feeding
    the dedup pillar: synthesize a mixed BMP/PNG corpus where each
    even/odd asset pair renders the same image with one grid cell
    brightness-shifted, REALLY decode every container (magic-byte
    dispatch), fingerprint with an integer-exact 9×8 dHash, and find
    all pairs within Hamming distance 3 via the banded equi-join
    shared with text SimHash (exact by pigeonhole, no all-pairs).
    The oracle recomputes fingerprints from the pixel FORMULA and
    compares all pairs — a hash match certifies the BMP and PNG
    decoders, the luma/downsample/difference arithmetic, the hex
    encoding, and the banded search's exactness in one number.
    Design doc: multimodal/phash.py."""
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return image_near_dup_pairs(ids, max_dist=3, n_bands=4)


DEDUP_IMAGE_PHASH_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
par AS (SELECT asset_id, asset_id // 2 AS gid, asset_id % 2 AS variant FROM ids),
dims AS (SELECT asset_id, gid, variant,
                CAST(16 + gid % {PH_W_MOD} AS BIGINT) AS w,
                CAST(16 + gid % {PH_H_MOD} AS BIGINT) AS h,
                1 + gid % 7 AS i0, gid % 8 AS j0,
                {PH_DELTA_BASE} + gid % {PH_DELTA_MOD} AS delta
         FROM par),
px AS (SELECT asset_id, gid, variant, w, h, i0, j0, delta,
              CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y
       FROM dims, unnest(range(0, w)) xx(i), unnest(range(0, h)) yy(i)),
lum AS (SELECT asset_id, (x*9)//w AS cx, (y*8)//h AS cy,
          299*(CASE WHEN variant = 1 AND (x*9)//w = i0 AND (y*8)//h = j0
               THEN (({PH_R[0]}*x + {PH_R[1]}*y + {PH_R[2]}*gid) % 256 + delta) % 256
               ELSE ({PH_R[0]}*x + {PH_R[1]}*y + {PH_R[2]}*gid) % 256 END)
        + 587*(({PH_G[0]}*x + {PH_G[1]}*y + {PH_G[2]}*gid) % 256)
        + 114*(({PH_B[0]}*x + {PH_B[1]}*y + {PH_B[2]}*gid) % 256) AS l
        FROM px),
cells AS (SELECT asset_id, cx, cy, CAST(SUM(l) AS BIGINT) AS s, COUNT(*) AS n
          FROM lum GROUP BY 1, 2, 3),
bits AS (SELECT a.asset_id, a.cy*8 + a.cx AS k,
                CASE WHEN a.s*b.n > b.s*a.n THEN 1 ELSE 0 END AS bit
         FROM cells a JOIN cells b
           ON a.asset_id = b.asset_id AND a.cy = b.cy AND b.cx = a.cx + 1
         WHERE a.cx < 8),
fp AS (SELECT asset_id,
              CAST(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << (31 - k)) ELSE 0 END) AS BIGINT) AS hi,
              CAST(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (63 - k)) ELSE 0 END) AS BIGINT) AS lo
       FROM bits GROUP BY 1)
SELECT a.asset_id AS id_a, b.asset_id AS id_b,
       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
"""

QUERIES["dedup_image_phash"] = (dedup_image_phash, DEDUP_IMAGE_PHASH_SQL)
