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
    bmp_pixel_stats,
    synthesize_bmp,
)
from queryengine_spark.queries.base import t


def multimodal_bmp_decode(spark: SparkSession, sf: str) -> DataFrame:
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return bmp_pixel_stats(synthesize_bmp(ids))


MULTIMODAL_BMP_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
dims AS (SELECT asset_id,
                CAST(4 + asset_id % {BMP_W_MOD} AS INT) AS w,
                CAST(4 + asset_id % {BMP_H_MOD} AS INT) AS h
         FROM ids),
px AS (SELECT asset_id, w, h, CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y
       FROM dims, unnest(range(0, w)) xx(i), unnest(range(0, h)) yy(i)),
sums AS (SELECT asset_id, w, h,
                CAST(SUM((x * y + asset_id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((asset_id + y) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((asset_id + x) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY asset_id, w, h)
SELECT asset_id, w AS width, h AS height,
       CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b
FROM sums
"""


QUERIES = {
    "multimodal_bmp_decode": (multimodal_bmp_decode, MULTIMODAL_BMP_DECODE_SQL),
}


def multimodal_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Audio twin of the BMP path: synthesize mono 16-bit PCM WAV
    with a deterministic waveform, decode it for REAL (RIFF chunk
    walk + int16 sample extraction), aggregate exact integer
    amplitude stats; the oracle recomputes them from the waveform
    formula."""
    from queryengine_spark.multimodal.bmp import (
        synthesize_pcm_wav,
        wav_sample_stats,
    )

    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return wav_sample_stats(synthesize_pcm_wav(ids))


from queryengine_spark.multimodal.bmp import (  # noqa: E402
    WAV_A_MULT,
    WAV_I_MULT,
    WAV_N_MOD,
    WAV_S_MOD,
)

MULTIMODAL_WAV_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
par AS (SELECT asset_id,
               CAST(8000 + 1000 * (asset_id % 4) AS INT) AS sample_rate,
               CAST(64 + asset_id % {WAV_N_MOD} AS BIGINT) AS n_samples
        FROM ids),
smp AS (SELECT asset_id, sample_rate, n_samples,
               (asset_id * {WAV_A_MULT} + CAST(t.i AS BIGINT) * {WAV_I_MULT}) % {WAV_S_MOD} - 32768 AS s
        FROM par, unnest(range(0, n_samples)) t(i))
SELECT asset_id, sample_rate, n_samples,
       CAST(SUM(s) AS BIGINT) AS sum_amp,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(s)) AS INT) AS max_amp
FROM smp
GROUP BY asset_id, sample_rate, n_samples
"""

QUERIES["multimodal_wav_decode"] = (multimodal_wav_decode, MULTIMODAL_WAV_DECODE_SQL)
