"""Multimodal driver-contract queries: binary payload columns built
from ``documents`` (the container has no real media; the plumbing —
binary type, metadata, hashing, Arrow batch extraction — is the real
thing). Stats query has a DuckDB oracle (blob semantics match);
feature extraction goes through mapInPandas → rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.multimodal import attach_payload, extract_features
from queryengine_spark.queries.base import t


def _assets(spark: SparkSession, sf: str) -> DataFrame:
    return attach_payload(t(spark, sf, "documents"), "doc_id", "text", "text/plain")


def multimodal_binary_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-media-type payload stats computed on the binary column."""
    a = _assets(spark, sf)
    return a.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.md5("payload")).alias("min_hash"),
        F.max(F.md5("payload")).alias("max_hash"),
    )


BINARY_STATS_SQL = """
SELECT 'text/plain' AS media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
       MIN(md5(text)) AS min_hash,
       MAX(md5(text)) AS max_hash
FROM documents
"""


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over a MIXED
    asset relation covering EVERY in-repo real decoder via
    ``_decode_dims``'s magic-byte dispatch (r5: PNG/GIF/JPEG legs
    joined the r4 BMP leg; r6: TIFF) — odd doc_ids ship their text as
    an opaque text/plain payload (md5 content hash + deterministic
    fake dims); even doc_ids ship a synthesized container routed by
    doc_id residue: ≡0 (mod 16) → uncompressed 24-bit BMP, ≡8 (mod
    16) → baseline TIFF (II/MM byte orders + PackBits, mixed by
    asset_id % 3), ≡2 (mod 8) → 8-bit RGBA PNG (zlib + scanline
    filters), ≡4 → GIF89a (LZW), ≡6 → DC-profile baseline JPEG
    (canonical Huffman). Each decodes for REAL worker-side and
    reports its true pixel dimensions.

    Fully oracled: text-row hash and fake dims are md5-derived
    (DuckDB recomputes them from md5(text) hex digits); image true
    dims follow each synthesizer's arithmetic (bmp_params /
    png_rgba_params / gif_params / jpeg_params×8). Container size
    stays a real output for text and BMP (deterministic layout) but
    is projected NULL for the compressed formats — a zlib/LZW/Huffman
    stream length is not SQL-derivable — and content_hash is NULL for
    all structurally-decoded media: their byte-exactness is certified
    far more strongly by the multimodal_*_decode channel-sum formula
    oracles."""
    from queryengine_spark.multimodal.bmp import synthesize_bmp
    from queryengine_spark.multimodal.gif import synthesize_gif
    from queryengine_spark.multimodal.jpeg import synthesize_jpeg
    from queryengine_spark.multimodal.png import synthesize_png
    from queryengine_spark.multimodal.tiff import synthesize_tiff

    docs = t(spark, sf, "documents")
    text_assets = attach_payload(
        docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", "text/plain"
    )

    def _ids(rem: int, mod: int = 8) -> DataFrame:
        return docs.filter(F.col("doc_id") % mod == rem).select(
            F.col("doc_id").cast("long").alias("asset_id")
        )

    def _leg(synth: DataFrame, mtype: str, real_len: bool) -> DataFrame:
        n = (
            F.octet_length("payload").cast("long")
            if real_len
            else F.lit(None).cast("long")
        )
        return synth.select(
            "asset_id",
            F.lit(mtype).alias("media_type"),
            "payload",
            n.alias("n_bytes"),
        )

    # r6: the BMP slot split in two — ids ≡ 8 (mod 16) now carry
    # baseline TIFF containers (mixed II/MM + PackBits profiles by
    # asset_id % 3), routed by the II*/MM* magic through decode_tiff
    assets = (
        text_assets
        .unionByName(_leg(synthesize_bmp(_ids(0, 16)), "image/bmp", True))
        .unionByName(_leg(synthesize_tiff(_ids(8, 16)), "image/tiff", False))
        .unionByName(_leg(synthesize_png(_ids(2)), "image/png", False))
        .unionByName(_leg(synthesize_gif(_ids(4)), "image/gif", False))
        .unionByName(_leg(synthesize_jpeg(_ids(6)), "image/jpeg", False))
    )
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.when(F.col("media_type") != "text/plain", F.lit(None).cast("string"))
        .otherwise(F.col("content_hash"))
        .alias("content_hash"),
        "width",
        "height",
    )


# hex-digit value of char at position i (1-based) of md5(text)
def _hexat(i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1)"


# byte k (0-based) of the md5 digest, from its hex string
def _md5_byte(k: int) -> str:
    return f"({_hexat(2 * k + 1)} * 16 + {_hexat(2 * k + 2)})"


# Mirrors multimodal/__init__.py::_fake_decode (md5-derived dims for
# opaque payloads), multimodal/bmp.py::bmp_params + make_bmp's
# container layout (54 header bytes + 4-byte-aligned rows), and the
# dimension arithmetic of png_rgba_params / gif_params / jpeg_params
# (jpeg dims are 8×(block counts)). Compressed-container sizes are
# NULL by contract (zlib/LZW/Huffman lengths are not SQL-derivable).
FEATURES_SQL = f"""
SELECT doc_id AS asset_id,
       'text/plain' AS media_type,
       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash,
       CAST(16 + {_md5_byte(0)} % 64 AS INT) AS width,
       CAST(16 + {_md5_byte(1)} % 64 AS INT) AS height
FROM documents WHERE doc_id % 2 = 1
UNION ALL
SELECT doc_id AS asset_id,
       'image/bmp' AS media_type,
       CAST(54 + ((4 + doc_id % 13) * 3 + 3) // 4 * 4 * (4 + doc_id % 9)
            AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_hash,
       CAST(4 + doc_id % 13 AS INT) AS width,
       CAST(4 + doc_id % 9 AS INT) AS height
FROM documents WHERE doc_id % 16 = 0
UNION ALL
SELECT doc_id AS asset_id,
       'image/tiff' AS media_type,
       CAST(NULL AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_hash,
       CAST(5 + doc_id % 12 AS INT) AS width,
       CAST(4 + doc_id % 9 AS INT) AS height
FROM documents WHERE doc_id % 16 = 8
UNION ALL
SELECT doc_id AS asset_id,
       'image/png' AS media_type,
       CAST(NULL AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_hash,
       CAST(4 + doc_id % 11 AS INT) AS width,
       CAST(4 + doc_id % 7 AS INT) AS height
FROM documents WHERE doc_id % 8 = 2
UNION ALL
SELECT doc_id AS asset_id,
       'image/gif' AS media_type,
       CAST(NULL AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_hash,
       CAST(6 + doc_id % 17 AS INT) AS width,
       CAST(5 + doc_id % 13 AS INT) AS height
FROM documents WHERE doc_id % 8 = 4
UNION ALL
SELECT doc_id AS asset_id,
       'image/jpeg' AS media_type,
       CAST(NULL AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_hash,
       CAST(8 * (1 + doc_id % 5) AS INT) AS width,
       CAST(8 * (1 + doc_id % 3) AS INT) AS height
FROM documents WHERE doc_id % 8 = 6
"""


def multimodal_header_parse(spark: SparkSession, sf: str) -> DataFrame:
    """REAL binary decode path (multimodal/headers.py): synthesize a
    valid media container per document (PNG for even ids, WAV for odd
    — correct signatures, chunk layout, CRCs), then sniff + struct-
    unpack the headers back out, all worker-side through Arrow
    batches. The oracle recomputes the expected parse output from the
    synthesis arithmetic alone, so the byte round-trip is hash-checked
    without DuckDB touching a single payload."""
    from queryengine_spark.multimodal.headers import (
        parse_media_headers,
        synthesize_media,
    )

    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return parse_media_headers(synthesize_media(ids))


# Mirrors the synthesis constants in multimodal/headers.py
# (PNG_W_MULT/PNG_H_MULT/PNG_DIM_MOD, WAV_RATES, wav_params) and the
# fixed container layouts: header-only PNG = 45 bytes; PCM WAV = 44
# bytes + n_samples * channels * 2.
HEADER_PARSE_SQL = """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS fmt,
       CASE WHEN doc_id % 2 = 0 THEN CAST(16 + (doc_id * 7919) % 2048 AS INT) END AS width,
       CASE WHEN doc_id % 2 = 0 THEN CAST(16 + (doc_id * 104729) % 2048 AS INT) END AS height,
       CASE WHEN doc_id % 2 = 1 THEN CAST(
           CASE (doc_id // 2) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                  WHEN 2 THEN 22050 ELSE 44100 END AS INT) END AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN CAST(1 + (doc_id // 2) % 2 AS INT) END AS channels,
       CASE WHEN doc_id % 2 = 1 THEN CAST(
           (100 + doc_id % 400) * 1000 // (CASE (doc_id // 2) % 4 WHEN 0 THEN 8000
               WHEN 1 THEN 16000 WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) END AS duration_ms,
       CASE WHEN doc_id % 2 = 0 THEN CAST(45 AS BIGINT)
            ELSE CAST(44 + (100 + doc_id % 400) * (1 + (doc_id // 2) % 2) * 2 AS BIGINT)
       END AS n_bytes
FROM documents
"""


# --------------------------------------------------------------- r8 fold

from queryengine_spark.queries.base import fold_legs, fold_sql  # noqa: E402

_INVENTORY_COLS = [
    ("media_type", "string"),
    ("n_assets", "bigint"),
    ("total_bytes", "bigint"),
    ("min_hash", "string"),
    ("max_hash", "string"),
    ("asset_id", "bigint"),
    ("fmt", "string"),
    ("width", "int"),
    ("height", "int"),
    ("sample_rate", "int"),
    ("channels", "int"),
    ("duration_ms", "bigint"),
    ("n_bytes", "bigint"),
]


def multimodal_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """Asset-inventory fold (r8): leg 'binary_stats' = per-media-type
    byte/hash aggregates over the opaque payload relation; leg
    'header_parse' = per-asset container-header fields. Pre-fold
    semantics of multimodal_binary_stats / multimodal_header_parse,
    unchanged."""
    return fold_legs(
        [
            ("binary_stats", multimodal_binary_stats(spark, sf)),
            ("header_parse", multimodal_header_parse(spark, sf)),
        ],
        _INVENTORY_COLS,
    )


MULTIMODAL_INVENTORY_SQL = fold_sql(
    [
        ("binary_stats", BINARY_STATS_SQL,
         {"media_type", "n_assets", "total_bytes", "min_hash", "max_hash"}),
        ("header_parse", HEADER_PARSE_SQL,
         {"asset_id", "fmt", "width", "height", "sample_rate", "channels",
          "duration_ms", "n_bytes"}),
    ],
    _INVENTORY_COLS,
)


QUERIES = {
    "multimodal_inventory": (multimodal_inventory, MULTIMODAL_INVENTORY_SQL),
    "multimodal_features": (multimodal_features, FEATURES_SQL),
}
