"""Late-round additions, registered LAST in the module order.

Why a trailing module exists: the driver's 50-row oracle window
certifies the stalest-first prefix of the registry, and a round's
window can be exactly full (round 4: 50 uncertified queries in 50
slots). Queries added here sort AFTER every same-tier entry, so they
never displace a query that is still waiting for its first driver
row — they take their own first row the following round.

Contents (round 4 tail):
- ``multimodal_png_decode`` — the PNG twin of the real BMP/WAV decode
  paths: full-pixel RGBA PNGs (all five scanline filters, split IDAT)
  synthesized worker-side, decoded for real (zlib + filter
  reconstruction incl. Paeth), channel sums checked against the
  synthesis formula by the oracle.
- ``events_anomaly_window`` — rolling-window anomaly detection over
  the hourly event-count series: an all-integer z²-test
  ((n·x − s)² > K²·(n·ss − s²)) against the trailing 24 buckets,
  bit-identical cross-engine because no division or sqrt ever
  happens.
- ``text_lm_surprise`` — corpus bigram-LM quality scoring: each
  document's mean inverse conditional-probability rank
  ((c(w1)·10^6) div c(w1 w2), averaged over the doc's bigrams) — the
  KenLM-style "perplexity filter" shape as an exact integer rank
  statistic (documented divergence: monotone surprise rank, not a
  log-space perplexity — same ordering intent, zero float drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.plans import spread
from queryengine_spark.queries.base import t
from queryengine_spark.queries.textstats import _TOKS

_TOKS_RAW = _TOKS.format(c="text")

# ---------------------------------------------------------------------------
# Real PNG decode
# ---------------------------------------------------------------------------

from queryengine_spark.multimodal.png import (  # noqa: E402
    PNG2_H_MOD,
    PNG2_W_MOD,
    GRAY16_A,
    GRAY16_X,
    GRAY16_Y,
    GRAY_X_MULT,
    GRAY_Y_MULT,
    PAL3_BM,
    PAL3_GM,
    PAL3_IDX_XM,
    PAL3_IDX_YM,
    PAL3_RM,
    RGB16_B,
    RGB16_G,
    RGB16_R,
    png_pixel_stats,
    synthesize_png_mixed,
    synthesize_png,
)


def multimodal_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize → decode → aggregate, entirely worker-side (two
    chained mapInPandas stages, zero shuffles before the final
    projection). Mixed color types: asset_id % 4 == 0 is 8-bit RGBA
    (of which % 32 == 28 stores the SAME image Adam7-INTERLACED at
    bpp=4 — identical sums, so only the position-weighted wsum can
    catch a misplaced color pass); % 32 == 23 is GRAY+ALPHA (color
    type 4, r9 — the last PNG color type — itself interlaced at
    bpp=2, alpha on the RGBA leg's alpha formula); % 16 == 9 is 1-BIT
    grayscale and % 16 == 10 is 4-BIT PALETTED (r9 — SUB-BYTE depths:
    MSB-first bit unpacking, zero-padded final bytes, filters at byte
    granularity per PNG 7.2/9);
    % 8 == 2 is 8-bit PALETTED (r6 — 256-entry PLTE, the oracle
    recomputes palette[index] composition symbolically); % 16 == 6 is
    8-bit TRUECOLOR (color type 2, r9 — bpp=3 filter arithmetic, the
    dominant non-palette web profile); % 16 == 14 is 16-BIT TRUECOLOR
    (r9 — bpp=6 bytewise filters, hi/lo bytes of each channel differ
    so a byte-swapped decode breaks the sums); % 8 == 1 is
    8-bit grayscale (color type 0, bpp=1 filter arithmetic); % 8 == 5
    is 16-BIT grayscale (r6 — big-endian sample pairs, bpp=2 BYTEWISE
    filters: low bytes filter against low bytes two back); % 4 == 3
    is grayscale with ADAM7 INTERLACE (r6 — 7 independently filtered
    passes scattered back to place; the position-weighted ``wsum``
    column makes a misplaced pass break the oracle hash, where plain
    channel sums are permutation-invariant and could not). See
    multimodal/png.py for the correctness story."""
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return png_pixel_stats(synthesize_png_mixed(spread(ids)))


MULTIMODAL_PNG_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
dims AS (SELECT asset_id,
                CAST(4 + asset_id % {PNG2_W_MOD} AS INT) AS w,
                CAST(4 + asset_id % {PNG2_H_MOD} AS INT) AS h
         FROM ids),
px AS (SELECT asset_id, w, h, CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y,
              ({PAL3_IDX_XM} * CAST(xx.i AS BIGINT)
               + {PAL3_IDX_YM} * CAST(yy.i AS BIGINT) + asset_id) % 256 AS pidx
       FROM dims, unnest(range(0, w)) xx(i), unnest(range(0, h)) yy(i)),
ch AS (SELECT asset_id, w, h, x, y,
              CASE WHEN asset_id % 8 = 5
                   THEN ({GRAY16_X} * x + {GRAY16_Y} * y
                         + {GRAY16_A} * asset_id) % 65536
                   WHEN asset_id % 16 = 14
                   THEN ({RGB16_R[0]} * x + {RGB16_R[1]} * y
                         + {RGB16_R[2]} * asset_id) % 65536
                   WHEN asset_id % 4 = 0 OR asset_id % 16 = 6
                   THEN (x * y + asset_id) % 256
                   -- r9: the %16=10 palette slot is 4-bit (indices mod 16)
                   WHEN asset_id % 16 = 10
                   THEN ({PAL3_RM} * (pidx % 16) + asset_id) % 256
                   WHEN asset_id % 8 = 2 THEN ({PAL3_RM} * pidx + asset_id) % 256
                   -- r9: the %16=9 gray slot is 1-bit (samples mod 2)
                   WHEN asset_id % 16 = 9
                   THEN ({GRAY_X_MULT} * x + {GRAY_Y_MULT} * y + asset_id) % 2
                   ELSE ({GRAY_X_MULT} * x + {GRAY_Y_MULT} * y + asset_id) % 256
              END AS first_ch,
              pidx
       FROM px),
sums AS (SELECT asset_id, w, h,
                CAST(SUM(CASE WHEN asset_id % 2 = 0 THEN first_ch
                         END) AS BIGINT) AS sum_r,
                CAST(SUM(CASE WHEN asset_id % 4 = 0 OR asset_id % 16 = 6
                     THEN (asset_id + 2 * y) % 256
                     WHEN asset_id % 16 = 10
                     THEN ({PAL3_GM} * (pidx % 16) + 7) % 256
                     WHEN asset_id % 8 = 2
                     THEN ({PAL3_GM} * pidx + 7) % 256
                     WHEN asset_id % 16 = 14
                     THEN ({RGB16_G[0]} * x + {RGB16_G[1]} * y
                           + {RGB16_G[2]} * asset_id) % 65536
                     END) AS BIGINT) AS sum_g,
                CAST(SUM(CASE WHEN asset_id % 4 = 0 OR asset_id % 16 = 6
                     THEN (asset_id + 3 * x) % 256
                     WHEN asset_id % 16 = 10
                     THEN ({PAL3_BM} * (pidx % 16) + 2 * asset_id) % 256
                     WHEN asset_id % 8 = 2
                     THEN ({PAL3_BM} * pidx + 2 * asset_id) % 256
                     WHEN asset_id % 16 = 14
                     THEN ({RGB16_B[0]} * x + {RGB16_B[1]} * y
                           + {RGB16_B[2]} * asset_id) % 65536
                     END) AS BIGINT) AS sum_b,
                CAST(SUM(CASE WHEN asset_id % 4 = 0 OR asset_id % 32 = 23
                     THEN (x + y + asset_id) % 256 END) AS BIGINT) AS sum_a,
                CAST(SUM(CASE WHEN asset_id % 2 = 1
                     THEN first_ch END) AS BIGINT) AS sum_gray,
                CAST(SUM((y * w + x + 1) * first_ch) AS BIGINT) AS wsum
         FROM ch GROUP BY asset_id, w, h)
SELECT asset_id, w AS width, h AS height,
       CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b, sum_a, sum_gray, wsum
FROM sums
"""


# ---------------------------------------------------------------------------
# Rolling-window anomaly detection
# ---------------------------------------------------------------------------

#: trailing window length (hour buckets), z-threshold, and the
#: minimum history before a flag can fire
ANOM_WIN = 24
ANOM_K = 3
ANOM_MIN_N = 12


def events_anomaly_window(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type hourly count series with a trailing-window
    anomaly flag: bucket counts, the previous ANOM_WIN buckets'
    (n, Σ, Σ²), and the integer z²-test
    (n·x − s)² > K²·(n·ss − s²)  [⇔ z² > K², no division/sqrt] —
    degenerating to "any deviation" when the window variance is 0,
    and suppressed entirely until ANOM_MIN_N history buckets exist.
    The frame is ROW-based over the observed bucket series (both
    engines see identical rows, so frames align; an empty hour is
    absent on both sides — documented).

    Plan: one groupBy(event_type, hour) + one window pass partitioned
    by event_type — at 100 TB the bucketed series is already tiny
    (types × hours), so the window input is aggregate-sized, never
    event-sized."""
    e = t(spark, sf, "events")
    buckets = (
        spread(e)
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-ANOM_WIN, -1)
    )
    stats = buckets.select(
        "event_type",
        "bucket",
        "cnt",
        F.coalesce(F.count("cnt").over(w), F.lit(0)).cast("bigint").alias("win_n"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("win_sum"),
        F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w), F.lit(0))
        .cast("bigint")
        .alias("win_sumsq"),
    )
    dev = F.col("win_n") * F.col("cnt") - F.col("win_sum")
    lhs = dev * dev
    rhs = F.lit(ANOM_K * ANOM_K) * (
        F.col("win_n") * F.col("win_sumsq") - F.col("win_sum") * F.col("win_sum")
    )
    return stats.select(
        "event_type",
        "bucket",
        "cnt",
        "win_n",
        "win_sum",
        "win_sumsq",
        (
            (F.col("win_n") >= ANOM_MIN_N)
            & (lhs.cast("bigint") > rhs.cast("bigint"))
        )
        .cast("int")
        .alias("is_anomaly"),
    )


EVENTS_ANOMALY_SQL = f"""
WITH buckets AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, bucket
),
stats AS (
  SELECT event_type, bucket, cnt,
         CAST(COALESCE(count(cnt) OVER w, 0) AS BIGINT) AS win_n,
         CAST(COALESCE(SUM(cnt) OVER w, 0) AS BIGINT) AS win_sum,
         CAST(COALESCE(SUM(cnt * cnt) OVER w, 0) AS BIGINT) AS win_sumsq
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket, cnt, win_n, win_sum, win_sumsq,
       CAST(win_n >= {ANOM_MIN_N}
            AND (win_n * cnt - win_sum) * (win_n * cnt - win_sum)
                > {ANOM_K * ANOM_K} * (win_n * win_sumsq - win_sum * win_sum)
            AS INT) AS is_anomaly
FROM stats
"""


# ---------------------------------------------------------------------------
# Bigram-LM surprise scoring
# ---------------------------------------------------------------------------

#: integer probability scale (surprise = (c1 * SCALE) div c12)
LM_SCALE = 1_000_000


def text_lm_surprise(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-bigram-LM quality score per document: for each adjacent
    token pair, surprise = (count(w1) · 10^6) div count(w1 w2) — the
    exact-integer inverse of the conditional probability P(w2|w1) the
    corpus LM assigns — and the per-doc mean of those surprises. High
    mean surprise = the document's transitions are unusual for the
    corpus (the KenLM-perplexity-filter shape; divergence from true
    perplexity documented in the module docstring).

    Plan: one (doc, position) bigram explode, one vocabulary-sized
    bigram-count aggregate and one unigram-count aggregate, joined
    back on the bigram/unigram key (equi-joins on token strings —
    shuffle volume ∝ corpus tokens, state ∝ vocabulary), then a
    per-doc partial agg. No UDFs, no driver state."""
    d = t(spark, sf, "documents")
    toks = tokenize_ws(F.lower(F.col("text")))
    base = spread(d).select("doc_id", toks.alias("toks"))
    pairs = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("toks"), i).alias("w1"),
                        F.element_at(F.col("toks"), i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    pairs = pairs.localCheckpoint(eager=False)
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .select("doc_id", F.expr(f"(c1 * {LM_SCALE}) div c12").alias("surprise"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("surprise").cast("bigint").alias("surprise_sum"),
        F.expr("sum(surprise) div count(1)").cast("bigint").alias("surprise_avg"),
    )


TEXT_LM_SURPRISE_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d)
),
uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY w1),
bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY w1, w2),
scored AS (
  SELECT p.doc_id, (u.c1 * {LM_SCALE}) // b.c12 AS surprise
  FROM pairs p JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
  JOIN uni u ON p.w1 = u.w1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(SUM(surprise) AS BIGINT) AS surprise_sum,
       CAST(SUM(surprise) // count(*) AS BIGINT) AS surprise_avg
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Real GIF (LZW) decode
# ---------------------------------------------------------------------------

from queryengine_spark.multimodal.gif import (  # noqa: E402
    ANIM_FM,
    GIF_H_MOD,
    GIF_IDX_XM,
    GIF_IDX_YM,
    GIF_W_MOD,
    LCT_BM,
    LCT_GM,
    LCT_RM,
    PAL_BM,
    PAL_GM,
    PAL_RM,
    gif_pixel_stats,
    synthesize_gif_mixed,
)


def multimodal_gif_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize → LZW-decode → aggregate, entirely worker-side (the
    GIF twin of multimodal_png_decode). Mixed profiles since r5:
    asset_id % 4 == 0 is GIF87a with a global color table, % 8 == 2
    is GIF89a with a LOCAL color table that must OVERRIDE a
    deliberately different decoy global table — the oracle applies
    each leg's own palette formula, so reading the wrong table
    breaks the hash — % 8 == 6 is ANIMATED GIF89a (r6: 2–4
    full-screen frames, per-frame Graphic Control Extension delays,
    NETSCAPE loop extension; n_px/channel sums span ALL frames and
    total_delay_cs sums the GCE delays, so the hash certifies the
    multi-image walk + GCE parsing), and odd ids are INTERLACED
    GIF87a (4-pass storage order; pixel sums are
    permutation-invariant so the deinterlace itself is pinned by the
    hand-order tests in tests/test_multimodal_gif.py, while the
    oracle still certifies the LZW/palette path on those legs). See
    multimodal/gif.py for the correctness story (hand-pinned LZW bit
    streams + formula oracle)."""
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return gif_pixel_stats(synthesize_gif_mixed(spread(ids)))


MULTIMODAL_GIF_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
dims AS (SELECT asset_id,
                CAST(6 + asset_id % {GIF_W_MOD} AS INT) AS w,
                CAST(5 + asset_id % {GIF_H_MOD} AS INT) AS h,
                -- r6: the %8=6 animated leg carries 2..4 frames;
                -- every other leg is a single still image
                CAST(CASE WHEN asset_id % 8 = 6 THEN 2 + asset_id % 3
                          ELSE 1 END AS BIGINT) AS nf
         FROM ids),
px AS (SELECT asset_id, w, h, nf,
              (CAST(xx.i AS BIGINT) * {GIF_IDX_XM}
               + CAST(yy.i AS BIGINT) * {GIF_IDX_YM} + asset_id
               + {ANIM_FM} * CAST(ff.f AS BIGINT)) % 256 AS idx
       FROM dims, unnest(range(0, w)) xx(i), unnest(range(0, h)) yy(i),
            unnest(range(0, nf)) ff(f)),
sums AS (SELECT asset_id, w, h, nf,
                CAST(SUM(CASE WHEN asset_id % 8 = 2
                     THEN ({LCT_RM} * idx + asset_id) % 256
                     ELSE ({PAL_RM} * idx) % 256 END) AS BIGINT) AS sum_r,
                CAST(SUM(CASE WHEN asset_id % 8 = 2
                     THEN ({LCT_GM} * idx + 3) % 256
                     ELSE ({PAL_GM} * idx + 1) % 256 END) AS BIGINT) AS sum_g,
                CAST(SUM(CASE WHEN asset_id % 8 = 2
                     THEN ({LCT_BM} * idx + 2 * asset_id) % 256
                     ELSE ({PAL_BM} * idx + 2) % 256 END) AS BIGINT) AS sum_b
         FROM px GROUP BY asset_id, w, h, nf),
del AS (SELECT asset_id,
               CAST(SUM(4 + (asset_id + CAST(ff.f AS BIGINT)) % 10) AS BIGINT)
                 AS tdel
        FROM dims, unnest(range(0, nf)) ff(f)
        WHERE asset_id % 8 = 6 GROUP BY asset_id)
SELECT s.asset_id, s.w AS width, s.h AS height,
       CAST(s.w * s.h * s.nf AS BIGINT) AS n_px, s.sum_r, s.sum_g, s.sum_b,
       s.nf AS n_frames,
       CAST(COALESCE(d.tdel, 0) AS BIGINT) AS total_delay_cs
FROM sums s LEFT JOIN del d ON s.asset_id = d.asset_id
"""


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance over the near-dup graph
# ---------------------------------------------------------------------------

#: seed predicate (every 25th doc), hop bound
BFS_SEED_MOD = 25
BFS_MAX_HOPS = 4


def graph_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Hop distance from the nearest seed document across the MinHash
    near-dup candidate graph (same edge set as dedup_minhash_lsh /
    graph_pagerank): "how many near-dup links away is this doc from a
    flagged one" — the reachability primitive contamination triage
    uses. Fixed BFS_MAX_HOPS rounds of id-only frontier relaxation
    (operators/graph.py::bfs_hops); all-integer; the oracle unrolls
    the identical recurrence."""
    from queryengine_spark.operators.dedup import minhash_lsh_candidate_pairs
    from queryengine_spark.operators.graph import bfs_hops
    from queryengine_spark.queries.dedup import (
        BAND_SIZE,
        MINHASH_MAX_BUCKET,
        N_HASHES,
    )

    docs = t(spark, sf, "documents")
    pairs = minhash_lsh_candidate_pairs(
        docs, "doc_id", "text",
        n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
        max_bucket=MINHASH_MAX_BUCKET,
    )
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0).select(
        F.col("doc_id").alias("id")
    )
    return bfs_hops(seeds, pairs, max_hops=BFS_MAX_HOPS).select(
        F.col("id").alias("doc_id"), "dist"
    )


def _bfs_sql() -> str:
    from queryengine_spark.queries.dedup import DEDUP_MINHASH_SQL

    body = DEDUP_MINHASH_SQL.strip()
    assert body.startswith("WITH ")
    ctes, final_select = body.rsplit("SELECT DISTINCT", 1)
    prev = "d0"
    rounds = []
    for i in range(1, BFS_MAX_HOPS + 1):
        rounds.append(
            f"""d{i} AS (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM (
  SELECT id, dist FROM {prev}
  UNION ALL
  SELECT t.dst AS id, r.dist + 1 AS dist
  FROM sym t JOIN {prev} r ON t.src = r.id
) GROUP BY id)"""
        )
        prev = f"d{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
{ctes.rstrip().rstrip(",")},
pairs AS (SELECT DISTINCT {final_select.strip()}),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
d0 AS (SELECT doc_id AS id, CAST(0 AS BIGINT) AS dist FROM documents
       WHERE doc_id % {BFS_SEED_MOD} = 0),
{rounds_sql}
SELECT id AS doc_id, dist FROM {prev}
"""


# ---------------------------------------------------------------------------
# Real baseline-JPEG entropy decode (DC-only exact profile)
# ---------------------------------------------------------------------------

from queryengine_spark.multimodal.jpeg import (  # noqa: E402
    AC_MOD,
    AC_MULT,
    AC_POSITIONS,
    AC_SHIFT,
    DC_MOD,
    DC_MULT,
    DC_OFF,
    IDCT_B,
    IDCT_BIAS,
    IDCT_SHIFT,
    JPEG_BH_MOD,
    JPEG_BW_MOD,
    LL16_XM,
    LL16_XYM,
    LL16_YM,
    LL8_XM,
    LL8_YM,
    QUANT_AC,
    QUANT_AC16,
    QUANT_DC,
    RGB_CB_B,
    RGB_CB_G,
    RGB_CR_G,
    RGB_CR_R,
    YCC_C_MULT,
    ZIGZAG_NAT,
    jpeg_full_stats,
    synthesize_jpeg_mixed,
)


#: chroma block-DC value template at native chroma pixel ({i}, {j})
#: for component k (1=Cb, 2=Cr) — the r9 centered-upsample taps
def _cdc_tpl(k: int) -> str:
    return (
        f"((asset_id + 13 * ({{i}} // 8) + 31 * ({{j}} // 8)"
        f" + {k} * {YCC_C_MULT}) * {DC_MULT}) % {DC_MOD}"
        f" + ({DC_OFF}) + 128"
    )


_CDC1 = _cdc_tpl(1)
_CDC2 = _cdc_tpl(2)


def _fdiv1000(num: str) -> str:
    """FLOOR division by 1000 in DuckDB (// truncates toward zero;
    RGB numerators go negative) — the repo's floor-mod idiom."""
    return f"((({num}) - ((({num}) % 1000) + 1000) % 1000) // 1000)"

#: the fixed-point IDCT basis as SQL VALUES rows (u, tt, bb) — single
#: source of truth is the IDCT_B literal in multimodal/jpeg.py, so a
#: decoder/oracle constant skew is impossible by construction
_IDCT_B_ROWS = ", ".join(
    f"({u}, {t}, {IDCT_B[u][t]})" for u in range(8) for t in range(8)
)
#: planted zigzag positions → (horizontal u, vertical v) natural
#: frequencies, derived from the SAME zigzag table the decoder uses
_ZZ_UV_ROWS = ", ".join(
    f"({p}, {ZIGZAG_NAT[p] % 8}, {ZIGZAG_NAT[p] // 8})" for p in AC_POSITIONS
)


def multimodal_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize → entropy-decode → aggregate, entirely worker-side:
    real JFIF marker walk + canonical-Huffman scan decoding (tables
    read from the DHT bytes). asset_id % 8 == 0 carries grayscale
    DC-only scans (exact pixel stats); % 8 == 2 carries YCbCr 4:4:4
    DC-only scans (r5 — three interleaved components with separate
    predictors, per-component quant/Huffman tables, multi-table DQT/
    DHT segments; Y/Cb/Cr plane sums all exact); % 16 == 4 / 6
    carries YCbCr 4:2:0 DC-only scans plain / WITH a DRI restart
    interval (r6 — 2×2 luma sampling, six-block interleaved MCUs,
    chroma stats exact in NATIVE subsampled resolution; real
    RST0..RST7 markers every 1–3 MCUs, byte realignment + predictor
    resets, sequence numbers validated); % 16 == 12 / 14 carries
    YCbCr 4:1:1 plain / with DRI (r6 — 4×1 luma sampling exercising
    sampling factor FOUR); odd asset_ids carry grayscale AC-BEARING
    scans (r5) — ZRL runs, EOB, implicit block ends — decoded to
    exact integer pre-IDCT coefficient statistics AND (r7) exact
    PIXEL statistics through the pinned fixed-point integer IDCT
    (multimodal/jpeg.py::idct8_fixed — the oracle replicates the
    identical BIGINT arithmetic via the inlined IDCT_B basis, so the
    former float-IDCT pixel refusal is gone); of
    the odd legs, % 32 == 19 / 21 are LOSSLESS (SOF3, T.81 Annex H —
    r9: predictive Huffman coding, no DCT; predictor 1 + asset % 7,
    modulo-2^16 differences with the SSSS=16 escape, at 8-bit and
    16-bit precision; exact sample stats, with the coefficient
    columns honestly NULL because no DCT domain exists),
    % 16 == 9 ships its quant table as a 16-BIT Pq=1
    DQT whose AC quantizer (300) cannot fit an 8-bit table (r6) and
    clamps pixels at both rails,
    % 16 == 1 is PROGRESSIVE (SOF2: spectral selection + successive
    approximation + EOBn runs, decoding bit-identically to the
    sequential leg — r6; pixels included since r7), and % 16 == 11 is
    3-COMPONENT 4:2:0
    PROGRESSIVE (interleaved DC scans, per-component AC band scans,
    chroma pure-EOB-run scans; coefficient stats summed across
    components — r6; since r7 it reports REAL luma pixel stats
    through the fixed-point IDCT plus chroma sums at native per-plane
    resolution). r8: every 3-component leg additionally reports
    FULL-RESOLUTION RGB channel sums — pinned integer nearest-
    neighbor chroma upsample (index-floor map; documented divergence
    from JFIF's centered convention) + the ×1000 fixed-point Rec.601
    inverse with floor division and [0,255] clamps, replayed
    arithmetic-for-arithmetic by the oracle's rgbdcpx/rgbpx/rgbsums
    CTEs. Nothing about a JPEG pixel remains refused except
    arithmetic/hierarchical coding. See multimodal/jpeg.py
    for the real-vs-restricted contract and the hand-assembled
    bitstreams that pin every decode path."""
    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return jpeg_full_stats(synthesize_jpeg_mixed(spread(ids)))


MULTIMODAL_JPEG_DECODE_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
dims AS (SELECT asset_id,
                CAST(1 + asset_id % {JPEG_BW_MOD} AS INT) AS bw,
                CAST(1 + asset_id % {JPEG_BH_MOD} AS INT) AS bh
         FROM ids),
blk AS (SELECT asset_id, bw, bh,
               ((asset_id + 13 * CAST(xx.i AS BIGINT)
                 + 31 * CAST(yy.i AS BIGINT)) * {DC_MULT}) % {DC_MOD}
                 + ({DC_OFF}) AS dc
        FROM dims, unnest(range(0, bw)) xx(i), unnest(range(0, bh)) yy(i)),
dcsums AS (SELECT asset_id, bw, bh,
                CAST(SUM(64 * (dc + 128)) AS BIGINT) AS sum_lum,
                CAST(MIN(dc) + 128 AS INT) AS min_lum,
                CAST(MAX(dc) + 128 AS INT) AS max_lum,
                CAST(SUM(dc * {QUANT_DC}) AS BIGINT) AS sum_dc_dq
         FROM blk GROUP BY asset_id, bw, bh),
acv AS (SELECT d.asset_id,
               CASE WHEN v0 >= 0 THEN v0 + 1 ELSE v0 END AS v,
               -- r6: the %16=9 leg ships a 16-bit Pq=1 DQT whose AC
               -- quantizer exceeds one byte
               CASE WHEN d.asset_id % 16 = 9 THEN {QUANT_AC16}
                    ELSE {QUANT_AC} END AS q
        FROM dims d,
             -- r6: the %16=11 3-component progressive leg plants its
             -- AC formula on the LUMA grid (2bw×2bh); all other odd
             -- legs are grayscale bw×bh
             unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                                  THEN 2 * d.bw ELSE d.bw END)) xx(i),
             unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                                  THEN 2 * d.bh ELSE d.bh END)) yy(i),
             unnest([{", ".join(str(p) for p in AC_POSITIONS)}]) pp(p),
             LATERAL (SELECT (d.asset_id + 7 * CAST(xx.i AS BIGINT)
                              + 11 * CAST(yy.i AS BIGINT)
                              + 53 * CAST(pp.p AS BIGINT)) * {AC_MULT}
                             % {AC_MOD} - {AC_SHIFT} AS v0) qq
        -- r9: %32 in (19, 21) are LOSSLESS — no DCT domain at all
        WHERE d.asset_id % 2 = 1 AND d.asset_id % 32 NOT IN (19, 21)),
acsums AS (SELECT asset_id,
                  CAST(SUM(q * v) AS BIGINT) AS sum_ac_dq,
                  CAST(SUM(q * abs(v)) AS BIGINT) AS sum_abs_ac_dq,
                  CAST(COUNT(*) AS BIGINT) AS n_nonzero_ac
           FROM acv GROUP BY asset_id),
-- r7: exact pixel stats for EVERY single-component AC-bearing leg
-- (sequential, 16-bit DQT, progressive — everything but %16=11) via
-- the pinned fixed-point integer IDCT: acc = Σ F·B[u][x]·B[v][y]
-- over the planted spectrum, pixel = clip(128 + ((acc+2^29) >> 30)).
-- idctb inlines the decoder's IDCT_B literal; zzuv maps each planted
-- zigzag position to its (horizontal u, vertical v) frequencies
idctb AS (SELECT * FROM (VALUES {_IDCT_B_ROWS}) AS b(u, tt, bb)),
zzuv AS (SELECT * FROM (VALUES {_ZZ_UV_ROWS}) AS z(p, uu, vv)),
-- the %16=11 3-component progressive leg plants the SAME dc/ac
-- formulas on its LUMA grid (2bw×2bh — block_dc3 at c=0 IS block_dc),
-- so since r7 its luma pixels ride the same IDCT replay
pxterm AS (
  SELECT d.asset_id, xx.i AS bx, yy.i AS by, 0 AS uu, 0 AS vv,
         CAST({QUANT_DC} * (((d.asset_id + 13 * CAST(xx.i AS BIGINT)
                + 31 * CAST(yy.i AS BIGINT)) * {DC_MULT}) % {DC_MOD}
                + ({DC_OFF})) AS BIGINT) AS f
  FROM dims d,
       unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                            THEN 2 * d.bw ELSE d.bw END)) xx(i),
       unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                            THEN 2 * d.bh ELSE d.bh END)) yy(i)
  WHERE d.asset_id % 2 = 1 AND d.asset_id % 32 NOT IN (19, 21)
  UNION ALL
  SELECT d.asset_id, xx.i AS bx, yy.i AS by, zz.uu, zz.vv,
         CAST((CASE WHEN d.asset_id % 16 = 9 THEN {QUANT_AC16}
                    ELSE {QUANT_AC} END)
              * (CASE WHEN v0 >= 0 THEN v0 + 1 ELSE v0 END) AS BIGINT) AS f
  FROM dims d,
       unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                            THEN 2 * d.bw ELSE d.bw END)) xx(i),
       unnest(range(0, CASE WHEN d.asset_id % 16 IN (11, 13, 15)
                            THEN 2 * d.bh ELSE d.bh END)) yy(i),
       zzuv zz,
       LATERAL (SELECT (d.asset_id + 7 * CAST(xx.i AS BIGINT)
                        + 11 * CAST(yy.i AS BIGINT)
                        + 53 * CAST(zz.p AS BIGINT)) * {AC_MULT}
                       % {AC_MOD} - {AC_SHIFT} AS v0) qq
  WHERE d.asset_id % 2 = 1 AND d.asset_id % 32 NOT IN (19, 21)),
-- r9: LOSSLESS (SOF3) legs — exact sample stats straight from the
-- pixel formulas (8-bit at %32=19, 16-bit at %32=21); no blocks,
-- coefficients, or chroma exist for these streams
llpix AS (
  SELECT d.asset_id,
         CAST(SUM(pv) AS BIGINT) AS sum_lum,
         CAST(MIN(pv) AS INT) AS min_lum,
         CAST(MAX(pv) AS INT) AS max_lum
  FROM dims d,
       unnest(range(0, 8 * d.bw)) xx(i),
       unnest(range(0, 8 * d.bh)) yy(i),
       LATERAL (SELECT CASE WHEN d.asset_id % 32 = 19
                  THEN (CAST(xx.i AS BIGINT) * yy.i + {LL8_XM} * xx.i
                        + {LL8_YM} * yy.i + d.asset_id) % 256
                  ELSE ({LL16_XYM} * CAST(xx.i AS BIGINT) * yy.i
                        + {LL16_XM} * xx.i + {LL16_YM} * yy.i
                        + d.asset_id) % 65536 END AS pv) q
  WHERE d.asset_id % 32 IN (19, 21)
  GROUP BY d.asset_id),
pxv AS (
  SELECT t.asset_id, t.bx, t.by,
         CAST(t.bx * 8 + bu.tt AS BIGINT) AS px,
         CAST(t.by * 8 + bv.tt AS BIGINT) AS py,
         GREATEST(0, LEAST(255, 128 + CAST(floor(
             (SUM(t.f * bu.bb * bv.bb) + {IDCT_BIAS})
             / {(1 << (2 * IDCT_SHIFT))}.0) AS BIGINT))) AS lum
  FROM pxterm t
  JOIN idctb bu ON bu.u = t.uu
  JOIN idctb bv ON bv.u = t.vv
  GROUP BY t.asset_id, t.bx, t.by, bu.tt, bv.tt),
acpix AS (SELECT asset_id, CAST(SUM(lum) AS BIGINT) AS sum_lum,
                 CAST(MIN(lum) AS INT) AS min_lum,
                 CAST(MAX(lum) AS INT) AS max_lum
          FROM pxv GROUP BY asset_id),
blk3 AS (SELECT d.asset_id, d.bw, d.bh, CAST(cc.c AS BIGINT) AS comp,
               ((d.asset_id + 13 * CAST(xx.i AS BIGINT)
                 + 31 * CAST(yy.i AS BIGINT)
                 + {YCC_C_MULT} * CAST(cc.c AS BIGINT)) * {DC_MULT}) % {DC_MOD}
                 + ({DC_OFF}) AS dc
        FROM dims d, unnest(range(0, d.bw)) xx(i),
             unnest(range(0, d.bh)) yy(i), unnest([0, 1, 2]) cc(c)
        WHERE d.asset_id % 16 = 2),
ycc AS (SELECT asset_id,
               CAST(SUM(CASE WHEN comp = 1 THEN 64 * (dc + 128) END) AS BIGINT) AS sum_cb,
               CAST(SUM(CASE WHEN comp = 2 THEN 64 * (dc + 128) END) AS BIGINT) AS sum_cr,
               CAST(SUM(dc * {QUANT_DC}) AS BIGINT) AS dc3_dq
        FROM blk3 GROUP BY asset_id),
-- r6: subsampled legs — %16 ∈ (4, 6) = 4:2:0 (luma 2×2) plain/DRI,
-- %16 ∈ (12, 14) = 4:1:1 (luma 4×1, sampling factor 4) plain/DRI.
-- Same pixel formula everywhere (the restart machinery and MCU
-- geometry are what the DECODER must get right): dims' bw×bh are MCU
-- counts, the luma grid is (hy·bw)×(vy·bh) blocks, each chroma plane
-- native bw×bh blocks, same per-component dc formula as blk3
blk420 AS (SELECT d.asset_id, d.bw, d.bh, CAST(cc.c AS BIGINT) AS comp,
               ((d.asset_id + 13 * CAST(xx.i AS BIGINT)
                 + 31 * CAST(yy.i AS BIGINT)
                 + {YCC_C_MULT} * CAST(cc.c AS BIGINT)) * {DC_MULT}) % {DC_MOD}
                 + ({DC_OFF}) AS dc
        FROM dims d, unnest([0, 1, 2]) cc(c),
             unnest(range(0, CASE WHEN cc.c > 0 THEN d.bw
                                  WHEN d.asset_id % 16 IN (4, 6, 10, 11, 13, 15) THEN 2 * d.bw
                                  ELSE 4 * d.bw END)) xx(i),
             unnest(range(0, CASE WHEN cc.c > 0 THEN d.bh
                                  WHEN d.asset_id % 16 IN (4, 6, 11, 13, 15) THEN 2 * d.bh
                                  ELSE d.bh END)) yy(i)
        WHERE d.asset_id % 8 IN (4, 6) OR d.asset_id % 16 IN (10, 11, 13, 15)),
y420 AS (SELECT asset_id,
               CAST(SUM(CASE WHEN comp = 0 THEN 64 * (dc + 128) END) AS BIGINT) AS sum_lum,
               CAST(MIN(CASE WHEN comp = 0 THEN dc END) + 128 AS INT) AS min_lum,
               CAST(MAX(CASE WHEN comp = 0 THEN dc END) + 128 AS INT) AS max_lum,
               CAST(SUM(CASE WHEN comp = 1 THEN 64 * (dc + 128) END) AS BIGINT) AS sum_cb,
               CAST(SUM(CASE WHEN comp = 2 THEN 64 * (dc + 128) END) AS BIGINT) AS sum_cr,
               CAST(SUM(dc * {QUANT_DC}) AS BIGINT) AS dc420_dq
        FROM blk420 GROUP BY asset_id),
-- r8: full-resolution RGB sums for every 3-component leg — integer
-- NEAREST-NEIGHBOR chroma upsample (full-res pixel (x,y) reads
-- chroma sample (x·hc div hmax, y·vc div vmax); deliberate,
-- documented divergence from JFIF's centered convention — see
-- multimodal/jpeg.py::upsample_nn) + the pinned ×1000 fixed-point
-- Rec.601 inverse with floor division and [0,255] clamps. For the
-- DC-only legs every full-res 8×8 luma block sees exactly ONE
-- chroma block (bx div hy, by div vy), so RGB aggregates per luma
-- block ×64; the AC legs (%16 ∈ 11,13,15 — all 4:2:0) ride the
-- per-pixel IDCT replay (pxv) joined to their chroma block DCs
rgbdcpx AS (
  SELECT d.asset_id,
         ((d.asset_id + 13 * CAST(xx.i AS BIGINT)
           + 31 * CAST(yy.i AS BIGINT)) * {DC_MULT}) % {DC_MOD}
           + ({DC_OFF}) + 128 AS yv,
         ((d.asset_id + 13 * (CAST(xx.i AS BIGINT) // s.hy)
           + 31 * (CAST(yy.i AS BIGINT) // s.vy)
           + {YCC_C_MULT}) * {DC_MULT}) % {DC_MOD}
           + ({DC_OFF}) + 128 AS cbv,
         ((d.asset_id + 13 * (CAST(xx.i AS BIGINT) // s.hy)
           + 31 * (CAST(yy.i AS BIGINT) // s.vy)
           + 2 * {YCC_C_MULT}) * {DC_MULT}) % {DC_MOD}
           + ({DC_OFF}) + 128 AS crv
  FROM dims d,
       LATERAL (SELECT CASE WHEN d.asset_id % 16 = 10 THEN 2
                            WHEN d.asset_id % 8 = 2 THEN 1
                            WHEN d.asset_id % 16 IN (12, 14) THEN 4
                            ELSE 2 END AS hy,
                       CASE WHEN d.asset_id % 16 = 10 THEN 1
                            WHEN d.asset_id % 8 = 2 THEN 1
                            WHEN d.asset_id % 16 IN (12, 14) THEN 1
                            ELSE 2 END AS vy) s,
       unnest(range(0, s.hy * d.bw)) xx(i),
       unnest(range(0, s.vy * d.bh)) yy(i)
  WHERE d.asset_id % 8 IN (2, 4, 6)),
rgbpx AS (
  SELECT asset_id, CAST(64 AS BIGINT) AS wt, yv, cbv, crv FROM rgbdcpx
  UNION ALL
  SELECT v.asset_id, CAST(1 AS BIGINT) AS wt, v.lum AS yv,
         ((v.asset_id + 13 * (v.bx // 2) + 31 * (v.by // 2)
           + {YCC_C_MULT}) * {DC_MULT}) % {DC_MOD}
           + ({DC_OFF}) + 128 AS cbv,
         ((v.asset_id + 13 * (v.bx // 2) + 31 * (v.by // 2)
           + 2 * {YCC_C_MULT}) * {DC_MULT}) % {DC_MOD}
           + ({DC_OFF}) + 128 AS crv
  FROM pxv v WHERE v.asset_id % 16 IN (11, 13, 15)),
rgbsums AS (
  SELECT asset_id,
         CAST(SUM(wt * GREATEST(0, LEAST(255, yv
              + {_fdiv1000(f"{RGB_CR_R} * (crv - 128) + 500")}))) AS BIGINT) AS sum_r,
         CAST(SUM(wt * GREATEST(0, LEAST(255, yv
              - {_fdiv1000(f"{RGB_CB_G} * (cbv - 128) + {RGB_CR_G} * (crv - 128) + 500")}))) AS BIGINT) AS sum_g,
         CAST(SUM(wt * GREATEST(0, LEAST(255, yv
              + {_fdiv1000(f"{RGB_CB_B} * (cbv - 128) + 500")}))) AS BIGINT) AS sum_b
  FROM rgbpx GROUP BY asset_id),
-- r9 (verdict item 5): the CENTERED-upsample twin — the libjpeg
-- triangle filter (9/3/3/1 taps, alternating bias 8/7, >> 4; edge
-- clamp duplicates the boundary sample) replayed per FULL-RES pixel
-- for the 4:2:0 legs; 4:4:4 / 4:1:1 keep the NN values by spec (the
-- filter exists only for factor-2 axes — multimodal/jpeg.py::
-- upsample_centered). Native chroma planes are 8bw × 8bh pixels.
ctap AS MATERIALIZED (
  SELECT d.asset_id, CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y,
         CAST(xx.i AS BIGINT) // 2 AS xi,
         CASE WHEN xx.i % 2 = 0 THEN GREATEST(CAST(xx.i AS BIGINT) // 2 - 1, 0)
              ELSE LEAST(CAST(xx.i AS BIGINT) // 2 + 1, 8 * d.bw - 1) END AS xf,
         CAST(yy.i AS BIGINT) // 2 AS yi,
         CASE WHEN yy.i % 2 = 0 THEN GREATEST(CAST(yy.i AS BIGINT) // 2 - 1, 0)
              ELSE LEAST(CAST(yy.i AS BIGINT) // 2 + 1, 8 * d.bh - 1) END AS yf,
         CASE WHEN xx.i % 2 = 0 THEN 8 ELSE 7 END AS bias
  FROM dims d,
       unnest(range(0, 16 * d.bw)) xx(i),
       unnest(range(0, 16 * d.bh)) yy(i)
  WHERE d.asset_id % 16 IN (4, 6, 11, 13, 15)),
cc AS MATERIALIZED (
  SELECT asset_id, x, y,
         (9 * ({_CDC1.format(i='xi', j='yi')})
          + 3 * ({_CDC1.format(i='xi', j='yf')})
          + 3 * ({_CDC1.format(i='xf', j='yi')})
          + ({_CDC1.format(i='xf', j='yf')}) + bias) // 16 AS cbv,
         (9 * ({_CDC2.format(i='xi', j='yi')})
          + 3 * ({_CDC2.format(i='xi', j='yf')})
          + 3 * ({_CDC2.format(i='xf', j='yi')})
          + ({_CDC2.format(i='xf', j='yf')}) + bias) // 16 AS crv
  FROM ctap),
-- r9: the 4:2:2 leg's centered chroma is the SINGLE-AXIS (h2v1)
-- triangle: (3·near + far + bias) >> 2, bias 1/2 alternating on x,
-- vertical identity (native chroma rows == full rows)
cc22 AS MATERIALIZED (
  SELECT d.asset_id, CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y,
         (3 * ({_CDC1.format(i='xi', j='CAST(yy.i AS BIGINT)')})
          + ({_CDC1.format(i='xf', j='CAST(yy.i AS BIGINT)')})
          + bias) // 4 AS cbv,
         (3 * ({_CDC2.format(i='xi', j='CAST(yy.i AS BIGINT)')})
          + ({_CDC2.format(i='xf', j='CAST(yy.i AS BIGINT)')})
          + bias) // 4 AS crv
  FROM dims d,
       unnest(range(0, 16 * d.bw)) xx(i),
       unnest(range(0, 8 * d.bh)) yy(i),
       LATERAL (SELECT CAST(xx.i AS BIGINT) // 2 AS xi,
                       CASE WHEN xx.i % 2 = 0
                            THEN GREATEST(CAST(xx.i AS BIGINT) // 2 - 1, 0)
                            ELSE LEAST(CAST(xx.i AS BIGINT) // 2 + 1,
                                       8 * d.bw - 1) END AS xf,
                       CASE WHEN xx.i % 2 = 0 THEN 1 ELSE 2 END AS bias) t
  WHERE d.asset_id % 16 = 10),
crgbpx AS (
  -- 4:2:0 DC legs: per-pixel luma from the block-DC formula
  SELECT c.asset_id,
         ((c.asset_id + 13 * (c.x // 8) + 31 * (c.y // 8))
          * {DC_MULT}) % {DC_MOD} + ({DC_OFF}) + 128 AS yv,
         c.cbv, c.crv
  FROM cc c WHERE c.asset_id % 16 IN (4, 6)
  UNION ALL
  -- 4:2:2 DC leg (r9): same per-pixel luma formula, h2v1 chroma
  SELECT c.asset_id,
         ((c.asset_id + 13 * (c.x // 8) + 31 * (c.y // 8))
          * {DC_MULT}) % {DC_MOD} + ({DC_OFF}) + 128 AS yv,
         c.cbv, c.crv
  FROM cc22 c
  UNION ALL
  -- 4:2:0 AC legs: per-pixel luma from the IDCT replay
  SELECT v.asset_id, v.lum AS yv, c.cbv, c.crv
  FROM pxv v JOIN cc c
    ON c.asset_id = v.asset_id AND c.x = v.px AND c.y = v.py
  WHERE v.asset_id % 16 IN (11, 13, 15)),
crgbsums AS (
  SELECT asset_id,
         CAST(SUM(GREATEST(0, LEAST(255, yv
              + {_fdiv1000(f"{RGB_CR_R} * (crv - 128) + 500")}))) AS BIGINT) AS sum_r_c,
         CAST(SUM(GREATEST(0, LEAST(255, yv
              - {_fdiv1000(f"{RGB_CB_G} * (cbv - 128) + {RGB_CR_G} * (crv - 128) + 500")}))) AS BIGINT) AS sum_g_c,
         CAST(SUM(GREATEST(0, LEAST(255, yv
              + {_fdiv1000(f"{RGB_CB_B} * (cbv - 128) + 500")}))) AS BIGINT) AS sum_b_c
  FROM crgbpx GROUP BY asset_id)
SELECT s.asset_id,
       CAST(s.bw * CASE WHEN s.asset_id % 16 IN (4, 6, 10, 11, 13, 15) THEN 16
                        WHEN s.asset_id % 16 IN (12, 14) THEN 32
                        ELSE 8 END AS INT) AS width,
       CAST(s.bh * CASE WHEN s.asset_id % 16 IN (4, 6, 11, 13, 15) THEN 16
                        ELSE 8 END AS INT) AS height,
       CASE WHEN s.asset_id % 16 IN (11, 13, 15)
            THEN CAST(s.bw * s.bh * 256 AS BIGINT)
            WHEN s.asset_id % 16 = 10
            THEN CAST(s.bw * s.bh * 128 AS BIGINT)
            WHEN s.asset_id % 8 IN (4, 6)
            THEN CAST(s.bw * s.bh * 256 AS BIGINT)
            ELSE CAST(s.bw * s.bh * 64 AS BIGINT) END AS n_px,
       CASE WHEN s.asset_id % 32 IN (19, 21) THEN ll.sum_lum
            WHEN s.asset_id % 2 = 1 THEN p.sum_lum
            WHEN s.asset_id % 8 IN (4, 6) OR s.asset_id % 16 = 10
            THEN z.sum_lum
            ELSE s.sum_lum END AS sum_lum,
       CASE WHEN s.asset_id % 32 IN (19, 21) THEN ll.min_lum
            WHEN s.asset_id % 2 = 1 THEN p.min_lum
            WHEN s.asset_id % 8 IN (4, 6) OR s.asset_id % 16 = 10
            THEN z.min_lum
            ELSE s.min_lum END AS min_lum,
       CASE WHEN s.asset_id % 32 IN (19, 21) THEN ll.max_lum
            WHEN s.asset_id % 2 = 1 THEN p.max_lum
            WHEN s.asset_id % 8 IN (4, 6) OR s.asset_id % 16 = 10
            THEN z.max_lum
            ELSE s.max_lum END AS max_lum,
       CAST(CASE WHEN s.asset_id % 32 IN (19, 21) THEN NULL
                 WHEN s.asset_id % 16 = 10 THEN 4 * s.bw * s.bh
                 WHEN s.asset_id % 8 = 2 THEN 3 * s.bw * s.bh
                 WHEN s.asset_id % 8 IN (4, 6) THEN 6 * s.bw * s.bh
                 WHEN s.asset_id % 16 IN (11, 13, 15) THEN 6 * s.bw * s.bh
                 ELSE s.bw * s.bh END AS BIGINT) AS n_blocks,
       CAST(CASE WHEN s.asset_id % 32 IN (19, 21) THEN NULL
                 WHEN s.asset_id % 16 = 10 THEN z.dc420_dq
                 WHEN s.asset_id % 8 = 2 THEN y.dc3_dq
                 WHEN s.asset_id % 8 IN (4, 6) THEN z.dc420_dq
                 WHEN s.asset_id % 16 IN (11, 13, 15) THEN z.dc420_dq
                 ELSE s.sum_dc_dq END AS BIGINT) AS sum_dc_dq,
       CAST(CASE WHEN s.asset_id % 32 IN (19, 21) THEN NULL
                 ELSE COALESCE(a.sum_ac_dq, 0) END AS BIGINT) AS sum_ac_dq,
       CAST(CASE WHEN s.asset_id % 32 IN (19, 21) THEN NULL
                 ELSE COALESCE(a.sum_abs_ac_dq, 0) END AS BIGINT)
         AS sum_abs_ac_dq,
       CAST(CASE WHEN s.asset_id % 32 IN (19, 21) THEN NULL
                 ELSE COALESCE(a.n_nonzero_ac, 0) END AS BIGINT)
         AS n_nonzero_ac,
       -- chroma sums: the 3-component legs report each plane at its
       -- NATIVE resolution (the %16=11 progressive leg's chroma is
       -- DC-only, so the y420 formula serves it too — r7); grayscale
       -- legs stay NULL
       CASE WHEN s.asset_id % 2 = 1
                 AND s.asset_id % 16 NOT IN (11, 13, 15) THEN NULL
            ELSE COALESCE(y.sum_cb, z.sum_cb) END AS sum_cb,
       CASE WHEN s.asset_id % 2 = 1
                 AND s.asset_id % 16 NOT IN (11, 13, 15) THEN NULL
            ELSE COALESCE(y.sum_cr, z.sum_cr) END AS sum_cr,
       -- r8: full-res RGB for the 3-component legs (NULL elsewhere)
       rg.sum_r AS sum_r, rg.sum_g AS sum_g, rg.sum_b AS sum_b,
       -- r9: the centered-upsample twin (== NN outside 4:2:0)
       CASE WHEN s.asset_id % 16 IN (4, 6, 10, 11, 13, 15)
            THEN cg.sum_r_c ELSE rg.sum_r END AS sum_r_c,
       CASE WHEN s.asset_id % 16 IN (4, 6, 10, 11, 13, 15)
            THEN cg.sum_g_c ELSE rg.sum_g END AS sum_g_c,
       CASE WHEN s.asset_id % 16 IN (4, 6, 10, 11, 13, 15)
            THEN cg.sum_b_c ELSE rg.sum_b END AS sum_b_c
FROM dcsums s
LEFT JOIN acsums a ON s.asset_id = a.asset_id
LEFT JOIN ycc y ON s.asset_id = y.asset_id
LEFT JOIN y420 z ON s.asset_id = z.asset_id
LEFT JOIN acpix p ON s.asset_id = p.asset_id
LEFT JOIN llpix ll ON s.asset_id = ll.asset_id
LEFT JOIN rgbsums rg ON s.asset_id = rg.asset_id
LEFT JOIN crgbsums cg ON s.asset_id = cg.asset_id
"""


# ---------------------------------------------------------------------------
# PPJoin-style exact set-similarity join
# ---------------------------------------------------------------------------

#: word-set Jaccard threshold for the prefix-filtered join
PPJOIN_THRESHOLD = 0.5


def dedup_jaccard_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-trigram-shingle Jaccard pairs (threshold 0.5) via
    PPJoin prefix filtering (operators/setjoin.py). The oracle is the
    PLAIN all-pairs inverted-index Jaccard with no filter of any kind
    — so the driver hash certifies the prefix-filter optimization
    loses nothing, which is its entire claim. (Shingles, not word
    unigrams: see token_set_relation's docstring for the measured
    degeneracy of unigram sets on this corpus.)"""
    from queryengine_spark.operators.setjoin import jaccard_prefix_join
    from queryengine_spark.queries.base import fround

    out = jaccard_prefix_join(
        t(spark, sf, "documents"), "doc_id", "text",
        threshold=PPJOIN_THRESHOLD,
    )
    return out.select(
        "id_a", "id_b", "shared", "n_a", "n_b",
        fround("jaccard", 6).alias("jaccard"),
    )


PPJOIN_SQL = f"""
WITH d AS (SELECT doc_id AS id, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
tok AS (SELECT DISTINCT id,
        unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS tok
        FROM d),
cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY id),
shared AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS shared
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
           GROUP BY a.id, b.id)
SELECT id_a, id_b, shared, ca.n AS n_a, cb.n AS n_b,
       floor(shared / (ca.n + cb.n - shared) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM shared
JOIN cnt ca ON id_a = ca.id
JOIN cnt cb ON id_b = cb.id
WHERE shared / (ca.n + cb.n - shared) >= {PPJOIN_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Suffix-array exact-substring dedup, detection → ACTION (r6)
# ---------------------------------------------------------------------------

#: deliberately NOT a power of two: certifies the overlapping-span
#: composition (prefix doubling to P=4, then one combine at shift 2)
SA_SCRUB_WINDOW = 6


def curation_sa_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end Lee-et-al exact-substring dedup (r6 — closes the
    detection→action gap): suffix-array span detection
    (operators/suffix.py::repeated_spans_sa, here at the
    non-power-of-2 window {W} via the overlapping power-of-2-span
    composition), maximal-interval merge (gaps-and-islands per
    document), and token removal, emitting per-document
    (n_intervals, n_removed, n_kept, clean_text). The oracle
    recomputes the WHOLE pipeline from the direct n-gram formulation
    in DuckDB — hits, island merge, interval cover, and the kept
    token stream as a string — so the hash certifies detection,
    merge arithmetic, and the scrub action together."""
    from queryengine_spark.operators.suffix import sa_scrub

    return sa_scrub(
        t(spark, sf, "documents"), "doc_id", "text", window=SA_SCRUB_WINDOW
    )


SA_SCRUB_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
toks AS (SELECT doc_id, CAST(t.i AS INT) AS pos, toks[t.i + 1] AS tk
         FROM d, unnest(range(0, len(toks))) t(i)),
grams AS (SELECT doc_id, CAST(t.i AS INT) AS pos,
          array_to_string(list_slice(toks, t.i + 1, t.i + {SA_SCRUB_WINDOW}), ' ') AS g
          FROM d, unnest(range(0, len(toks) - {SA_SCRUB_WINDOW} + 1)) t(i)),
cnt AS (SELECT g, count(*) AS n FROM grams GROUP BY g),
hits AS (SELECT doc_id, pos FROM grams JOIN cnt USING (g) WHERE n >= 2),
isl AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER w IS NULL
                  OR pos - lag(pos) OVER w > {SA_SCRUB_WINDOW}
             THEN 1 ELSE 0 END AS newi
        FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl2 AS (SELECT doc_id, pos,
         SUM(newi) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
iv AS (SELECT doc_id, island, MIN(pos) AS istart,
              MAX(pos) + {SA_SCRUB_WINDOW} - 1 AS iend
       FROM isl2 GROUP BY doc_id, island),
istats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_intervals,
                  CAST(SUM(iend - istart + 1) AS BIGINT) AS n_removed
           FROM iv GROUP BY doc_id),
covered AS (SELECT doc_id, CAST(u.p AS INT) AS pos
            FROM iv, unnest(range(istart, iend + 1)) u(p)),
kept AS (SELECT t.doc_id, t.pos, t.tk
         FROM toks t LEFT JOIN covered c
           ON t.doc_id = c.doc_id AND t.pos = c.pos
         WHERE c.pos IS NULL),
perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                  string_agg(tk, ' ' ORDER BY pos) AS clean_text
           FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id FROM toks GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(i.n_intervals, 0) AS n_intervals,
       COALESCE(i.n_removed, 0) AS n_removed,
       COALESCE(p.n_kept, 0) AS n_kept,
       COALESCE(p.clean_text, '') AS clean_text
FROM totals t
LEFT JOIN istats i ON t.doc_id = i.doc_id
LEFT JOIN perdoc p ON t.doc_id = p.doc_id
"""

curation_sa_scrub.__doc__ = curation_sa_scrub.__doc__.format(W=SA_SCRUB_WINDOW)


# --------------------------------------------------------------- r8 fold
#
# Image modality suite (verdict item 4): the five per-codec decode
# queries — BMP / PNG / GIF / TIFF / JPEG — as one leg-tagged
# composite. Every codec's full mixed-profile matrix (incl. the r8
# TIFF LZW leg and the r8 JPEG full-RGB columns) still executes
# inside this one driver hash; each leg's oracle is its pre-fold
# full statement.

from queryengine_spark.queries.base import fold_legs, fold_sql  # noqa: E402
from queryengine_spark.queries.multimodal2 import (  # noqa: E402
    MULTIMODAL_BMP_DECODE_SQL,
    MULTIMODAL_TIFF_DECODE_SQL,
    multimodal_bmp_decode,
    multimodal_tiff_decode,
)

_IMAGE_DECODE_COLS = [
    ("asset_id", "bigint"),
    ("width", "int"),
    ("height", "int"),
    ("n_px", "bigint"),
    ("sum_r", "bigint"),
    ("sum_g", "bigint"),
    ("sum_b", "bigint"),
    ("sum_a", "bigint"),
    ("sum_gray", "bigint"),
    ("wsum", "bigint"),
    ("n_frames", "bigint"),
    ("total_delay_cs", "bigint"),
    ("sum_lum", "bigint"),
    ("min_lum", "int"),
    ("max_lum", "int"),
    ("n_blocks", "bigint"),
    ("sum_dc_dq", "bigint"),
    ("sum_ac_dq", "bigint"),
    ("sum_abs_ac_dq", "bigint"),
    ("n_nonzero_ac", "bigint"),
    ("sum_cb", "bigint"),
    ("sum_cr", "bigint"),
    ("sum_r_c", "bigint"),
    ("sum_g_c", "bigint"),
    ("sum_b_c", "bigint"),
]


def multimodal_image_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Image-decode fold (r8): one leg per from-scratch codec, each
    leg's pre-fold mixed-profile semantics unchanged —

    - 'bmp': 24-bit / paletted / BI_RLE8 (r6);
    - 'png': RGBA, paletted, grayscale, 16-bit, Adam7 (r5/r6);
    - 'gif': GCT / LCT / interlaced / animated LZW (r5/r6);
    - 'tiff': uncompressed / PackBits / WhiteIsZero / LZW+Predictor2
      in both byte orders (r6; LZW r8);
    - 'jpeg': the full Huffman-DCT matrix — DC-only, AC, 16-bit DQT,
      progressive, sequential 4:2:0/4:1:1 with DRI, fixed-point IDCT
      pixels, and the r8 full-RGB columns."""
    return fold_legs(
        [
            ("bmp", multimodal_bmp_decode(spark, sf)),
            ("png", multimodal_png_decode(spark, sf)),
            ("gif", multimodal_gif_decode(spark, sf)),
            ("tiff", multimodal_tiff_decode(spark, sf)),
            ("jpeg", multimodal_jpeg_decode(spark, sf)),
        ],
        _IMAGE_DECODE_COLS,
    )


_IMG_BASE = {"asset_id", "width", "height", "n_px"}
MULTIMODAL_IMAGE_DECODE_SQL = fold_sql(
    [
        ("bmp", MULTIMODAL_BMP_DECODE_SQL,
         _IMG_BASE | {"sum_r", "sum_g", "sum_b"}),
        ("png", MULTIMODAL_PNG_DECODE_SQL,
         _IMG_BASE | {"sum_r", "sum_g", "sum_b", "sum_a", "sum_gray", "wsum"}),
        ("gif", MULTIMODAL_GIF_DECODE_SQL,
         _IMG_BASE | {"sum_r", "sum_g", "sum_b", "n_frames",
                      "total_delay_cs"}),
        ("tiff", MULTIMODAL_TIFF_DECODE_SQL,
         _IMG_BASE | {"sum_r", "sum_g", "sum_b"}),
        ("jpeg", MULTIMODAL_JPEG_DECODE_SQL,
         _IMG_BASE | {"sum_lum", "min_lum", "max_lum", "n_blocks",
                      "sum_dc_dq", "sum_ac_dq", "sum_abs_ac_dq",
                      "n_nonzero_ac", "sum_cb", "sum_cr", "sum_r", "sum_g",
                      "sum_b", "sum_r_c", "sum_g_c", "sum_b_c"}),
    ],
    _IMAGE_DECODE_COLS,
)


QUERIES = {
    "curation_sa_scrub": (curation_sa_scrub, SA_SCRUB_SQL),
    "multimodal_image_decode": (multimodal_image_decode, MULTIMODAL_IMAGE_DECODE_SQL),
    "events_anomaly_window": (events_anomaly_window, EVENTS_ANOMALY_SQL),
    "text_lm_surprise": (text_lm_surprise, TEXT_LM_SURPRISE_SQL),
    "graph_bfs_hops": (graph_bfs_hops, _bfs_sql),
    "dedup_jaccard_prefix": (dedup_jaccard_prefix, PPJOIN_SQL),
}


# ---------------------------------------------------------------------------
# Per-group exact least-squares regression
# ---------------------------------------------------------------------------


def profile_regression_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language least-squares fit of token count (y) against
    character count (x) — the dataset-card correlation a curation
    team reads before trusting a length-based filter. All sufficient
    statistics and the slope's rational form stay BIGINT (numerator
    n·Σxy − Σx·Σy, denominator n·Σx² − (Σx)²), so partial-aggregation
    order can never flip a bit; the slope itself is the single final
    IEEE division on identical operands both engines. One map-side
    partial-agg scan, |langs| output rows. (Extends
    profile_lang_token_moments from variance to covariance; the
    Pearson-r² numerator/denominator pair ships as exact integers —
    consumers divide when they need the float.)"""
    d = t(spark, sf, "documents")
    x = F.col("n_chars").cast("bigint")
    y = F.size(tokenize_ws(F.col("text"))).cast("bigint")
    agg = spread(d).select(
        "lang", x.alias("x"), y.alias("y")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_num = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_num = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "lang",
        "n",
        cov_num.cast("bigint").alias("cov_num"),
        varx_num.cast("bigint").alias("varx_num"),
        vary_num.cast("bigint").alias("vary_num"),
        (cov_num / varx_num).alias("slope"),
    )


REGRESSION_SQL = f"""
WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
                  CAST(len({_TOKS.format(c="text")}) AS BIGINT) AS y
           FROM documents),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM b GROUP BY lang)
SELECT lang, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
       CAST(n * syy - sy * sy AS BIGINT) AS vary_num,
       (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
FROM a
"""

QUERIES["profile_regression_slope"] = (profile_regression_slope, REGRESSION_SQL)


# ---------------------------------------------------------------------------
# Sequence-pattern matching over event streams (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------


def events_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-sequence pattern detection — the
    MATCH_RECOGNIZE shape Spark lacks natively: each user's events
    collapse (in exact (ts, event_id) order) into a symbol string,
    and the view→click→purchase subsequence is located by the greedy
    earliest-occurrence chain (complete for subsequence patterns:
    earliest-v, then earliest-c after it, then earliest-p after that
    exists iff ANY v<c<p chain exists). All-integer position
    arithmetic — no regex engine semantics to diverge cross-engine.

    Scale: one groupBy(user) with a sort_array over structs — state
    per user ∝ their event count (the per-entity sequence IS the
    workload; sessions-not-users would be the key at web scale,
    exactly as events_sessionize provides). Funnel columns: first
    chain positions and a completion flag; 1 row per user."""
    e = t(spark, sf, "events")
    seq_col = F.concat_ws(
        "",
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("us").alias("us"),
                        F.col("event_id").alias("eid"),
                        F.col("sym").alias("sym"),
                    )
                )
            ),
            lambda s: s["sym"],
        ),
    )
    from queryengine_spark.queries.base import epoch_us

    base = spread(e).select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        F.substring("event_type", 1, 1).alias("sym"),
    )
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        seq_col.alias("seq"),
    )
    return agg.selectExpr(
        "user_id",
        "n_events",
        "seq",
        "instr(seq, 'v') AS i_v",
        """CASE WHEN instr(seq, 'v') > 0
                 AND instr(substr(seq, instr(seq, 'v') + 1), 'c') > 0
           THEN instr(seq, 'v') + instr(substr(seq, instr(seq, 'v') + 1), 'c')
           ELSE 0 END AS i_c""",
    ).selectExpr(
        "user_id",
        "n_events",
        "seq",
        "CAST(i_v AS INT) AS i_v",
        "CAST(i_c AS INT) AS i_c",
        """CAST(CASE WHEN i_c > 0
                      AND instr(substr(seq, i_c + 1), 'p') > 0
                THEN i_c + instr(substr(seq, i_c + 1), 'p')
                ELSE 0 END AS INT) AS i_p""",
    ).selectExpr(
        "user_id",
        "n_events",
        "seq",
        "i_v",
        "i_c",
        "i_p",
        "CAST(i_p > 0 AS INT) AS has_funnel",
    )


EVENTS_PATTERN_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS sym
  FROM events
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         string_agg(sym, '' ORDER BY ts, event_id) AS seq
  FROM base GROUP BY user_id
),
s1 AS (
  SELECT user_id, n_events, seq, instr(seq, 'v') AS i_v,
         CASE WHEN instr(seq, 'v') > 0
               AND instr(substr(seq, instr(seq, 'v') + 1), 'c') > 0
         THEN instr(seq, 'v') + instr(substr(seq, instr(seq, 'v') + 1), 'c')
         ELSE 0 END AS i_c
  FROM agg
),
s2 AS (
  SELECT user_id, n_events, seq, CAST(i_v AS INT) AS i_v, CAST(i_c AS INT) AS i_c,
         CAST(CASE WHEN i_c > 0 AND instr(substr(seq, i_c + 1), 'p') > 0
              THEN i_c + instr(substr(seq, i_c + 1), 'p')
              ELSE 0 END AS INT) AS i_p
  FROM s1
)
SELECT user_id, n_events, seq, i_v, i_c, i_p,
       CAST(i_p > 0 AS INT) AS has_funnel
FROM s2
"""

QUERIES["events_pattern_match"] = (events_pattern_match, EVENTS_PATTERN_SQL)


# ---------------------------------------------------------------------------
# Winsorization (exact per-group percentile clipping)
# ---------------------------------------------------------------------------

#: winsorize at the exact p10/p90 ranks: rank_p = ⌈p·n/100⌉ (1-based,
#: clamped to ≥1) — pure integer, identical on both engines
WINSOR_LO, WINSOR_HI = 10, 90


def text_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language winsorization of token counts: clip each document
    to the exact empirical [p10, p90] of its language — the
    complement of text_outlier_mad (clip instead of flag). Percentile
    = the value at 1-based rank ⌈p·n/100⌉ of the (value, doc_id)
    sort: all-integer, no interpolation, bit-identical cross-engine.
    Two window passes produce a |langs|-row bound table that
    broadcasts back onto the corpus."""
    d = t(spark, sf, "documents")
    base = spread(d).select(
        "doc_id",
        "lang",
        F.size(tokenize_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    wc = Window.partitionBy("lang")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    lo_rank = F.expr(f"greatest(CAST(1 AS BIGINT), ({WINSOR_LO} * n + 99) div 100)")
    hi_rank = F.expr(f"greatest(CAST(1 AS BIGINT), ({WINSOR_HI} * n + 99) div 100)")
    bounds = (
        ranked.filter((F.col("rn") == lo_rank) | (F.col("rn") == hi_rank))
        .groupBy("lang")
        .agg(
            F.min("n_tokens").cast("bigint").alias("p_lo"),
            F.max("n_tokens").cast("bigint").alias("p_hi"),
        )
    )
    return (
        base.join(F.broadcast(bounds), "lang")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "p_lo",
            "p_hi",
            F.expr("least(greatest(n_tokens, p_lo), p_hi)").alias("clipped"),
            (
                (F.col("n_tokens") < F.col("p_lo"))
                | (F.col("n_tokens") > F.col("p_hi"))
            )
            .cast("int")
            .alias("was_clipped"),
        )
    )


WINSORIZE_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM base
),
bounds AS (
  SELECT lang,
         CAST(MIN(n_tokens) AS BIGINT) AS p_lo,
         CAST(MAX(n_tokens) AS BIGINT) AS p_hi
  FROM ranked
  WHERE rn = greatest(1, ({WINSOR_LO} * n + 99) // 100)
     OR rn = greatest(1, ({WINSOR_HI} * n + 99) // 100)
  GROUP BY lang
)
SELECT b.doc_id, b.lang, b.n_tokens, o.p_lo, o.p_hi,
       least(greatest(b.n_tokens, o.p_lo), o.p_hi) AS clipped,
       CAST(b.n_tokens < o.p_lo OR b.n_tokens > o.p_hi AS INT) AS was_clipped
FROM base b JOIN bounds o USING (lang)
"""

QUERIES["text_winsorize"] = (text_winsorize, WINSORIZE_SQL)


# ---------------------------------------------------------------------------
# Event transition matrix (first-order Markov)
# ---------------------------------------------------------------------------


def events_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: counts
    of consecutive (event → next event) pairs within each user's
    (ts, event_id)-ordered stream, with the conditional transition
    probability as an exact ppm integer ((10^6·c) div row-total).
    One window lag pass per user + one |types|²-bounded aggregate —
    the journey-analysis primitive behind "what do users do after an
    error"."""
    e = t(spark, sf, "events")
    from queryengine_spark.queries.base import epoch_us

    w = Window.partitionBy("user_id").orderBy(epoch_us("ts"), F.col("event_id"))
    pairs = (
        spread(e)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("next_type"),
            F.lag("event_type", 1).over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return counts.withColumn(
        "row_total", F.sum("n").over(wt).cast("bigint")
    ).select(
        "prev_type",
        "next_type",
        "n",
        "row_total",
        F.expr("(1000000 * n) div row_total").alias("prob_ppm"),
    )


TRANSITION_SQL = """
WITH ordered AS (
  SELECT user_id, event_type AS next_type,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
       (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS prob_ppm
FROM counts
"""

QUERIES["events_transition_matrix"] = (events_transition_matrix, TRANSITION_SQL)


# ---------------------------------------------------------------------------
# Corpus-novelty scoring (hapax fraction)
# ---------------------------------------------------------------------------


def text_novelty_hapax(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document novelty signals: distinct-token count, type-token
    ratio (ppm integer), and the corpus-hapax share — how many of the
    doc's distinct tokens appear NOWHERE else in the corpus (df = 1).
    High hapax share = novel/rare content (or noise); near-zero =
    boilerplate. One distinct (doc, token) relation feeding a
    vocabulary-sized df aggregate that joins back on the token key —
    the same inverted shape as TF-IDF, all-integer output."""
    d = t(spark, sf, "documents")
    toks = tokenize_ws(F.lower(F.col("text")))
    rel = (
        spread(d)
        .select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.explode(F.array_distinct(toks)).alias("tok"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = rel.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return (
        rel.join(dfreq, "tok")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum((F.col("df") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "n_hapax",
            F.expr("(1000000 * n_distinct) div n_tokens").alias("ttr_ppm"),
            F.expr("(1000000 * n_hapax) div n_distinct").alias("hapax_ppm"),
        )
    )


NOVELTY_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
rel AS (SELECT DISTINCT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               unnest(toks) AS tok
        FROM d),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM rel GROUP BY tok),
agg AS (SELECT r.doc_id, r.n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        FROM rel r JOIN dfreq f ON r.tok = f.tok
        GROUP BY r.doc_id, r.n_tokens)
SELECT doc_id, n_tokens, n_distinct, n_hapax,
       (1000000 * n_distinct) // n_tokens AS ttr_ppm,
       (1000000 * n_hapax) // n_distinct AS hapax_ppm
FROM agg
"""

QUERIES["text_novelty_hapax"] = (text_novelty_hapax, NOVELTY_SQL)


# ---------------------------------------------------------------------------
# IMA-ADPCM corpus slot (r10 — the r9 codec's promised driver row)
# ---------------------------------------------------------------------------

#: block align of the ADPCM corpus leg: 64 bytes → 121 samples/block,
#: so the synthetic sample counts (64..363) span 1-3 blocks and the
#: block walk is really exercised (the default 256-byte align would
#: leave every asset single-block)
ADPCM_CORPUS_ALIGN = 64


def multimodal_wav_adpcm(spark: SparkSession, sf: str) -> DataFrame:
    """IMA-ADPCM decode over a MULTI-BLOCK corpus (r10): synthesize a
    format-0x11 WAV per asset (64-byte blocks, extended fmt chunk,
    mandatory fact chunk), run the real block-structured decode
    (multimodal/wav.py::decode_adpcm_wav — header predictor/index,
    step-table nibble expansion, clamps, fact truncation), and emit
    container facts plus ``lead_sum`` = Σ of the BLOCK-LEADING
    decoded samples.

    REDUCED oracle (the repo's pattern for decoder internals SQL
    cannot express): rate / n_samples / n_blocks come from the
    synthesis formulas, and every block-leading sample rides VERBATIM
    in its block header (the IMA encoder stores it uncompressed), so
    lead_sum is formula-derivable too — certifying the RIFF walk,
    fmt/fact validation, block geometry and header placement
    cross-engine. The step-ladder reconstruction between leads is
    pinned by pytest hand-expanded vectors and the ≤16-per-sample
    round-trip bound (tests/test_curation.py, test_codec_properties)."""
    import pandas as pd

    from queryengine_spark.multimodal.wav import (
        BMP_ASSET_SCHEMA,
        decode_adpcm_wav,
        make_wav_adpcm,
    )

    spb = (ADPCM_CORPUS_ALIGN - 4) * 2 + 1

    def synth(batches):
        for pdf in batches:
            ids_ = [int(a) for a in pdf["asset_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids_, dtype="int64"),
                    "payload": [
                        make_wav_adpcm(a, ADPCM_CORPUS_ALIGN) for a in ids_
                    ],
                }
            )

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("sample_rate", IntegerType(), True),
            StructField("n_samples", LongType(), True),
            StructField("n_blocks", LongType(), True),
            StructField("lead_sum", LongType(), True),
        ]
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                dec = (
                    decode_adpcm_wav(bytes(payload))
                    if payload is not None
                    else None
                )
                if dec is None:
                    rows.append((int(aid), None, None, None, None))
                    continue
                rate, s = dec
                n = len(s)
                leads = s[::spb]
                rows.append(
                    (int(aid), rate, n, len(leads), int(leads.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples", "n_blocks",
                    "lead_sum",
                ],
            )

    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    assets = spread(ids).mapInPandas(synth, BMP_ASSET_SCHEMA)
    return assets.mapInPandas(stats, out_schema)


from queryengine_spark.multimodal.wav import (  # noqa: E402
    WAV_A_MULT,
    WAV_I_MULT,
    WAV_N_MOD,
    WAV_S_MOD,
)

_ADPCM_SPB = (ADPCM_CORPUS_ALIGN - 4) * 2 + 1

WAV_ADPCM_SQL = f"""
WITH ids AS (SELECT doc_id AS asset_id FROM documents),
par AS (SELECT asset_id,
               CAST(8000 + 1000 * (asset_id % 4) AS INT) AS sample_rate,
               CAST(64 + asset_id % {WAV_N_MOD} AS BIGINT) AS n_samples
        FROM ids),
leads AS (SELECT asset_id, sample_rate, n_samples,
                 CAST(kk.i AS BIGINT) * {_ADPCM_SPB} AS lead_i
          FROM par,
               unnest(range(0, (n_samples + {_ADPCM_SPB} - 1) // {_ADPCM_SPB}))
                 kk(i))
SELECT asset_id, sample_rate, n_samples,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM((asset_id * {WAV_A_MULT} + lead_i * {WAV_I_MULT})
                % {WAV_S_MOD} - 32768) AS BIGINT) AS lead_sum
FROM leads GROUP BY asset_id, sample_rate, n_samples
"""

QUERIES["multimodal_wav_adpcm"] = (multimodal_wav_adpcm, WAV_ADPCM_SQL)


def multimodal_tiff_deep(spark: SparkSession, sf: str) -> DataFrame:
    """Deep-gray TIFF decode (r11 — the corpus slot the TIFF
    depth-1/4/16 codec landed with): one TIFF per document at depth
    1 / 4 / 16 by asset % 3 (archival bilevel, 4-bit gray,
    scientific 16-bit), odd assets PackBits-compressed, asset % 8 ==
    5 WhiteIsZero. The reader unpacks MSB-first sub-byte rows with
    per-row padding / byte-ordered 16-bit samples and inverts within
    the code range; the oracle recomputes the exact code sums FROM
    THE PIXEL FORMULAS, so a hash match certifies the whole sub-byte
    and 16-bit machinery. Zero shuffle. Design notes:
    multimodal/tiff.py::make_tiff_gray_deep."""
    from queryengine_spark.multimodal.tiff import (
        synthesize_tiff_deep,
        tiff_deep_stats,
    )

    ids = t(spark, sf, "documents").select(F.col("doc_id").alias("asset_id"))
    return tiff_deep_stats(synthesize_tiff_deep(spread(ids)))


from queryengine_spark.multimodal.tiff import (  # noqa: E402
    TIF_GRAY1,
    TIF_H_MOD,
    TIF_W_MOD,
)

TIFF_DEEP_SQL = f"""
WITH ids AS (SELECT doc_id AS a FROM documents),
cfg AS (SELECT a,
               CAST(5 + a % {TIF_W_MOD} AS BIGINT) AS w,
               CAST(4 + a % {TIF_H_MOD} AS BIGINT) AS h,
               CAST(CASE a % 3 WHEN 0 THEN 1 WHEN 1 THEN 4
                    ELSE 16 END AS INT) AS bps
        FROM ids),
px AS (SELECT a, w, h, bps, xx.x, yy.y,
              ((xx.x // 4) * {TIF_GRAY1[0]} + {TIF_GRAY1[1]} * yy.y
               + {TIF_GRAY1[2]} * a) % 256 AS g
       FROM cfg, unnest(range(0, w)) xx(x), unnest(range(0, h)) yy(y)),
codes AS (SELECT a, w, h, bps, x, y,
                 CASE WHEN bps = 16
                      THEN (257 * g + 101 * a + 3 * x + 5 * y) % 65536
                      WHEN bps = 4 THEN g % 16
                      ELSE g % 2 END AS code
          FROM px),
inv AS (SELECT a, w, h, bps, x, y,
               CASE WHEN a % 8 = 5
                    THEN (CASE bps WHEN 1 THEN 1 WHEN 4 THEN 15
                          ELSE 65535 END) - code
                    ELSE code END AS v
        FROM codes)
SELECT a AS asset_id, bps,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS code_sum,
       CAST(MAX(CASE WHEN x = w - 1 AND y = h - 1 THEN v END)
            AS BIGINT) AS corner_code
FROM inv GROUP BY a, bps, w, h
"""

QUERIES["multimodal_tiff_deep"] = (multimodal_tiff_deep, TIFF_DEEP_SQL)
