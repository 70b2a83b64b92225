"""Round-4 curation additions: the remaining operations a training-
data team runs between "corpus is deduped" and "tokens hit the
trainer" —

- **sequence packing** (``pipeline_sequence_packing``): concatenate
  documents in a deterministic pseudo-random order and slice the
  stream into fixed-length training sequences (the GPT-style
  concat-and-chunk packer), reporting per-pack fill and boundary
  fragmentation. Packing runs independently per (source, shard) so
  the window never sees more than one shard of one source — at
  100 TB the parallelism is n_sources × PACK_SHARDS and each
  cumulative-sum task is bounded, while determinism (md5 order)
  makes the pack layout reproducible across runs and engines.
- **robust outlier detection** (``text_outlier_mad``): per-language
  median / MAD over token counts — the robust length filter that
  survives heavy-tailed corpora where mean/stddev clipping fails.
  Exact lower-median via row_number against the partition count
  (all-integer; bit-identical cross-engine), two window passes and
  two broadcast joins of |langs| rows.
- **shard assignment audit** (``pipeline_shard_assign``): the
  deterministic global shuffle that precedes a sharded training
  write — md5-hash each doc into N_SHARDS shards and audit balance
  (docs, tokens, language/source spread, xor checksum). Pure
  map-side hash + one tiny agg; re-running reproduces the same
  assignment, which is what makes resumable shard writes safe.
- **cross-source overlap matrix** (``dedup_cross_source_overlap``):
  pairwise source-level contamination — how many distinct word
  trigrams each pair of sources shares, as a containment ratio of
  the smaller side. The corpus-level view of decontamination: an
  inverted-index self-join on the trigram (never all-pairs) with
  the same hot-shingle document-frequency guard, so the join is
  bounded by sources-per-trigram, not corpus size.

No reference-engine counterpart (the reference's only query is the
fuzzy pipeline, `/root/reference/src/heurFuzz.py`); these extend the
north-star LLM-pipeline surface (BASELINE.json) like the rest of the
curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.plans import spread
from queryengine_spark.queries.base import t
from queryengine_spark.queries.pipelines import _word_trigrams
from queryengine_spark.queries.textstats import _TOKS
from queryengine_spark.functions.text import tokenize_ws

#: packing: training sequence length (tokens) and the number of
#: independent packing shards per source. Real runs use 2048/4096 and
#: hundreds of shards; 256/4 keeps the synthetic corpus (≈55
#: tokens/doc) producing multi-doc packs with boundary crossings.
SEQ_LEN = 256
PACK_SHARDS = 4

#: MAD outlier rule: |x - median| > MAD_K * MAD (with MAD = 0 the
#: rule degenerates to "any deviation", which is the conventional
#: strict fallback and identical on both engines).
MAD_K = 3

#: shard audit fan-out
N_SHARDS = 16

#: cross-source overlap: drop word trigrams present in more than this
#: fraction of documents (same guard rationale as DECON_MAX_DF_RATIO —
#: hot trigrams carry no contamination signal and would dominate the
#: inverted self-join).
SRC_MAX_DF_RATIO = 0.05

_TOKS_RAW = _TOKS.format(c="text")


def _h48(col):
    """48-bit integer from the md5 of a column (engine-portable:
    DuckDB twin is ('0x' || substr(md5(x),1,12))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


_H48_SQL = "(('0x' || substr(md5({x}), 1, 12))::BIGINT)"


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pipeline_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(source, shard) deterministic concat-and-chunk packing:
    documents are laid end-to-end in md5(doc_id) order and the token
    stream is sliced into SEQ_LEN-token training sequences. Emits one
    row per (pack, docs-overlapping-it): pack fill (clipped token
    count), doc count, and how many docs cross a pack boundary (the
    fragmentation a packer wants to minimize).

    Plan: one projection, one window cumulative sum per (source,
    shard) group, one bounded explode (a doc spans at most
    n_tokens/SEQ_LEN + 1 packs), one partial-aggregated groupBy.
    No joins, no UDFs, nothing driver-side."""
    d = t(spark, sf, "documents")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = (
        spread(d)
        .select(
            "doc_id",
            "source",
            _h48(F.col("doc_id").cast("string")).alias("h48"),
            F.size(tokenize_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .withColumn("shard", F.col("h48") % PACK_SHARDS)
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
    )
    spans = toks.select(
        "source",
        "shard",
        "start",
        "cum",
        F.explode(
            F.sequence(
                F.expr(f"start div {SEQ_LEN}"), F.expr(f"(cum - 1) div {SEQ_LEN}")
            )
        ).alias("pack_id"),
    )
    lo = F.col("pack_id") * SEQ_LEN
    hi = (F.col("pack_id") + 1) * SEQ_LEN
    return (
        spans.select(
            "source",
            "shard",
            "pack_id",
            (F.least(F.col("cum"), hi) - F.greatest(F.col("start"), lo)).alias("tk"),
            ((F.col("start") < lo) | (F.col("cum") > hi)).cast("int").alias("crosses"),
        )
        .groupBy("source", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tk").cast("bigint").alias("n_tokens"),
            F.sum("crosses").cast("bigint").alias("n_boundary_docs"),
        )
    )


SEQUENCE_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         {_H48_SQL.format(x="CAST(doc_id AS VARCHAR)")} AS h48,
         CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, h48 % {PACK_SHARDS} AS shard, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source, h48 % {PACK_SHARDS}
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT source, shard, cum - n_tokens AS strt, cum,
         unnest(generate_series((cum - n_tokens) // {SEQ_LEN},
                                (cum - 1) // {SEQ_LEN})) AS pack_id
  FROM cum
)
SELECT source, shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(least(cum, (pack_id + 1) * {SEQ_LEN})
                - greatest(strt, pack_id * {SEQ_LEN})) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN strt < pack_id * {SEQ_LEN}
                       OR cum > (pack_id + 1) * {SEQ_LEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
FROM spans GROUP BY source, shard, pack_id
"""


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD)
# ---------------------------------------------------------------------------


def _lower_median(df: DataFrame, part: str, val: str, out: str) -> DataFrame:
    """Exact lower median of ``val`` per ``part`` (the element at
    1-indexed position (n+1) div 2 of the sorted values — identical
    on both engines, no float interpolation)."""
    w = Window.partitionBy(part).orderBy(F.col(val), F.col("doc_id"))
    wc = Window.partitionBy(part)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(part, F.col(val).alias(out))
    )


def text_outlier_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language robust token-count outlier flags: exact lower
    median, exact MAD (median absolute deviation), and the
    |x - med| > MAD_K * MAD rule. All-integer, so the flags are
    bit-identical cross-engine; the per-language medians are two
    window passes plus two broadcast joins of |langs| rows."""
    d = t(spark, sf, "documents")
    base = spread(d).select(
        "doc_id",
        "lang",
        F.size(tokenize_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    med = _lower_median(base, "lang", "n_tokens", "med_tokens")
    dev = base.join(F.broadcast(med), "lang").withColumn(
        "absdev", F.abs(F.col("n_tokens") - F.col("med_tokens"))
    )
    mad = _lower_median(dev, "lang", "absdev", "mad_tokens")
    return (
        dev.join(F.broadcast(mad), "lang")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "med_tokens",
            "mad_tokens",
            (F.col("absdev") > MAD_K * F.col("mad_tokens")).cast("int").alias(
                "is_outlier"
            ),
        )
    )


OUTLIER_MAD_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens
  FROM documents
),
r1 AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM base
),
med AS (SELECT lang, n_tokens AS med_tokens FROM r1 WHERE rn = (n + 1) // 2),
dev AS (
  SELECT b.doc_id, b.lang, b.n_tokens, m.med_tokens,
         abs(b.n_tokens - m.med_tokens) AS absdev
  FROM base b JOIN med m USING (lang)
),
r2 AS (
  SELECT doc_id, lang, absdev,
         row_number() OVER (PARTITION BY lang ORDER BY absdev, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM dev
),
mad AS (SELECT lang, absdev AS mad_tokens FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.doc_id, d.lang, d.n_tokens, d.med_tokens, m.mad_tokens,
       CAST(d.absdev > {MAD_K} * m.mad_tokens AS INT) AS is_outlier
FROM dev d JOIN mad m USING (lang)
"""


# ---------------------------------------------------------------------------
# Deterministic shard assignment + balance audit
# ---------------------------------------------------------------------------


def pipeline_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-shard assignment (md5 mod N_SHARDS) with
    a balance audit per shard: doc/token counts, language and source
    spread, and an order-independent xor checksum of the 48-bit doc
    hashes (the signature a resumable shard writer re-verifies).
    Pure map-side hashing plus one N_SHARDS-group aggregation — the
    shuffle moves only partial-agg rows, never documents."""
    d = t(spark, sf, "documents")
    h = _h48(F.col("doc_id").cast("string"))
    return (
        spread(d)
        .select(
            (h % N_SHARDS).alias("shard"),
            h.alias("h48"),
            "lang",
            "source",
            F.size(tokenize_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.expr("bit_xor(h48)").cast("bigint").alias("xor_sig"),
        )
    )


SHARD_ASSIGN_SQL = f"""
WITH h AS (
  SELECT {_H48_SQL.format(x="CAST(doc_id AS VARCHAR)")} AS h48, lang, source,
         CAST(len({_TOKS_RAW}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT h48 % {N_SHARDS} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(bit_xor(h48) AS BIGINT) AS xor_sig
FROM h GROUP BY shard
"""


# ---------------------------------------------------------------------------
# Cross-source overlap (contamination matrix)
# ---------------------------------------------------------------------------


def dedup_cross_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise source-contamination matrix: for every pair of
    sources, the number of distinct word trigrams both contain and
    that count as a ppm containment ratio of the smaller side. The
    inverted-index self-join runs on the distinct (source, trigram)
    relation — at most |sources| rows per trigram — after the same
    hot-trigram document-frequency guard decontamination uses, so
    the join volume is Σ (sources-per-trigram)², bounded regardless
    of corpus size. Output is |sources|² rows at most: a dashboard
    relation, not data-sized."""
    d = t(spark, sf, "documents")
    toks = tokenize_ws(F.lower(F.col("text")))
    tri = (
        spread(d)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(_word_trigrams(toks))).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = tri.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    hot = (
        dfreq.crossJoin(F.broadcast(tot))
        .filter(F.col("df") > SRC_MAX_DF_RATIO * F.col("n_docs"))
        .select("sh")
    )
    ssh = (
        tri.join(F.broadcast(hot), "sh", "left_anti")
        .select("source", "sh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ns = ssh.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = ssh.select(F.col("source").alias("source_a"), "sh")
    b = ssh.select(F.col("source").alias("source_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(ns.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(ns.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(1000000 * n_shared) div least(n_a, n_b)").alias(
                "containment_ppm"
            ),
        )
    )


CROSS_SOURCE_OVERLAP_SQL = f"""
WITH d AS (SELECT doc_id, source, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
tri AS (SELECT doc_id, source,
        unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh
        FROM d),
tot AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (SELECT sh, count(*) AS df FROM tri GROUP BY sh),
ssh AS (SELECT DISTINCT t.source, t.sh
        FROM tri t JOIN dfreq f ON t.sh = f.sh, tot
        WHERE f.df <= {SRC_MAX_DF_RATIO} * tot.n_docs),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ssh GROUP BY source),
shared AS (SELECT a.source AS source_a, b.source AS source_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
           GROUP BY a.source, b.source)
SELECT s.source_a, s.source_b, s.n_shared, na.n AS n_a, nb.n AS n_b,
       (1000000 * s.n_shared) // least(na.n, nb.n) AS containment_ppm
FROM shared s
JOIN ns na ON s.source_a = na.source
JOIN ns nb ON s.source_b = nb.source
"""


#: suffix-array span window (power of 2 — 3 prefix-doubling rounds)
SA_WINDOW = 8


def curation_repeated_spans_sa(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed SUFFIX-ARRAY repeated-span detection
    (operators/suffix.py, r5): prefix doubling ranks every corpus
    position by its first SA_WINDOW tokens in log2(W) rank-join
    rounds — no n-gram string is ever materialized — then rank
    classes of size ≥ 2 are the repeated spans (including
    intra-document repeats, the upgrade over span_scrub's
    cross-document distinct-doc count). The oracle IS the n-gram
    formulation (DuckDB materializes the 8-gram strings and counts
    occurrences), so the driver hash certifies the suffix-array
    construction is position-for-position equivalent to the direct
    method while shuffling only fixed-width ranks."""
    from queryengine_spark.operators.suffix import repeated_spans_sa

    return repeated_spans_sa(
        t(spark, sf, "documents"), "doc_id", "text", window=SA_WINDOW
    )


REPEATED_SPANS_SA_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS.format(c="lower(text)")} AS toks FROM documents),
grams AS (SELECT doc_id, CAST(t.i AS INT) AS pos,
          array_to_string(list_slice(toks, t.i + 1, t.i + {SA_WINDOW}), ' ') AS g
          FROM d, unnest(range(0, len(toks) - {SA_WINDOW} + 1)) t(i)),
cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_dup FROM grams GROUP BY g)
SELECT doc_id, pos, n_dup
FROM grams JOIN cnt USING (g) WHERE n_dup >= 2
"""


QUERIES = {
    "pipeline_sequence_packing": (pipeline_sequence_packing, SEQUENCE_PACKING_SQL),
    "text_outlier_mad": (text_outlier_mad, OUTLIER_MAD_SQL),
    "pipeline_shard_assign": (pipeline_shard_assign, SHARD_ASSIGN_SQL),
    "dedup_cross_source_overlap": (
        dedup_cross_source_overlap,
        CROSS_SOURCE_OVERLAP_SQL,
    ),
    "curation_repeated_spans_sa": (
        curation_repeated_spans_sa,
        REPEATED_SPANS_SA_SQL,
    ),
}


# ---------------------------------------------------------------------------
# HTML main-content extraction (r6)
# ---------------------------------------------------------------------------

#: entities the decoder handles (the HTML4 core set; decode &amp;
#: LAST so "&amp;lt;" correctly yields the literal "&lt;")
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _html_page_col(d: DataFrame):
    """The deterministic page template (r6; extracted r8 so the WARC
    leg builds the SAME bytes)."""
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>body { color: #111; }</style>"),
        F.lit("<script>var js = 1 < 2 && 3 > 2; track('"),
        F.col("doc_id").cast("string"),
        F.lit("');</script></head><body><nav>home &amp; about &gt; docs</nav>"),
        F.lit('<div class="main" id="c'),
        F.col("doc_id").cast("string"),
        F.lit('"><h1>Title '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &lt;tail "),
        F.col("doc_id").cast("string"),
        F.lit("&gt; &quot;quoted&quot; &#39;s&#39;&nbsp;end</p></div>"),
        F.lit("<footer>&copy; site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example</footer></body></html>"),
    )


def html_clean_text(col: "F.Column") -> "F.Column":
    """The standard extraction chain as ONE reusable Column (r9 —
    shared by the batch query and the streaming WARC→WET gate): two
    separate block patterns, not one with a backreference — RE2 (the
    oracle's engine) has no backrefs, and the split form parses
    identically under Java regex; entity decode with &amp; LAST;
    whitespace collapse."""
    no_blocks = F.regexp_replace(
        F.regexp_replace(col, r"(?s)<script[^>]*>.*?</script>", " "),
        r"(?s)<style[^>]*>.*?</style>",
        " ",
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", " ")
    decoded = no_tags
    for ent, ch in _HTML_ENTITIES:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def _html_extract_cols(base: DataFrame, *extra: str) -> DataFrame:
    """(doc_id, html) → the extraction output columns — the standard
    pure-regex pipeline: (?s) non-greedy script/style block removal,
    tag stripping, HTML-entity decoding with &amp; decoded LAST,
    whitespace collapse. All Column expressions (zero UDF)."""
    withc = base.withColumn("clean", html_clean_text(F.col("html")))
    return withc.select(
        *extra,
        "doc_id",
        F.regexp_count(F.col("html"), F.lit(r"<[^>]*>")).cast("int").alias("n_tags"),
        F.regexp_count(F.col("html"), F.lit(r"&[a-z#0-9]+;"))
        .cast("int")
        .alias("n_entities"),
        F.length("clean").cast("bigint").alias("extracted_len"),
        F.md5("clean").alias("extracted_hash"),
        F.expr(
            "(1000000 * (length(html) - length(clean))) div length(html)"
        ).alias("boilerplate_ratio_ppm"),
    )


def text_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    """HTML main-content extraction (r6) — THE CommonCrawl ingestion
    step (WARC/WET production is exactly this: markup → clean text):
    each document is wrapped in a deterministic but realistic HTML
    page (doctype, head with <style> and <script> payloads that MUST
    NOT leak into the text, nav/footer boilerplate, entity-encoded
    punctuation in the body), then extracted back with the standard
    pure-regex pipeline. The oracle runs the same extraction and the
    hash certifies every stage: a script leak, a missed entity or a
    greedy tag match all change extracted_hash. boilerplate_ratio_ppm
    = share of the raw page the extractor discarded — the field
    real pipelines threshold on.

    r8: leg 'warc' runs the ACTUAL WARC→WET chain — each page is
    wrapped in a one-record WARC response (plain .warc for even
    doc_ids, record-per-gzip-member .warc.gz for odd — sources/
    warc.py), parsed back through the real record walk, and the
    RECOVERED markup goes through the identical extraction. Both
    legs share one oracle statement (the direct extraction), so the
    driver hash certifies the WARC wrap/unwrap is byte-lossless —
    that is the leg's entire claim. fmt (NULL / warc / warc.gz) is
    DETECTED from the container bytes, certifying the routing too.

    r9 (verdict item 3): the wrapped record now carries a REAL HTTP
    response message (status line + Content-Type/Content-Length
    headers + body — the CommonCrawl record shape, ISO 28500 §6.3),
    and the WET side parses the header block for real and extracts
    from the body only. The oracle is unchanged — identical hashes
    now certify that the HTTP wrap + header strip is byte-lossless
    end to end."""
    import pandas as pd

    d = t(spark, sf, "documents")
    base = d.select("doc_id", _html_page_col(d).alias("html"))
    direct = _html_extract_cols(base).select(
        F.lit("direct").alias("leg"),
        F.lit(None).cast("string").alias("fmt"),
        "*",
    )

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rec_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("fmt", StringType()),
            StructField("html", StringType()),
        ]
    )

    def roundtrip(batches):
        from queryengine_spark.sources.warc import (
            _gzip_member,
            http_msgtype,
            make_wet_record,
            parse_http_payload,
            parse_warc,
        )

        for pdf in batches:
            ids, fmts, htmls = [], [], []
            for did, page in zip(pdf["doc_id"], pdf["html"]):
                did = int(did)
                rec = make_wet_record(did, page.encode("utf-8"))
                shard = rec if did % 2 == 0 else _gzip_member(rec)
                parsed = parse_warc(shard)
                if parsed is None or len(parsed) != 1:
                    continue  # refusal: contribute no row
                headers, payload = parsed[0]
                if headers.get("warc-type") != "response":
                    continue
                # r9: response payloads are full HTTP messages now —
                # the WET producer must parse the header block for
                # real and extract text from the BODY only (a header
                # byte leaking into the markup breaks the shared
                # direct-extraction oracle hash)
                mt = http_msgtype(headers)
                if mt != "response":
                    continue
                http = parse_http_payload(payload, mt)
                if http is None or http[0] != 200:
                    continue
                _, _, body = http
                ids.append(did)
                fmts.append(
                    "warc.gz" if shard[:2] == b"\x1f\x8b" else "warc"
                )
                htmls.append(body.decode("utf-8"))
            yield pd.DataFrame({"doc_id": ids, "fmt": fmts, "html": htmls})

    recovered = base.mapInPandas(roundtrip, rec_schema)
    warc_leg = _html_extract_cols(recovered, "fmt").select(
        F.lit("warc").alias("leg"),
        "fmt",
        "doc_id",
        "n_tags",
        "n_entities",
        "extracted_len",
        "extracted_hash",
        "boilerplate_ratio_ppm",
    )
    return direct.unionByName(warc_leg)



#: shared base/cleaned CTE prefix of the HTML-extraction oracles —
#: ALSO the first two stages of the r10 pipeline_cc_ingest composite
#: oracle (queries/ccingest.py), so the extraction chain is stated
#: once
HTML_BASE_CLEANED_CTES = """
WITH base AS (
  SELECT doc_id,
         '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><style>body { color: #111; }</style>'
         || '<script>var js = 1 < 2 && 3 > 2; track(''' || CAST(doc_id AS VARCHAR)
         || ''');</script></head><body><nav>home &amp; about &gt; docs</nav>'
         || '<div class="main" id="c' || CAST(doc_id AS VARCHAR)
         || '"><h1>Title ' || CAST(doc_id AS VARCHAR)
         || '</h1><p>' || text
         || ' &lt;tail ' || CAST(doc_id AS VARCHAR)
         || '&gt; &quot;quoted&quot; &#39;s&#39;&nbsp;end</p></div>'
         || '<footer>&copy; site' || CAST(doc_id % 7 AS VARCHAR)
         || '.example</footer></body></html>' AS html
  FROM documents
),
cleaned AS (
  SELECT doc_id, html,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' '),
                 '(?s)<style[^>]*>.*?</style>', ' '),
               '<[^>]*>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS clean
  FROM base
)"""

HTML_EXTRACT_SQL = HTML_BASE_CLEANED_CTES + """
SELECT 'direct' AS leg, CAST(NULL AS VARCHAR) AS fmt, doc_id,
       CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
       CAST(len(regexp_extract_all(html, '&[a-z#0-9]+;')) AS INT) AS n_entities,
       CAST(length(clean) AS BIGINT) AS extracted_len,
       md5(clean) AS extracted_hash,
       (1000000 * (length(html) - length(clean))) // length(html)
         AS boilerplate_ratio_ppm
FROM cleaned
UNION ALL
-- r8 WARC leg: the oracle states the DIRECT extraction — identical
-- values certify the WARC wrap/unwrap is byte-lossless
SELECT 'warc', CASE WHEN doc_id % 2 = 0 THEN 'warc' ELSE 'warc.gz' END, doc_id,
       CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT),
       CAST(len(regexp_extract_all(html, '&[a-z#0-9]+;')) AS INT),
       CAST(length(clean) AS BIGINT),
       md5(clean),
       (1000000 * (length(html) - length(clean))) // length(html)
FROM cleaned
"""

QUERIES["text_html_extract"] = (text_html_extract, HTML_EXTRACT_SQL)
