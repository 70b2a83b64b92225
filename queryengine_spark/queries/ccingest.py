"""End-to-end CommonCrawl ingestion composite (r10 verdict item 3).

``pipeline_cc_ingest`` chains, in ONE registered query, the stages a
web-scale LLM-data pipeline really runs — every one of which exists
(and is individually certified) elsewhere in the repo, so this
composite's job is to pin the INTER-STAGE CONTRACTS the individual
hashes cannot see:

1. **Shard assembly** — documents are wrapped in the deterministic
   HTML page template and packed 4-per-shard into spec-valid WARC/1.0
   containers (``sources/warc.py::make_wet_record``): plain ``.warc``
   for even shards, record-per-gzip-member ``.warc.gz`` for odd, HTTP
   transfer codings rotating identity/chunked/gzip on doc_id % 3.
2. **CDX index + ranged-read replay** — each shard is indexed into
   per-record byte spans (``parse_warc_spans`` — the CDX convention)
   and every record is then re-parsed FROM ITS SLICE ALONE, the
   access path a CDX index exists for (a wrong span kills the replay
   and therefore the row).
3. **Record walk + transfer-coding undo** — the sliced record's
   application/http payload is parsed for real
   (``parse_http_payload``): status gate, header strip, chunked
   deframing / gzip content-decoding; document identity is recovered
   from WARC-Target-URI, never smuggled beside the bytes.
4. **WET extraction** — the recovered markup runs the standard
   pure-regex extraction chain (``curation2.html_clean_text``,
   shared with text_html_extract: script/style removal, tag strip,
   entity decode, whitespace collapse).
5. **Quality gate** — Gopher rule 1 scaled to the corpus: word count
   within [CC_GATE_MIN_WORDS, CC_GATE_MAX_WORDS].
6. **Near-dup dedup** — MinHash band buckets over the gated clean
   text (same 8-hash/band-4 layout as dedup_minhash_lsh); a doc is
   dropped iff it shares any band bucket with a SMALLER doc_id (the
   one-pass min-of-bucket rule — O(Σ g) work, no pair expansion, no
   cap needed).
7. **Sequence packing** — survivors in ascending doc_id form one
   global token stream cut into CC_SEQ_LEN-token training sequences
   (``operators/packing.pack_sequences`` — the two-phase distributed
   prefix sum), each doc getting its dataloader index entry.

One output row per document: WARC routing facts (shard, container
flavor, transfer coding — each DETECTED from the bytes, mirrored
symbolically by the oracle), extraction stats, the gate and dedup
decisions, and the packing entry (NULL for docs that didn't survive).

The DuckDB oracle replays stages 4-7 symbolically from the synthesis
formulas (the same shared CTE text as the HTML-extraction oracle,
then minhash/banding SQL shared with the dedup oracles, then a plain
window prefix sum) and states stages 1-3 as identities — identical
extraction hashes certify that shard assembly, span-sliced replay
and coding undo were byte-lossless, exactly the r8 WET-leg pattern.

Scale shape: shard assembly is one groupBy (the ingestion shuffle a
real pipeline pays at the crawler, not the reader); index/replay/
extract are zero-shuffle mapInPandas + JVM regex; dedup shuffles
id-keyed relations only; packing is the range-partition prefix sum.
No driver state, no collect, no cartesian anywhere.

Reference scope note: the reference engine (rickbeeloo/QueryEngine,
src/heurFuzz.py) reads plain text files; this composite is the
flagship of the LLM-data-pipeline surface the repo adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.queries.base import t
from queryengine_spark.queries.curation2 import (
    HTML_BASE_CLEANED_CTES,
    _html_page_col,
    html_clean_text,
)
from queryengine_spark.queries.dedup import (
    BAND_SIZE,
    N_HASHES,
    sql_minhash_bands,
    sql_minhash_mins,
)

CC_DOCS_PER_SHARD = 4
CC_GATE_MIN_WORDS, CC_GATE_MAX_WORDS = 40, 100
CC_SEQ_LEN = 256


def pipeline_cc_ingest(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = t(spark, sf, "documents")
    base = d.select(
        "doc_id",
        _html_page_col(d).alias("html"),
        F.expr(f"doc_id div {CC_DOCS_PER_SHARD}").alias("cc_shard"),
    )

    # -- stage 1: shard assembly (the ingestion shuffle) ----------------
    shard_schema = StructType(
        [
            StructField("cc_shard", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        from queryengine_spark.sources.warc import _gzip_member, make_wet_record

        pdf = pdf.sort_values("doc_id")
        sid = int(pdf["cc_shard"].iloc[0])
        recs = [
            make_wet_record(int(did), html.encode("utf-8"))
            for did, html in zip(pdf["doc_id"], pdf["html"])
        ]
        payload = (
            b"".join(recs)
            if sid % 2 == 0
            else b"".join(_gzip_member(r) for r in recs)
        )
        return pd.DataFrame({"cc_shard": [sid], "payload": [payload]})

    # Pinned keyed repartition BEFORE the groupBy (r12): AQE's
    # byte-balanced coalescing collapsed this tiny-but-Python-heavy
    # exchange to ONE partition (profiled: the whole shard-assembly +
    # replay chain ran as a single 4 s task at sf0.1). spread_by's
    # explicit partition count is exempt from AQE coalescing, and
    # hashpartitioning(cc_shard, n) satisfies the groupBy's
    # ClusteredDistribution, so this is the SAME single exchange —
    # just pinned wide (count from shuffle.partitions, env-sized).
    from queryengine_spark.plans import spread_by

    shards = (
        spread_by(base, "cc_shard")
        .groupBy("cc_shard")
        .applyInPandas(build_shard, shard_schema)
    )

    # -- stages 2+3: CDX spans -> slice-only replay -> HTTP undo --------
    rec_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("cc_shard", LongType()),
            StructField("fmt", StringType()),
            StructField("http_enc", StringType()),
            StructField("html", StringType()),
        ]
    )

    def replay(batches):
        from queryengine_spark.sources.warc import (
            _parse_one_record,
            gzip_members,
            http_msgtype,
            parse_http_payload,
            parse_warc_spans,
        )

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["cc_shard"], pdf["payload"]):
                b = bytes(payload)
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                spans = parse_warc_spans(b)  # the CDX build
                if spans is None:
                    continue
                for off, ln, _hdrs, _pay in spans:
                    # ranged-read replay: everything below comes from
                    # the slice ALONE (what a CDX consumer fetches)
                    piece = b[off : off + ln]
                    if fmt == "warc.gz":
                        members = gzip_members(piece)
                        if members is None or len(members) != 1:
                            continue
                        rec = _parse_one_record(members[0], 0)
                        if rec is None or rec[2] != len(members[0]):
                            continue
                    else:
                        rec = _parse_one_record(piece, 0)
                        if rec is None or rec[2] != len(piece):
                            continue
                    headers, pay, _ = rec
                    if headers.get("warc-type") != "response":
                        continue
                    mt = http_msgtype(headers)
                    if mt != "response":
                        continue
                    http = parse_http_payload(pay, mt)
                    if http is None or http[0] != 200:
                        continue
                    _, hh, body = http
                    if "transfer-encoding" in hh:
                        enc = "chunked"
                    elif "content-encoding" in hh:
                        enc = "gzip"
                    else:
                        enc = "identity"
                    # identity from the crawl metadata, never smuggled
                    uri = headers.get("warc-target-uri", "")
                    tail = uri.rsplit("/d", 1)
                    if len(tail) != 2 or not tail[1].isdigit():
                        continue
                    rows.append(
                        (
                            int(tail[1]), int(sid), fmt, enc,
                            body.decode("utf-8"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "cc_shard", "fmt", "http_enc", "html"]
            )

    recovered = shards.mapInPandas(replay, rec_schema)

    # -- stage 4: WET extraction (JVM-side regex chain) -----------------
    from queryengine_spark.functions.text import tokenize_ws

    stats = recovered.withColumn("clean", html_clean_text(F.col("html"))).select(
        "doc_id",
        "cc_shard",
        "fmt",
        "http_enc",
        "clean",
        F.length("clean").cast("bigint").alias("extracted_len"),
        F.md5("clean").alias("extracted_hash"),
        F.size(tokenize_ws(F.col("clean"))).cast("bigint").alias("n_words"),
    )

    # -- stage 5: quality gate ------------------------------------------
    # localCheckpoint: the gated relation feeds THREE consumers (the
    # dedup signature chain, the packing input, and the final join's
    # left side) — without it Spark re-executes the whole shard
    # assembly + replay + extraction per consumer (the repo-standard
    # self-join guard, operators/dedup.py:236)
    # eager (r12): the lazy variant let the shard-assembly + replay
    # chain execute TWICE — the construction-time prefix-sum collect
    # inside pack_sequences and the action each materialized it
    # (profiled: two serial ~4 s single-task jobs at sf0.1). Eager
    # pins one materialization before any consumer's plan is built.
    gated = stats.withColumn(
        "gate_pass",
        (F.col("n_words") >= CC_GATE_MIN_WORDS)
        & (F.col("n_words") <= CC_GATE_MAX_WORDS),
    ).localCheckpoint(eager=True)

    # -- stage 6: near-dup dedup (min-of-bucket rule) -------------------
    from queryengine_spark.operators.dedup import (
        _band_bucket_array,
        minhash_signatures,
    )

    sig = minhash_signatures(
        gated.filter("gate_pass").select("doc_id", "clean"),
        "doc_id",
        "clean",
        n_hashes=N_HASHES,
        shingle_n=3,
    )
    bk = sig.select(
        "id", F.explode(_band_bucket_array(N_HASHES, BAND_SIZE)).alias("bucket")
    )
    # min-of-bucket via a window over the SAME bucket shuffle instead
    # of groupBy+join-back (r12): the join shape referenced bk twice,
    # re-executing the whole shingle→md5 signature chain per branch
    # (profiled: two serial ~2.2 s stages at sf0.1); the window min
    # needs one Exchange and reads the chain once. Identical result:
    # a doc is dropped iff its bucket holds a smaller id.
    from pyspark.sql import Window

    bwin = Window.partitionBy("bucket")
    dropped = (
        bk.withColumn("bmin", F.min("id").over(bwin))
        .filter(F.col("id") > F.col("bmin"))
        .select("id")
        .distinct()
    )
    kept = (
        gated.filter("gate_pass")
        .join(dropped, gated.doc_id == dropped.id, "left_anti")
        .select("doc_id", "clean")
    )

    # -- stage 7: sequence packing over the survivors -------------------
    from queryengine_spark.operators.packing import pack_sequences

    packed = pack_sequences(kept, "doc_id", "clean", CC_SEQ_LEN).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "start_tok",
        "first_seq",
        "last_seq",
        "n_seqs",
        "offset_in_seq",
    )

    return (
        gated.drop("clean")
        .join(packed, "doc_id", "left")
        .select(
            "doc_id",
            "cc_shard",
            "fmt",
            "http_enc",
            "extracted_len",
            "extracted_hash",
            "n_words",
            "gate_pass",
            F.col("first_seq").isNotNull().alias("kept"),
            "n_tokens",
            "start_tok",
            "first_seq",
            "last_seq",
            "n_seqs",
            "offset_in_seq",
        )
    )


def _cc_ingest_sql() -> str:
    """The oracle replays extraction → gate → dedup → packing from
    the synthesis formulas (stages 1-3 are stated as identities: the
    routing facts are closed-form in doc_id, and identical
    extraction hashes certify the WARC wrap / span replay / coding
    undo were byte-lossless — the r8 WET-leg pattern)."""
    mins = sql_minhash_mins(N_HASHES)
    bands = sql_minhash_bands(N_HASHES, BAND_SIZE)
    return (
        HTML_BASE_CLEANED_CTES
        + f""",
stats AS (SELECT doc_id,
                 CAST(length(clean) AS BIGINT) AS extracted_len,
                 md5(clean) AS extracted_hash,
                 CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_words,
                 clean
          FROM cleaned),
gated AS (SELECT *,
                 n_words BETWEEN {CC_GATE_MIN_WORDS} AND {CC_GATE_MAX_WORDS}
                   AS gate_pass
          FROM stats),
d AS (SELECT doc_id AS id, lower(clean) AS tl FROM gated WHERE gate_pass),
di AS (SELECT id, tl, unnest(range(1, length(tl) - 1)) AS i FROM d),
sh AS (SELECT DISTINCT id, substr(tl, CAST(i AS INT), 3) AS sh FROM di),
sig AS (SELECT id,
   {mins}
   FROM sh GROUP BY id),
bk AS (
  {bands}
),
bmin AS (SELECT bucket, MIN(id) AS bmin FROM bk GROUP BY bucket),
dropped AS (SELECT DISTINCT b.id FROM bk b JOIN bmin m ON b.bucket = m.bucket
            WHERE b.id > m.bmin),
kept AS (SELECT g.doc_id, g.n_words FROM gated g
         WHERE g.gate_pass AND g.doc_id NOT IN (SELECT id FROM dropped)),
pre AS (SELECT doc_id, n_words AS n_tokens,
               CAST(COALESCE(SUM(n_words) OVER (
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_tok
        FROM kept),
packed AS (SELECT doc_id, n_tokens, start_tok,
                  start_tok // {CC_SEQ_LEN} AS first_seq,
                  (start_tok + n_tokens - 1) // {CC_SEQ_LEN} AS last_seq,
                  (start_tok + n_tokens - 1) // {CC_SEQ_LEN}
                    - start_tok // {CC_SEQ_LEN} + 1 AS n_seqs,
                  start_tok % {CC_SEQ_LEN} AS offset_in_seq
           FROM pre)
SELECT g.doc_id,
       g.doc_id // {CC_DOCS_PER_SHARD} AS cc_shard,
       CASE WHEN (g.doc_id // {CC_DOCS_PER_SHARD}) % 2 = 0
            THEN 'warc' ELSE 'warc.gz' END AS fmt,
       CASE g.doc_id % 3 WHEN 0 THEN 'identity'
                         WHEN 1 THEN 'chunked'
                         ELSE 'gzip' END AS http_enc,
       g.extracted_len, g.extracted_hash, g.n_words, g.gate_pass,
       p.doc_id IS NOT NULL AS kept,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       CAST(p.start_tok AS BIGINT) AS start_tok,
       CAST(p.first_seq AS BIGINT) AS first_seq,
       CAST(p.last_seq AS BIGINT) AS last_seq,
       CAST(p.n_seqs AS BIGINT) AS n_seqs,
       CAST(p.offset_in_seq AS BIGINT) AS offset_in_seq
FROM gated g LEFT JOIN packed p USING (doc_id)
"""
    )


PIPELINE_CC_INGEST_SQL = _cc_ingest_sql()

QUERIES = {
    "pipeline_cc_ingest": (pipeline_cc_ingest, PIPELINE_CC_INGEST_SQL),
}
