"""Text-analysis driver-contract queries over ``documents``:
token counts, quality scores, heuristic language ID, content
fingerprints — each a single JVM-side projection/aggregation pass
with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark import textstats as ts
from queryengine_spark.queries.base import fround, t

# DuckDB-side token array matching functions.text.tokenize_ws exactly:
# split on whitespace runs AND drop empty tokens (tokenize_ws filters
# them; without the filter an empty/whitespace-only text would yield
# [''] = 1 token in DuckDB vs [] = 0 in Spark)
_TOKS = (
    "list_filter(string_split_regex(regexp_replace({c}, '^\\s+|\\s+$', '', 'g'),"
    " '\\s+'), t0 -> t0 <> '')"
)
_TOKS_LOW = _TOKS.format(c="lower(text)")


def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        ts.token_count("text").alias("n_tokens"),
        ts.bpe_token_count("text").alias("n_bpe_tokens"),
        ts.char_count("text").alias("n_chars_actual"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{ts.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
"""


def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        ts.punct_ratio("text").alias("punct_ratio"),
        ts.stopword_ratio("text").alias("stopword_ratio"),
        ts.avg_token_len("text").alias("avg_token_len"),
    )


_STOP_LIST = ", ".join(f"'{w}'" for w in ts.STOPWORDS)

def _fr6(x: str) -> str:
    return f"floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


QUALITY_SQL = f"""
SELECT doc_id,
       {_fr6(f"(length(text) - length(regexp_replace(text, '{ts.PUNCT_CLASS}', '', 'g'))) / length(text)")} AS punct_ratio,
       {_fr6(f"len(list_filter({_TOKS_LOW}, x -> x IN ({_STOP_LIST}))) / len({_TOKS_LOW})")} AS stopword_ratio,
       {_fr6(f"list_sum(list_transform({_TOKS.format(c='text')}, x -> length(x))) / len({_TOKS.format(c='text')})")} AS avg_token_len
FROM documents
"""


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    scores = ts.lang_scores("text")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        ts.lang_id("text").alias("lang_pred"),
        *[scores[lang].alias(f"score_{lang}") for lang in ("en", "de", "fr", "es")],
    )


def _lang_sql() -> str:
    score_exprs = {
        lang: (
            f"CAST(len(list_filter({_TOKS_LOW}, "
            f"x -> x IN ({', '.join(repr(m) for m in markers)}))) AS BIGINT)"
        )
        for lang, markers in ts.LANG_MARKERS.items()
    }
    s = {k: f"score_{k}" for k in score_exprs}
    cols = ",\n       ".join(f"{e} AS score_{k}" for k, e in score_exprs.items())
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_declared,
       {cols}
  FROM documents
)
SELECT doc_id, lang_declared,
       CASE WHEN {s['en']} + {s['de']} + {s['fr']} + {s['es']} = 0 THEN 'und'
            WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} >= {s['es']} THEN 'en'
            WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']} THEN 'de'
            WHEN {s['fr']} >= {s['es']} THEN 'fr'
            ELSE 'es' END AS lang_pred,
       score_en, score_de, score_fr, score_es
FROM scored
"""


LANG_SQL = _lang_sql()


def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", ts.content_fingerprint("text").alias("fingerprint")
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS_LOW})), ' ')) AS fingerprint
FROM documents
"""


def text_doc_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text-analysis card in ONE map-side scan: token
    counts (whitespace + BPE-ish regex), quality ratios, heuristic
    language ID with per-language marker scores, and the content
    fingerprint.

    Round-5 fold of the four r1 contract queries text_token_stats /
    text_quality_scores / text_lang_id / text_fingerprint — the
    SAME kernels (queryengine_spark/textstats), now emitted as one
    relation so the certification window covers them in one row with
    zero coverage loss: every kernel's column feeds the hash. At
    scale this is strictly better than four queries — one pass over
    the corpus instead of four."""
    d = t(spark, sf, "documents")
    scores = ts.lang_scores("text")
    return d.select(
        "doc_id",
        ts.token_count("text").alias("n_tokens"),
        ts.bpe_token_count("text").alias("n_bpe_tokens"),
        ts.char_count("text").alias("n_chars_actual"),
        ts.punct_ratio("text").alias("punct_ratio"),
        ts.stopword_ratio("text").alias("stopword_ratio"),
        ts.avg_token_len("text").alias("avg_token_len"),
        F.col("lang").alias("lang_declared"),
        ts.lang_id("text").alias("lang_pred"),
        *[scores[lang].alias(f"score_{lang}") for lang in ("en", "de", "fr", "es")],
        ts.content_fingerprint("text").alias("fingerprint"),
    )


def _doc_profile_sql() -> str:
    score_exprs = {
        lang: (
            f"CAST(len(list_filter({_TOKS_LOW}, "
            f"x -> x IN ({', '.join(repr(m) for m in markers)}))) AS BIGINT)"
        )
        for lang, markers in ts.LANG_MARKERS.items()
    }
    s = {k: f"score_{k}" for k in score_exprs}
    cols = ",\n       ".join(f"{e} AS score_{k}" for k, e in score_exprs.items())
    return f"""
WITH scored AS (
  SELECT doc_id, text, lang AS lang_declared,
       {cols}
  FROM documents
)
SELECT doc_id,
       CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{ts.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       {_fr6(f"(length(text) - length(regexp_replace(text, '{ts.PUNCT_CLASS}', '', 'g'))) / length(text)")} AS punct_ratio,
       {_fr6(f"len(list_filter({_TOKS_LOW}, x -> x IN ({_STOP_LIST}))) / len({_TOKS_LOW})")} AS stopword_ratio,
       {_fr6(f"list_sum(list_transform({_TOKS.format(c='text')}, x -> length(x))) / len({_TOKS.format(c='text')})")} AS avg_token_len,
       lang_declared,
       CASE WHEN {s['en']} + {s['de']} + {s['fr']} + {s['es']} = 0 THEN 'und'
            WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} >= {s['es']} THEN 'en'
            WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']} THEN 'de'
            WHEN {s['fr']} >= {s['es']} THEN 'fr'
            ELSE 'es' END AS lang_pred,
       score_en, score_de, score_fr, score_es,
       md5(array_to_string(list_sort(list_distinct({_TOKS_LOW})), ' ')) AS fingerprint
FROM scored
"""


DOC_PROFILE_SQL = _doc_profile_sql()


def pipeline_clean_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The composed training-data shape: quality-filter → fingerprint
    dedup (keep lowest doc_id per canonical content) → per-language
    corpus stats. One declarative plan; every stage is an operator
    from this package."""
    d = t(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        ts.token_count("text").alias("n_tokens"),
        ts.stopword_ratio("text").alias("stop_ratio"),
        ts.content_fingerprint("text").alias("fp"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("stop_ratio") <= 0.5))
    deduped = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


PIPELINE_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS n_tokens,
         {_fr6(f"len(list_filter({_TOKS_LOW}, x -> x IN ({_STOP_LIST}))) / len({_TOKS_LOW})")} AS stop_ratio,
         md5(array_to_string(list_sort(list_distinct({_TOKS_LOW})), ' ')) AS fp
  FROM documents
),
filtered AS (SELECT * FROM scored WHERE n_tokens >= 20 AND stop_ratio <= 0.5),
deduped AS (
  SELECT * FROM filtered
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) = 1
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM deduped GROUP BY lang
"""


def text_term_frequency(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus term frequencies: top-10 tokens per language by
    (count DESC, token ASC) — explode → two-level aggregation →
    grouped top-k (WindowGroupLimit)."""
    from queryengine_spark.functions.text import tokenize_ws
    from queryengine_spark.plans import spread

    d = spread(t(spark, sf, "documents"))
    tok = d.select("lang", F.explode(tokenize_ws(F.lower(F.col("text")))).alias("tk"))
    counts = tok.groupBy("lang", "tk").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tk").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("lang", "tk", "n", "rank")
    )


TERM_FREQ_SQL = f"""
WITH tok AS (
  SELECT lang, unnest({_TOKS_LOW}) AS tk FROM documents
),
counts AS (SELECT lang, tk, COUNT(*) AS n FROM tok GROUP BY lang, tk)
SELECT lang, tk, n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tk ASC) AS INT) AS rank
FROM counts
QUALIFY rank <= 10
"""


def text_kmv_distinct_shingles(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct-count sketch (functions/sketches.py): estimated
    distinct 3-gram shingles per language next to the exact count —
    the mergeable-sketch path for distinct counts at corpus scale."""
    from queryengine_spark.functions.sketches import kmv_distinct_estimate
    from queryengine_spark.functions.text import char_ngrams
    from queryengine_spark.plans import spread

    d = spread(t(spark, sf, "documents"))
    sh = d.select(
        "lang",
        F.explode(F.array_distinct(char_ngrams(F.lower(F.col("text")), 3))).alias("sh"),
    )
    est = kmv_distinct_estimate(sh, "lang", "sh", k=64)
    exact = sh.select("lang", "sh").distinct().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return est.join(exact, "lang")


def _kmv_sql() -> str:
    from queryengine_spark.functions.sketches import sql_hash_fraction

    frac = sql_hash_fraction("h")
    return f"""
WITH d AS (SELECT lang, lower(text) AS tl FROM documents),
di AS (SELECT lang, tl, unnest(range(1, length(tl) - 1)) AS i FROM d),
sh AS (SELECT DISTINCT lang, substr(tl, CAST(i AS INT), 3) AS sh FROM di),
hashed AS (SELECT DISTINCT lang, md5(sh) AS h FROM sh),
ranked AS (SELECT lang, h,
                  row_number() OVER (PARTITION BY lang ORDER BY h ASC) AS rn
           FROM hashed),
stats AS (SELECT lang, COUNT(*) AS n_distinct,
                 MIN(CASE WHEN rn = 64 THEN {frac} END) AS kth_frac
          FROM ranked GROUP BY lang)
SELECT lang,
       floor((CASE WHEN n_distinct < 64 THEN CAST(n_distinct AS DOUBLE)
                   ELSE 63.0 / kth_frac END) * 10000.0 + 0.5) / 10000.0 AS kmv_estimate,
       n_distinct AS n_exact
FROM stats
"""


KMV_SQL = _kmv_sql()


def text_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per document by linearized TF-IDF:
    score = tf · N / df, computed as one IEEE division of two exact
    integers (correctly-rounded → bit-identical in any engine; a
    log-idf would hang parity on each engine's non-correctly-rounded
    ln). Shape: explode → (doc, term) counts → term doc-frequencies →
    broadcast both small sides back, grouped top-k."""
    from queryengine_spark.functions.text import tokenize_ws
    from queryengine_spark.plans import spread

    d = spread(t(spark, sf, "documents"))
    tok = d.select(
        "doc_id", F.explode(tokenize_ws(F.lower(F.col("text")))).alias("tk")
    )
    # tf feeds both the doc-frequency aggregation and the scored join;
    # checkpoint so the explode+count runs once
    tf = (
        tok.groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "tk")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", (F.col("tf") * F.col("n_docs")) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tk").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "tk", "tf", "df", fround("score", 6).alias("score"), "rank")
    )


TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_LOW}) AS tk FROM documents
),
tf AS (SELECT doc_id, tk, COUNT(*) AS tf FROM tok GROUP BY doc_id, tk),
dfreq AS (SELECT tk, COUNT(*) AS df FROM tf GROUP BY tk),
scored AS (
  SELECT t.doc_id, t.tk, CAST(t.tf AS BIGINT) AS tf, CAST(f.df AS BIGINT) AS df,
         (t.tf * (SELECT COUNT(*) FROM documents)) / f.df AS score
  FROM tf t JOIN dfreq f ON t.tk = f.tk
)
SELECT doc_id, tk, tf, df,
       floor(score * 1000000.0 + 0.5) / 1000000.0 AS score,
       CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, tk ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= 3
"""


#: RAG chunking geometry (r6) — 32-token windows, stride 24 (8-token
#: overlap), the shape retrieval pipelines feed to embedders
RAG_CHUNK, RAG_STRIDE = 32, 24


def text_chunk_rag(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (r6) — the document→chunk
    explosion every RAG / embedding pipeline runs before the encoder:
    whitespace tokens (the shared tokenize_ws contract), windows of
    RAG_CHUNK tokens at RAG_STRIDE, where the LAST window is the
    first one reaching the end (chunk count = 1 + ceil((n−C)/S) for
    n > C, one chunk otherwise — no trailing runt windows fully
    contained in their predecessor). One row per chunk with its token
    span and an md5-derived 60-bit content hash, so the oracle
    certifies every chunk BOUNDARY and every chunk's exact text, not
    just counts. Pure JVM (split/slice/posexplode — zero UDF);
    map-side except the explode, which is row-local."""
    from queryengine_spark.functions.text import tokenize_ws

    C, S = RAG_CHUNK, RAG_STRIDE
    return (
        t(spark, sf, "documents")
        .select("doc_id", tokenize_ws(F.col("text")).alias("toks"))
        .withColumn("n_toks", F.size("toks").cast("bigint"))
        .filter(F.col("n_toks") > 0)
        .withColumn(
            "k",
            F.when(
                F.col("n_toks") > C, F.expr(f"(n_toks - {C} + {S} - 1) div {S}")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("k"))).alias(
                "chunk_idx"
            ),
        )
        .withColumn("start_tok", F.col("chunk_idx") * S)
        .withColumn(
            "chunk", F.slice("toks", (F.col("start_tok") + 1).cast("int"), C)
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("start_tok").cast("bigint").alias("start_tok"),
            F.size("chunk").cast("int").alias("n_tok"),
            F.conv(
                F.substring(F.md5(F.array_join("chunk", " ")), 1, 15), 16, 10
            )
            .cast("bigint")
            .alias("chunk_hash"),
        )
    )


TEXT_CHUNK_RAG_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKS.format(c="text")} AS toks FROM documents),
n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks
      FROM d WHERE len(toks) > 0),
ks AS (SELECT doc_id, toks, n_toks,
              CASE WHEN n_toks > {RAG_CHUNK}
                   THEN (n_toks - {RAG_CHUNK} + {RAG_STRIDE} - 1) // {RAG_STRIDE}
                   ELSE 0 END AS k
       FROM n),
ch AS (SELECT doc_id,
              CAST(ci.i AS BIGINT) AS chunk_idx,
              CAST(ci.i AS BIGINT) * {RAG_STRIDE} AS start_tok,
              toks[CAST(ci.i AS BIGINT) * {RAG_STRIDE} + 1
                   : CAST(ci.i AS BIGINT) * {RAG_STRIDE} + {RAG_CHUNK}] AS chunk
       FROM ks, unnest(range(0, k + 1)) ci(i))
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(chunk) AS INT) AS n_tok,
       ('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15))::BIGINT AS chunk_hash
FROM ch
"""


QUERIES = {
    # r5 fold: text_token_stats + text_quality_scores + text_lang_id
    # + text_fingerprint are ONE per-doc scan now (text_doc_profile);
    # the standalone callables above remain for direct use/tests.
    "text_doc_profile": (text_doc_profile, DOC_PROFILE_SQL),
    "text_chunk_rag": (text_chunk_rag, TEXT_CHUNK_RAG_SQL),
    "text_term_frequency": (text_term_frequency, TERM_FREQ_SQL),
    "text_tfidf_top_terms": (text_tfidf_top_terms, TFIDF_SQL),
    "text_kmv_distinct_shingles": (text_kmv_distinct_shingles, KMV_SQL),
    "pipeline_clean_corpus": (pipeline_clean_corpus, PIPELINE_SQL),
}
