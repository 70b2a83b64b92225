"""Corpus-curation driver-contract queries (operators/curation.py):
repeated-span scrubbing, containment pairs, SemDeDup-style semantic
dedup, and sketch-accelerated exact heavy hitters — each with a
DuckDB-parity oracle.

Tokenization is the SimHash family's (lower → Python-parity trim →
split on runs of whitespace → drop empties); the SQL twin is the
identical regexp pipeline, so token positions, grams and counts match
exactly. All ratios are int/int double divisions and all emitted
doubles go through fround — hash-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.operators.curation import (
    containment_pairs,
    heavy_hitters_exact,
    semantic_dedup,
    span_scrub,
    token_bigram_relation,
)
from queryengine_spark.queries.base import t

#: span scrub: 5-token grams occurring in ≥3 distinct docs (the sf0.01
#: corpus has 74 such grams; real corpora use higher n / min_df)
SPAN_N = 5
SPAN_MIN_DF = 3
#: containment: near-superset threshold over rare shingles (same 10%
#: hot-shingle guard as dedup_ngram_jaccard, mirrored in the oracle)
CONT_THRESHOLD = 0.9
CONT_MAX_DF_RATIO = 0.1
#: semantic dedup shares the IVF coarse quantizer's constants —
#: aliases of queries/knn.py's so the oracle (which composes knn's
#: _ivf_cte) and the operator can never drift apart — and the
#: embedding family's contract threshold (queries/dedup.py::
#: COSINE_THRESHOLD rationale — non-empty on the isotropic synthetic
#: corpus; production uses ≥0.9)
from queryengine_spark.queries.knn import (  # noqa: E402
    DIM as SEM_DIM,
    KMEANS_ITERS as SEM_ITERS,
    N_CELLS as SEM_N_CELLS,
    SAMPLE_N as SEM_SAMPLE_N,
)

SEM_THRESHOLD = 0.35
#: heavy hitters: ε = 1/1000 of the token-bigram stream
HH_NUM = 1
HH_DEN = 1000

_TOKS_CTE = """
WITH d AS (SELECT doc_id AS id,
       list_filter(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+'),
                   t0 -> t0 <> '') AS toks
       FROM documents)
"""


def curation_span_scrub(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return span_scrub(d, "doc_id", "text", n=SPAN_N, min_df=SPAN_MIN_DF).select(
        F.col("id").alias("doc_id"), "n_tokens", "n_removed", "cleaned_text"
    )


CURATION_SPAN_SCRUB_SQL = (
    _TOKS_CTE
    + f""",
tok AS (SELECT id, CAST(t.i AS INT) AS p, toks[CAST(t.i AS INT)] AS tk
        FROM d, unnest(range(1, len(toks) + 1)) t(i)),
gr AS (SELECT id, CAST(t.i AS INT) AS s,
              array_to_string(list_slice(toks, CAST(t.i AS INT), CAST(t.i AS INT) + {SPAN_N - 1}), ' ') AS gram
       FROM d, unnest(range(1, len(toks) - {SPAN_N - 2})) t(i)
       WHERE len(toks) >= {SPAN_N}),
freq AS (SELECT gram FROM (SELECT gram, count(DISTINCT id) AS gdf FROM gr GROUP BY gram)
         WHERE gdf >= {SPAN_MIN_DF}),
cov AS (SELECT DISTINCT g.id, CAST(t.p AS INT) AS p
        FROM gr g JOIN freq f ON g.gram = f.gram, unnest(range(g.s, g.s + {SPAN_N})) t(p)),
kept AS (SELECT tok.id, tok.p, tok.tk FROM tok
         WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.id = tok.id AND c.p = tok.p)),
clean AS (SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
                 string_agg(tk, ' ' ORDER BY p) AS cleaned_text
          FROM kept GROUP BY id),
tot AS (SELECT id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d)
SELECT tot.id AS doc_id, tot.n_tokens,
       CAST(tot.n_tokens - COALESCE(clean.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(clean.cleaned_text, '') AS cleaned_text
FROM tot LEFT JOIN clean ON tot.id = clean.id
"""
)


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return containment_pairs(
        d, "doc_id", "text",
        n=3, threshold=CONT_THRESHOLD, max_df_ratio=CONT_MAX_DF_RATIO,
    ).select(
        "id_a", "id_b",
        fround("containment", 6).alias("containment"),
        fround("jaccard", 6).alias("jaccard"),
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH d AS (SELECT doc_id AS id, lower(text) AS tl FROM documents),
di AS (SELECT id, tl, unnest(range(1, length(tl) - 1)) AS i FROM d),
sh0 AS (SELECT DISTINCT id, substr(tl, CAST(i AS INT), 3) AS sh FROM di),
dfreq AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh),
sh AS (SELECT id, s.sh FROM sh0 s JOIN dfreq f ON s.sh = f.sh
       WHERE f.df <= {CONT_MAX_DF_RATIO} * (SELECT count(*) FROM documents)),
cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
shared AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS shared
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
           GROUP BY a.id, b.id)
SELECT id_a, id_b,
       floor(shared / least(ca.n_sh, cb.n_sh) * 1000000.0 + 0.5) / 1000000.0 AS containment,
       floor(shared / (ca.n_sh + cb.n_sh - shared) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM shared
JOIN cnt ca ON id_a = ca.id
JOIN cnt cb ON id_b = cb.id
WHERE shared / least(ca.n_sh, cb.n_sh) >= {CONT_THRESHOLD}
"""


def dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding",
        threshold=SEM_THRESHOLD, n_cells=SEM_N_CELLS,
        sample_n=SEM_SAMPLE_N, train_iters=SEM_ITERS, dim=SEM_DIM,
    ).select(F.col("id").alias("vec_id"), "cell", "is_dup")


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _sem_cells_cte() -> str:
    """Unrolled integer k-means + 1-probe cell assignment over ALL
    embeddings — literally queries/knn.py::_ivf_cte (one source of
    truth for the quantizer oracle; the SEM_* constants above are
    aliases of knn's), with the operator's wrong-dimension filter and
    without the query-side probing."""
    from queryengine_spark.queries.knn import _ivf_cte

    return _ivf_cte(dim_filter=True, include_qcells=False)


DEDUP_SEMANTIC_SQL = f"""{_sem_cells_cte()},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE {_COS.format(a='ea.v', b='eb.v')} >= {SEM_THRESHOLD}
),
dups AS (SELECT DISTINCT id_b FROM pairs)
SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
       CAST(CASE WHEN dup.id_b IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup
FROM cells c LEFT JOIN dups dup ON c.vec_id = dup.id_b
"""


def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    bigrams = token_bigram_relation(d, "doc_id", "text")
    return heavy_hitters_exact(bigrams, "term", HH_NUM, HH_DEN)


TEXT_HEAVY_HITTERS_SQL = (
    _TOKS_CTE
    + f""",
g AS (SELECT toks[CAST(t.i AS INT)] || ' ' || toks[CAST(t.i AS INT) + 1] AS term
      FROM d, unnest(range(1, len(toks))) t(i)
      WHERE len(toks) >= 2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM g),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY term)
SELECT term, cnt FROM c, tot WHERE cnt * {HH_DEN} >= {HH_NUM} * n_total
"""
)


QUERIES = {
    "curation_span_scrub": (curation_span_scrub, CURATION_SPAN_SCRUB_SQL),
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
    "text_heavy_hitters": (text_heavy_hitters, TEXT_HEAVY_HITTERS_SQL),
}


#: incremental dedup: history = 80% of the corpus (doc_id % 5 != 0),
#: today's batch = the remaining 20% — deterministic at every scale
HIST_MOD = 5


def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup FROM THE PERSISTED INDEX (r6 — the artifact
    story incremental_minhash_flags' docstring promised): the history
    partition's band buckets are built ONCE into a parquet artifact
    (operators/annindex.py::write_minhash_index — bucket relation
    partitioned by bucket-prefix, meta row carrying the hash
    parameters), and each run hashes only the NEW batch and flags it
    against the stored buckets. Output identical to the in-session
    formulation (history reduces to its distinct bucket set either
    way — parity pinned in tests/test_annindex.py), so the oracle is
    unchanged; the hash now additionally certifies the artifact
    write→read roundtrip. Build-once marker + corpus fingerprint,
    same discipline as knn_pq_index / knn_lsh_index."""
    import json
    import os

    from queryengine_spark.operators.annindex import (
        corpus_fingerprint,
        incremental_flags_from_index,
        read_minhash_index,
        write_minhash_index,
    )
    from queryengine_spark.queries.dedup import BAND_SIZE, N_HASHES

    d = t(spark, sf, "documents")
    path = f"/tmp/qe-mhindex-{os.path.basename(os.path.normpath(sf))}"
    params = dict(
        version=1, n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
        hist_mod=HIST_MOD,
        corpus=corpus_fingerprint(os.path.join(sf, "documents.parquet")),
    )
    marker = os.path.join(path, "BUILT.json")
    try:
        with open(marker) as f:
            need_build = json.load(f) != params
    except (OSError, ValueError):
        need_build = True
    if need_build:
        write_minhash_index(
            d.filter(F.col("doc_id") % HIST_MOD != 0), "doc_id", "text",
            path, n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3,
        )
        with open(marker, "w") as f:
            json.dump(params, f)
    idx = read_minhash_index(spark, path)
    batch = d.filter(F.col("doc_id") % HIST_MOD == 0)
    return incremental_flags_from_index(batch, idx, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "dup_of_history", "dup_in_batch"
    )


def _inc_sql() -> str:
    from queryengine_spark.queries.dedup import (
        _SHINGLE_CTE,
        BAND_SIZE,
        N_HASHES,
        sql_minhash_bands,
        sql_minhash_mins,
    )

    mins = sql_minhash_mins(N_HASHES)
    bands = sql_minhash_bands(N_HASHES, BAND_SIZE)
    return (
        _SHINGLE_CTE
        + f""",
sig AS (SELECT id,
   {mins}
   FROM sh GROUP BY id),
bk0 AS (
  {bands}
),
hist AS (SELECT DISTINCT bucket FROM bk0 WHERE id % {HIST_MOD} <> 0),
newb AS (SELECT id, bucket FROM bk0 WHERE id % {HIST_MOD} = 0),
dh AS (SELECT DISTINCT n.id FROM newb n
       WHERE EXISTS (SELECT 1 FROM hist h WHERE h.bucket = n.bucket)),
db AS (SELECT DISTINCT n.id FROM newb n
       JOIN newb m ON m.bucket = n.bucket AND m.id < n.id)
SELECT d.doc_id,
       CAST(CASE WHEN dh.id IS NULL THEN 0 ELSE 1 END AS INT) AS dup_of_history,
       CAST(CASE WHEN db.id IS NULL THEN 0 ELSE 1 END AS INT) AS dup_in_batch
FROM documents d
LEFT JOIN dh ON dh.id = d.doc_id
LEFT JOIN db ON db.id = d.doc_id
WHERE d.doc_id % {HIST_MOD} = 0
"""
    )


DEDUP_INCREMENTAL_SQL = _inc_sql()


#: planted decomposed sequences: 'e'+U+0301 → é, 'A'+U+030A → Å under
#: NFC; the precomposed 'é' and 'ß' must pass through unchanged
#: (canonical, not compatibility, normalization)
_NFC_SUFFIX = " café Å café straße"


def text_unicode_normalize(spark: SparkSession, sf: str) -> DataFrame:
    from queryengine_spark.operators.curation import nfc_normalize_udf

    d = t(spark, sf, "documents")
    raw = F.concat(F.col("text"), F.lit(_NFC_SUFFIX))
    nfc = nfc_normalize_udf()
    return d.select(
        "doc_id",
        nfc(raw).alias("norm_text"),
        F.length(raw).cast("bigint").alias("chars_before"),
        F.length(nfc(raw)).cast("bigint").alias("chars_after"),
    )


TEXT_UNICODE_NORMALIZE_SQL = f"""
SELECT doc_id,
       nfc_normalize(text || '{_NFC_SUFFIX}') AS norm_text,
       CAST(length(text || '{_NFC_SUFFIX}') AS BIGINT) AS chars_before,
       CAST(length(nfc_normalize(text || '{_NFC_SUFFIX}')) AS BIGINT) AS chars_after
FROM documents
"""

QUERIES.update(
    {
        "dedup_incremental": (dedup_incremental, DEDUP_INCREMENTAL_SQL),
        "text_unicode_normalize": (text_unicode_normalize, TEXT_UNICODE_NORMALIZE_SQL),
    }
)


#: hashed-feature classifier: 2^16 buckets, teacher weights in ±1000,
#: confident-label dead zone |score| ≥ 100, 4 unrolled perceptron iters
CLS_BUCKETS = 65536
CLS_SPAN = 1000
CLS_TAU = 100
CLS_ITERS = 4


def text_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-feature quality classifier with TRAINED weights (r7 —
    the md5 weight table is now the planted TEACHER generating
    ground-truth labels, and the served weights come from a real
    distributed batch-perceptron fit on the confident labels;
    operators/curation.py::trained_feature_classifier). The oracle
    unrolls the integer training iterations like the k-means oracles,
    so the hash certifies the feature hashing, the teacher labels,
    every training update AND the final broadcast-join scoring."""
    from queryengine_spark.operators.curation import trained_feature_classifier

    d = t(spark, sf, "documents")
    return trained_feature_classifier(
        d, "doc_id", "text",
        n_buckets=CLS_BUCKETS, weight_span=CLS_SPAN,
        tau=CLS_TAU, iters=CLS_ITERS,
    ).select(
        F.col("id").alias("doc_id"),
        "n_feats", "margin", "score", "label",
        "confident", "trained_margin", "trained_label", "agree",
    )


def _quality_classifier_sql() -> str:
    """Unrolled-iteration oracle: teacher CTEs (unchanged semantics),
    then w1..wN / m1..mN replaying the batch-perceptron recurrence
    w_{t+1} = w_t + Σ_{i : y_i·(w_t·x_i) ≤ 0, confident} y_i·x_i in
    exact BIGINT."""
    head = (
        _TOKS_CTE
        + f""",
uni AS (SELECT id, unnest(toks) AS feat FROM d),
bi AS (SELECT id, toks[CAST(t.i AS INT)] || ' ' || toks[CAST(t.i AS INT) + 1] AS feat
       FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
feats AS (SELECT id, feat FROM uni UNION ALL SELECT id, feat FROM bi),
fb AS (SELECT id,
              (('0x' || substr(md5(feat), 1, 4))::BIGINT) % {CLS_BUCKETS} AS bucket,
              CAST(count(*) AS BIGINT) AS c
       FROM feats GROUP BY 1, 2),
doc AS (SELECT id, CAST(SUM(c) AS BIGINT) AS n_feats,
               CAST(SUM(c * ((('0x' || substr(md5('w:' || bucket::VARCHAR), 1, 4))::BIGINT
                              % {2 * CLS_SPAN + 1}) - {CLS_SPAN})) AS BIGINT) AS margin
        FROM fb GROUP BY id),
lab AS (SELECT id, n_feats, margin,
               CASE WHEN margin >= 0 THEN 1 ELSE -1 END AS y,
               CASE WHEN abs(margin) >= {CLS_TAU} * n_feats THEN 1 ELSE 0 END AS confident
        FROM doc),
-- iteration 1: w0 = 0, every confident doc is misclassified
w1 AS (SELECT f.bucket, CAST(SUM(l.y * f.c) AS BIGINT) AS w
       FROM fb f JOIN lab l USING (id) WHERE l.confident = 1 GROUP BY f.bucket)"""
    )
    parts = [head]
    prev = "w1"
    for it in range(2, CLS_ITERS + 1):
        parts.append(f""",
m{it - 1} AS (SELECT f.id, CAST(SUM(f.c * w.w) AS BIGINT) AS m
       FROM fb f JOIN {prev} w USING (bucket) GROUP BY f.id),
u{it} AS (SELECT f.bucket, CAST(SUM(l.y * f.c) AS BIGINT) AS dw
       FROM fb f JOIN lab l USING (id) LEFT JOIN m{it - 1} mm ON mm.id = f.id
       WHERE l.confident = 1 AND l.y * COALESCE(mm.m, 0) <= 0
       GROUP BY f.bucket),
w{it} AS (SELECT COALESCE(w.bucket, u.bucket) AS bucket,
               CAST(COALESCE(w.w, 0) + COALESCE(u.dw, 0) AS BIGINT) AS w
       FROM {prev} w FULL JOIN u{it} u ON w.bucket = u.bucket)""")
        prev = f"w{it}"
    parts.append(f""",
mf AS (SELECT f.id, CAST(SUM(f.c * w.w) AS BIGINT) AS m
       FROM fb f JOIN {prev} w USING (bucket) GROUP BY f.id)
SELECT l.id AS doc_id, l.n_feats, l.margin,
       l.margin / l.n_feats AS score,
       CAST(CASE WHEN l.margin / l.n_feats >= 0 THEN 1 ELSE 0 END AS INT) AS label,
       CAST(l.confident AS INT) AS confident,
       CAST(COALESCE(mf.m, 0) AS BIGINT) AS trained_margin,
       CAST(CASE WHEN COALESCE(mf.m, 0) >= 0 THEN 1 ELSE 0 END AS INT) AS trained_label,
       CAST(CASE WHEN (COALESCE(mf.m, 0) >= 0) = (l.margin >= 0)
            THEN 1 ELSE 0 END AS INT) AS agree
FROM lab l LEFT JOIN mf ON mf.id = l.id""")
    return "".join(parts)


TEXT_QUALITY_CLASSIFIER_SQL = _quality_classifier_sql()

QUERIES.update(
    {
        "text_quality_classifier": (
            text_quality_classifier,
            TEXT_QUALITY_CLASSIFIER_SQL,
        ),
    }
)


#: BPE: merges trained on the 256 smallest-id docs, 200 merge rounds
BPE_SAMPLE_N = 256
BPE_MERGES = 200


def text_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Train-on-sample + distributed-apply BPE (functions/bpe.py).
    Oracle: the merge table is trained by the shared bounded-sample
    trainer, and the APPLY stage is re-derived independently in
    DuckDB as a recursive CTE (see ``_bpe_oracle_sql``); pytest
    additionally pins the encoder against an independent quadratic
    reference implementation and round-trip/boundary properties."""
    from queryengine_spark.functions.bpe import bpe_encode_udf, bpe_train_on_sample
    from queryengine_spark.functions.text import tokenize_ws

    d = t(spark, sf, "documents")
    merges = bpe_train_on_sample(d, "doc_id", "text", BPE_SAMPLE_N, BPE_MERGES)
    enc = bpe_encode_udf(merges)
    toks = tokenize_ws(F.lower(F.col("text")))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(enc(toks)).cast("bigint").alias("n_subwords"),
        F.array_join(F.slice(enc(toks), 1, 12), " ").alias("head_subwords"),
    )


_BPE_SQL_CACHE: dict[str, str] = {}

#: sentinel rank for "pair is not a merge" — larger than any real rank
_BPE_NO_MERGE = 1_000_000


def _bpe_oracle_sql() -> str:
    """LAZY oracle builder for text_bpe_tokenize (resolved by
    ``all_oracle_sql()``, never by ``queries()``/bench).

    Split of responsibilities, mirroring the IVF-centroid oracles:
    the merge TABLE is trained once by the shared pure-Python trainer
    (``bpe_train`` — exact integer pair counts over the 256
    smallest-id docs, deterministic tie-breaks) from tokens that
    DUCKDB tokenizes out of the oracle corpus, then the heavy
    distributed stage — per-word lowest-rank-first merge application
    across the whole table — is re-derived INDEPENDENTLY in SQL as a
    recursive CTE (one step = merge the leftmost lowest-rank adjacent
    pair; a word leaves the recursion when no pair is in the merge
    map). Spark's Arrow-UDF apply and tokenizer are therefore fully
    cross-engine-checked; only the bounded-sample trainer is shared.

    The corpus the merges are trained from is the one the DRIVER
    oracles at (``/root/testdata/sf0.01``); local replication at
    another sf sets SPARK_GRAFT_ORACLE_SF_DIR (test_entry_contract
    pins it to its own sf_dir). Merge-map keys join the symbol pair
    with chr(1), which the corpus is verified not to contain.
    """
    import os

    import duckdb

    from queryengine_spark.functions.bpe import EOW, bpe_train
    from queryengine_spark.queries.textstats import _TOKS

    sf = (
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
        or os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
        or "/root/testdata/sf0.01"
    )
    if sf in _BPE_SQL_CACHE:
        return _BPE_SQL_CACHE[sf]
    toks_expr = _TOKS.format(c="lower(text)")
    con = duckdb.connect()
    try:
        rows = con.sql(
            f"SELECT {toks_expr} AS toks FROM '{sf}/documents.parquet' "
            f"ORDER BY doc_id LIMIT {BPE_SAMPLE_N}"
        ).fetchall()
    finally:
        con.close()
    words: dict[str, int] = {}
    for (toks,) in rows:
        for w in toks:
            words[w] = words.get(w, 0) + 1
    merges = bpe_train(words, BPE_MERGES)
    assert merges, "BPE training produced no merges — corpus too small"

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    mm = "MAP{" + ", ".join(
        f"{lit(a)} || chr(1) || {lit(b)}: {rank}"
        for rank, (a, b) in enumerate(merges)
    ) + "}"
    big = _BPE_NO_MERGE
    rks = (
        f"list_transform(range(1, CAST(len(syms) AS BIGINT)), "
        f"i -> coalesce(map_extract({mm}, syms[CAST(i AS INT)] || chr(1) "
        f"|| syms[CAST(i AS INT)+1])[1], {big}))"
    )
    sql = f"""
WITH RECURSIVE
d AS (SELECT doc_id AS id, {toks_expr} AS toks FROM documents),
tok AS (SELECT id, CAST(t.i AS INT) AS pos, toks[CAST(t.i AS INT)] AS w
        FROM d, unnest(range(1, CAST(len(toks) AS BIGINT) + 1)) t(i)),
words AS (SELECT DISTINCT w FROM tok),
enc(w, syms) AS (
  SELECT w, list_append(string_split(w, ''), '{EOW}') FROM words
  UNION ALL
  SELECT w, list_concat(list_concat(syms[1:bi-1], [syms[bi] || syms[bi+1]]),
                        syms[bi+2:len(syms)])
  FROM (SELECT w, syms, list_position(rks, list_min(rks)) AS bi,
               list_min(rks) AS br
        FROM (SELECT w, syms, {rks} AS rks FROM enc) s0) s1
  WHERE br < {big}
),
final AS (SELECT w, syms FROM enc
          WHERE {big} = list_min(list_append({rks}, {big}))),
agg AS (SELECT t.id, CAST(sum(len(f.syms)) AS BIGINT) AS n_subwords,
               flatten(list(f.syms ORDER BY t.pos)) AS subs
        FROM tok t JOIN final f ON t.w = f.w
        GROUP BY t.id)
SELECT d.id AS doc_id,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       COALESCE(a.n_subwords, 0) AS n_subwords,
       COALESCE(array_to_string(a.subs[1:12], ' '), '') AS head_subwords
FROM d LEFT JOIN agg a ON d.id = a.id
"""
    _BPE_SQL_CACHE[sf] = sql
    return sql


QUERIES.update({"text_bpe_tokenize": (text_bpe_tokenize, _bpe_oracle_sql)})


#: temperature-weighted sampling: targets ∝ n_source^0.5 (α = 0.5 —
#: the standard multilingual/up-weighting trick: hot sources are
#: down-weighted, rare sources up-weighted, relative to proportional)
TEMP_K_TOTAL = 100


def pipeline_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source mixing: per-source sample targets
    ∝ sqrt(n_source), drawn as the target_n smallest-md5 docs per
    source — fully deterministic/replayable (no random()), exact
    integer target arithmetic (floor-scaled sqrt weights; ceil
    division in the exact-integer form both engines evaluate
    identically). One shuffle on source; WindowGroupLimit bounds
    per-key state."""
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_source"))
    w = F.floor(F.sqrt(F.col("n_source")) * F.lit(10000.0)).cast("bigint")
    weights = counts.withColumn("w", w)
    tot = weights.agg(F.sum("w").cast("bigint").alias("tw"))
    a = F.lit(TEMP_K_TOTAL) * F.col("w") + F.col("tw") - F.lit(1)
    targets = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn("target_n", ((a - a % F.col("tw")) / F.col("tw")).cast("bigint"))
        .select("source", "n_source", "target_n")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    win = Window.partitionBy("source").orderBy(h.asc())
    ranked = d.withColumn("rank", F.row_number().over(win).cast("int"))
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rank") <= F.col("target_n"))
        .select("source", "doc_id", "rank", "n_source", "target_n")
    )


PIPELINE_TEMPERATURE_MIX_SQL = f"""
WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_source
                FROM documents GROUP BY source),
wts AS (SELECT source, n_source,
               CAST(floor(sqrt(n_source) * 10000.0) AS BIGINT) AS w
        FROM counts),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wts),
targets AS (SELECT source, n_source,
            CAST((({TEMP_K_TOTAL} * w + tw - 1) - (({TEMP_K_TOTAL} * w + tw - 1) % tw)) / tw AS BIGINT) AS target_n
            FROM wts, tot),
ranked AS (SELECT source, doc_id,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC) AS INT) AS rank
           FROM documents)
SELECT r.source, r.doc_id, r.rank, t.n_source, t.target_n
FROM ranked r JOIN targets t ON r.source = t.source
WHERE r.rank <= t.target_n
"""

QUERIES.update(
    {
        "pipeline_temperature_mix": (
            pipeline_temperature_mix,
            PIPELINE_TEMPERATURE_MIX_SQL,
        ),
    }
)


#: leakage-safe split: 20% validation, keyed by near-dup COMPONENT
VAL_FRACTION = 0.2


def pipeline_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates across
    the boundary: the split key is the doc's near-dup CLUSTER
    (MinHash star edges → connected components), not the doc — every
    member of a component lands on the same side, so eval can never
    contain a near-copy of a training doc. Split selection is the
    replayable hash-fraction (no random()); the oracle reuses the
    recursive-CTE component computation plus the same fixed-order
    hash-fraction arithmetic.

    Output: (doc_id, component, split) for every document.
    """
    from queryengine_spark.functions.sketches import hash_fraction
    from queryengine_spark.operators.dedup import (
        connected_components,
        minhash_lsh_star_edges,
    )
    from queryengine_spark.queries.dedup import BAND_SIZE, N_HASHES

    docs = t(spark, sf, "documents")
    pairs = minhash_lsh_star_edges(
        docs, "doc_id", "text", n_hashes=N_HASHES, band_size=BAND_SIZE, shingle_n=3
    )
    labels = connected_components(
        docs.select(F.col("doc_id").alias("id")), pairs, max_iterations=30
    )
    u = hash_fraction("md5(CAST(component AS STRING))")
    return labels.select(
        F.col("id").alias("doc_id"),
        "component",
        F.when(u < F.lit(VAL_FRACTION), F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def _leakage_split_sql() -> str:
    from queryengine_spark.functions.sketches import sql_hash_fraction
    from queryengine_spark.queries.dedup import _CANON_CTES

    u = sql_hash_fraction("md5(CAST(component AS VARCHAR))")
    return f"""{_CANON_CTES},
labels AS (SELECT wid AS doc_id, MIN(label) AS component FROM walk GROUP BY wid)
SELECT doc_id, component,
       CASE WHEN ({u}) < {VAL_FRACTION} THEN 'val' ELSE 'train' END AS split
FROM labels
"""


QUERIES["pipeline_leakage_safe_split"] = (
    pipeline_leakage_safe_split,
    _leakage_split_sql(),
)


#: intra-doc scrub: trigram granularity (the synthetic docs repeat
#: short phrases heavily; real corpora use larger n)
INTRA_N = 3


def curation_intradoc_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from queryengine_spark.operators.curation import intradoc_dedup_spans

    d = t(spark, sf, "documents")
    return intradoc_dedup_spans(d, "doc_id", "text", n=INTRA_N).select(
        F.col("id").alias("doc_id"), "n_tokens", "n_removed", "cleaned_text"
    )


CURATION_INTRADOC_SCRUB_SQL = (
    _TOKS_CTE
    + f""",
tok AS (SELECT id, CAST(t.i AS INT) AS p, toks[CAST(t.i AS INT)] AS tk
        FROM d, unnest(range(1, len(toks) + 1)) t(i)),
gr AS (SELECT id, CAST(t.i AS INT) AS s,
              array_to_string(list_slice(toks, CAST(t.i AS INT), CAST(t.i AS INT) + {INTRA_N - 1}), ' ') AS gram
       FROM d, unnest(range(1, len(toks) - {INTRA_N - 2})) t(i)
       WHERE len(toks) >= {INTRA_N}),
rep AS (SELECT id, s FROM (
         SELECT id, s, row_number() OVER (PARTITION BY id, gram ORDER BY s ASC) AS occ
         FROM gr) WHERE occ > 1),
cov AS (SELECT DISTINCT r.id, CAST(t.p AS INT) AS p
        FROM rep r, unnest(range(r.s, r.s + {INTRA_N})) t(p)),
kept AS (SELECT tok.id, tok.p, tok.tk FROM tok
         WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.id = tok.id AND c.p = tok.p)),
clean AS (SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
                 string_agg(tk, ' ' ORDER BY p) AS cleaned_text
          FROM kept GROUP BY id),
tot AS (SELECT id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d)
SELECT tot.id AS doc_id, tot.n_tokens,
       CAST(tot.n_tokens - COALESCE(clean.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(clean.cleaned_text, '') AS cleaned_text
FROM tot LEFT JOIN clean ON tot.id = clean.id
"""
)

QUERIES["curation_intradoc_scrub"] = (
    curation_intradoc_scrub,
    CURATION_INTRADOC_SCRUB_SQL,
)
