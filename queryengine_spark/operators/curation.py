"""Corpus-curation operators beyond pairwise dedup: repeated-span
scrubbing, containment (near-superset) detection, semantic dedup over
embeddings, and sketch-accelerated exact heavy hitters.

Reference scope note: the reference engine
(/root/reference/src/heurFuzz.py) has no corpus-curation surface —
these are north-star LLM-training-pipeline operators (BASELINE.json)
composed from the same Spark primitives as the dedup family
(operators/dedup.py). Public-algorithm citations in each docstring.

Engine-portability discipline matches operators/dedup.py: md5 is the
shared hash, all counts are exact integers, all threshold compares
are either integer-exact or bit-exact IEEE doubles — so every
operator here has a DuckDB-oracle twin in queries/curation.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.operators.dedup import _bucket_cosine_pairs
from queryengine_spark.operators.knn import (
    ivf_cells_int_udf,
    kmeans_centroids_int,
)
from queryengine_spark.plans import spread


def _token_relation(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) with toks = whitespace tokens of lower(text) —
    the shared tokenization of the SimHash family (exact twin of the
    oracle's regexp split)."""
    toks = tokenize_ws(F.lower(F.col(text_col)))
    return spread(df).select(F.col(id_col).alias("id"), toks.alias("toks"))


def token_ngrams(toks: Column, n: int) -> Column:
    """Space-joined token n-grams of an array<string> column; empty
    array when the doc has fewer than ``n`` tokens (guards Spark's
    descending-``sequence`` surprise for start > stop)."""
    starts = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def span_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Cross-document repeated-span scrubbing: remove every token
    covered by a token ``n``-gram that occurs in ≥ ``min_df`` distinct
    documents, and reassemble each document from its surviving tokens
    in order (exact-substring dedup at n-gram granularity, after Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — the Spark-relational formulation replaces their suffix
    array with an inverted n-gram join).

    Scale shape: one token explode (linear ×1), one gram explode
    (linear ×1), a gram-df aggregation with map-side combine, a
    broadcast join against the (small, df-guarded) frequent-gram set,
    a covered-position explode bounded by n × frequent-gram
    occurrences, and one per-doc ordered reassembly agg. No self-join,
    nothing quadratic; every stage keys on doc id or gram hash.

    Output: (id, n_tokens, n_removed, cleaned_text) — one row per
    input document, including untouched ones.
    """
    base = _token_relation(df, id_col, text_col).localCheckpoint(eager=False)
    tok = base.select(
        "id", F.posexplode("toks").alias("p0", "tk")
    ).withColumn("p", F.col("p0") + 1)
    grams = base.select(
        "id", F.posexplode(token_ngrams(F.col("toks"), n)).alias("s0", "gram")
    ).withColumn("s", F.col("s0") + 1)
    grams = grams.localCheckpoint(eager=False)
    frequent = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("gram_df"))
        .filter(F.col("gram_df") >= min_df)
        .select("gram")
    )
    covered = (
        grams.join(F.broadcast(frequent), "gram")
        .select("id", F.explode(F.sequence(F.col("s"), F.col("s") + n - 1)).alias("p"))
        .distinct()
    )
    kept = tok.join(covered, ["id", "p"], "left_anti")
    clean = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tk"))),
                lambda x: x["tk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = base.select("id", F.size("toks").cast("bigint").alias("n_tokens"))
    return totals.join(clean, "id", "left").select(
        "id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("bigint").alias(
            "n_removed"
        ),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Near-superset pairs by character-n-gram CONTAINMENT:
    ``containment = |A∩B| / min(|A|,|B|)`` — the quote-inclusion /
    boilerplate-wrapper case that symmetric Jaccard systematically
    misses (a short doc fully embedded in a long one has containment
    1.0 but Jaccard ≈ |A|/|B|). Same inverted-index join and hot-
    shingle guard as :func:`~queryengine_spark.operators.dedup.
    ngram_jaccard_pairs`; emits (id_a, id_b, containment, jaccard)
    with id_a < id_b, containment ≥ threshold, jaccard reported for
    contrast.
    """
    from queryengine_spark.operators.dedup import shingle_pair_counts

    base = shingle_pair_counts(df, id_col, text_col, n, max_df_ratio=max_df_ratio)
    cont = F.col("shared") / F.least("n_a", "n_b")
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        base.withColumn("containment", cont)
        .withColumn("jaccard", jac)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_cells: int = 16,
    sample_n: int = 256,
    train_iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then mark
    a vector as a duplicate when a SMALLER-id vector in the same
    cluster has cosine ≥ threshold (deterministic keep-lowest-id
    variant of the paper's keep-one rule).

    Shares the IVF coarse quantizer (:func:`~queryengine_spark.
    operators.knn.kmeans_centroids_int` — bounded smallest-id sample,
    integer Lloyd iterations, engine-portable by construction) so the
    oracle unrolls identical centroids. The within-cluster pair scan
    is the bucket-local blocked numpy kernel from the embedding-LSH
    path — no global pair shuffle; at 100 TB ``n_cells`` scales with
    corpus size (≈ √n clusters keeps cells bounded) and hot cells
    split under AQE since the kernel is also bucket-size-capped by
    cluster granularity.

    Output: one row per in-contract vector — (id, cell, is_dup).
    """
    # the quantizer trains on sample[:sample_n]; n_cells > sample_n
    # would silently train fewer centroids than requested AND diverge
    # from any oracle that samples n_cells rows — reject it loudly
    assert n_cells <= sample_n, (
        f"n_cells={n_cells} exceeds the training sample sample_n={sample_n}"
    )
    e = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).filter(F.size("v") == dim)
    sample = e.select("id", "v").orderBy("id").limit(sample_n).collect()
    # train on at most sample_n points — the oracle's LIMIT takes
    # sample_n rows, so the Spark side must not silently widen the
    # training set past what the SQL twin sees
    cents = kmeans_centroids_int(
        [(int(r["id"]), [float(x) for x in r["v"]]) for r in sample[:sample_n]],
        n_cells,
        train_iters,
    )
    assign1 = ivf_cells_int_udf(cents, 1)
    cells = e.withColumn("cell", F.element_at(assign1(F.col("v")), 1))
    cells = cells.localCheckpoint(eager=False)
    pairs = cells.groupBy("cell").applyInPandas(
        _bucket_cosine_pairs(threshold), "id_a bigint, id_b bigint, cosine double"
    )
    dups = pairs.select(F.col("id_b").alias("id")).distinct().withColumn(
        "dup", F.lit(1)
    )
    return cells.join(dups, "id", "left").select(
        "id",
        F.col("cell").cast("int").alias("cell"),
        F.coalesce("dup", F.lit(0)).cast("int").alias("is_dup"),
    )


def _mg_insert(counters: dict, term: str, c: int, k: int) -> None:
    """Weighted Misra-Gries insert: add (term, c); on overflow,
    subtract the same amount from all k+1 implicated counts (the
    classic decrement generalized to weights)."""
    if term in counters:
        counters[term] += c
        return
    while c > 0:
        if len(counters) < k:
            counters[term] = c
            return
        m = min(counters.values())
        d = min(m, c)
        c -= d
        dead = []
        for key in counters:
            counters[key] -= d
            if counters[key] <= 0:
                dead.append(key)
        for key in dead:
            del counters[key]


def mg_candidate_terms(df: DataFrame, term_col: str, k: int) -> DataFrame:
    """Pass 1 of exact heavy hitters: per-Arrow-batch weighted
    Misra-Gries (Misra & Gries 1982) sketch over the term stream —
    zero shuffles, O(k) state per batch. Guarantee: a term with batch
    frequency > N_batch/(k+1) always survives its batch's sketch, so
    any term with GLOBAL frequency > N/(k+1) survives in at least one
    batch — the union of batch candidates is a guaranteed superset of
    the global heavy hitters. Output: distinct candidate terms."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters: dict[str, int] = {}
            vc = pdf[term_col].value_counts()
            for term, c in vc.items():
                _mg_insert(counters, term, int(c), k)
            yield pd.DataFrame({term_col: list(counters.keys())})

    return df.select(term_col).mapInPandas(gen, f"{term_col} string").distinct()


def heavy_hitters_exact(
    df: DataFrame,
    term_col: str,
    eps_num: int,
    eps_den: int,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact ε-heavy hitters (terms with frequency ≥ (eps_num/eps_den)
    × N) via the two-pass sketch-then-verify pattern: the Misra-Gries
    pass finds a guaranteed-superset candidate set WITHOUT shuffling
    the term space; the verify pass semi-joins the stream down to
    candidates and exact-counts only those. The output is EXACT (the
    sketch can only over-admit, never miss — candidates below
    threshold are filtered by the exact count), which is why the
    plain-SQL oracle matches hash-for-hash. ε is a rational so the
    threshold compare is integer-exact on every engine.

    At 100 TB this is the difference between shuffling every distinct
    term (trillions of keys) and shuffling only the candidate counts.
    Sizing honesty: each Arrow batch contributes ≤ eps_den candidates,
    so the candidate UNION is bounded by eps_den × n_batches — small
    on skewed streams (batches agree on the heavy terms), but NOT a
    constant. ``broadcast_candidates=True`` (default) forces the
    broadcast semi-join, correct whenever the union stays
    driver-sized; set it False on huge low-skew streams to let AQE
    pick (shuffle semi-join when the set outgrows the broadcast
    threshold), or raise the Arrow batch size / tree-merge the batch
    sketches to shrink the union first.

    Output: (term, cnt) for every term with cnt·eps_den ≥ eps_num·N,
    over the NON-NULL term stream: pandas value_counts silently
    excludes NaN from the sketch, so without an explicit filter a
    NULL-heavy stream would count toward N but never surface as a
    candidate — the exactness invariant only holds when both passes
    and the total see the same stream.
    """
    df = df.filter(F.col(term_col).isNotNull())
    k = eps_den  # k+1 > den/num counters suffices for num=1; den is safe for num≥1
    cand = mg_candidate_terms(df, term_col, k)
    if broadcast_candidates:
        cand = F.broadcast(cand)
    counts = (
        df.join(cand, term_col, "left_semi")
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(eps_den) >= F.lit(eps_num) * F.col("n_total"))
        .select(term_col, "cnt")
    )


def token_bigram_relation(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) token-bigram stream (space-joined adjacent token
    pairs of lower(text)) — the heavy-hitter unit for phrase-level
    boilerplate detection."""
    base = _token_relation(df, id_col, text_col)
    return base.select(
        "id", F.explode(token_ngrams(F.col("toks"), 2)).alias("term")
    )


def exact_heavy_hitter_check(rows: list, eps_num: int, eps_den: int) -> list:
    """Tiny driver-side oracle for unit tests: exact heavy hitters of
    a list of terms (term, cnt), same integer threshold."""
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return sorted(
        (t, k) for t, k in c.items() if k * eps_den >= eps_num * n
    )


def incremental_minhash_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_new: Column,
    n_hashes: int = 8,
    band_size: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental corpus dedup: flag each NEW-batch document that
    MinHash-band-collides with (a) the already-ingested history or
    (b) an earlier document of the same batch — the production
    "dedup today's crawl against everything we already have" shape.

    The history side reduces to its DISTINCT band-bucket set: in a
    real deployment that set (or the signature relation) is the
    stored index, appended batch over batch — history TEXT is never
    re-read and never re-hashed, and the per-batch cost is
    O(batch) signatures + one equi-join against the bucket index.
    Within-batch duplicates are ordered by id (a doc is the dup, its
    smallest-id bucket-mate the survivor), so reingesting the same
    batch is idempotent.

    Output: one row per new doc — (id, dup_of_history, dup_in_batch).
    """
    from queryengine_spark.operators.dedup import (
        _band_bucket_array,
        minhash_signatures,
    )

    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    flagged = df.select(F.col(id_col).alias("id"), is_new.alias("is_new"))
    buckets = (
        sig.select("id", F.explode(_band_bucket_array(n_hashes, band_size)).alias("bucket"))
        .join(flagged, "id")
        .localCheckpoint(eager=False)
    )
    hist = buckets.filter(~F.col("is_new")).select("bucket").distinct()
    newb = buckets.filter(F.col("is_new")).select("id", "bucket")
    dup_hist = (
        newb.join(hist, "bucket", "left_semi").select("id").distinct()
        .withColumn("dh", F.lit(1))
    )
    earlier = newb.select(F.col("id").alias("id_e"), "bucket")
    dup_batch = (
        newb.join(earlier, "bucket")
        .filter(F.col("id_e") < F.col("id"))
        .select("id")
        .distinct()
        .withColumn("db", F.lit(1))
    )
    return (
        flagged.filter("is_new")
        .join(dup_hist, "id", "left")
        .join(dup_batch, "id", "left")
        .select(
            "id",
            F.coalesce("dh", F.lit(0)).cast("int").alias("dup_of_history"),
            F.coalesce("db", F.lit(0)).cast("int").alias("dup_in_batch"),
        )
    )


def nfc_normalize_udf():
    """Arrow UDF: Unicode NFC normalization (unicodedata — the same
    UAX #15 composition DuckDB's nfc_normalize applies), the
    canonical first step of multilingual text curation: decomposed
    accent sequences, compatibility leftovers and mixed encodings
    collapse to one canonical form so hashes/dedup see equal texts
    as equal bytes."""
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else unicodedata.normalize("NFC", v)
        )

    return _nfc


def hashed_feature_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 65536,
    weight_span: int = 1000,
) -> DataFrame:
    """Linear text classifier over hashed n-gram features — the
    fastText-shaped scoring stage of production quality filters
    (CCNet-style): features = token unigrams + bigrams, hashed into
    ``n_buckets`` buckets, score = mean of per-bucket weights.

    The weight VALUES here are a deterministic stand-in (derived from
    md5 of the bucket id, uniform in [-weight_span, +weight_span]) —
    a real deployment swaps in trained weights as a broadcast lookup
    table joined on the bucket id; every other part of the plan
    (feature explode, hash, weight map, per-doc aggregate) is exactly
    the production shape and stays engine-portable: bucket = first 4
    hex chars of md5(feature) as an integer, weight = md5-derived
    integer, margin = exact BIGINT sum, score = one int/int double
    division.

    Output: (id, n_feats, margin, score, label) — label = score ≥ 0.
    """
    base = _token_relation(df, id_col, text_col)
    feats = base.select(
        "id",
        F.explode(
            F.concat(F.col("toks"), token_ngrams(F.col("toks"), 2))
        ).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 4), 16, 10).cast("bigint")
        % n_buckets
    )
    weight = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 4),
            16,
            10,
        ).cast("bigint")
        % (2 * weight_span + 1)
    ) - weight_span
    scored = feats.select("id", weight.alias("w"))
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        F.sum("w").cast("bigint").alias("margin"),
    )
    score = F.col("margin") / F.col("n_feats")
    return agg.select(
        "id",
        "n_feats",
        "margin",
        score.alias("score"),
        (score >= 0).cast("int").alias("label"),
    )


def _hashed_bucket(col) -> "F.Column":
    """feature string → bucket id (first 4 md5 hex chars mod 2^16 —
    the CCNet-style hashing trick shared by the teacher and the
    trained student)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("bigint")


def _hashed_feature_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram feature counts — the
    shared front of training AND serving (r8 extraction; the relation
    is localCheckpointed because training reuses it 2·iters + 2
    times)."""
    base = _token_relation(df, id_col, text_col)
    feats = base.select(
        "id",
        F.explode(
            F.concat(F.col("toks"), token_ngrams(F.col("toks"), 2))
        ).alias("feat"),
    )
    return (
        feats.select(
            "id", (_hashed_bucket(F.col("feat")) % n_buckets).alias("bucket")
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )


def _weights_df(spark: SparkSession, weights: dict[int, int]) -> DataFrame:
    return spark.createDataFrame(
        [(int(b), int(w)) for b, w in weights.items()] or [(0, 0)],
        "bucket long, w long",
    )


def _perceptron_fit(
    spark: SparkSession, fb: DataFrame, train: DataFrame, iters: int
) -> dict[int, int]:
    """The distributed integer batch-perceptron loop (r7; extracted
    r8): per iteration one broadcast-weights join + two integer
    aggregations over the cached (id, bucket, c) relation; weight
    state bounded by n_buckets (≤ 2^16 rows collected/re-broadcast —
    the k-means-centroid pattern)."""
    weights: dict[int, int] = {}
    for _t in range(iters):
        if not weights:
            mis = train  # w = 0: every training doc is misclassified
        else:
            margins = (
                fb.join(F.broadcast(_weights_df(spark, weights)), "bucket")
                .groupBy("id")
                .agg(F.sum(F.col("c") * F.col("w")).alias("m"))
            )
            mis = (
                train.join(margins, "id", "left")
                .filter(F.col("y") * F.coalesce(F.col("m"), F.lit(0)) <= 0)
                .select("id", "y")
            )
        upd = (
            fb.join(mis, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("c")).alias("dw"))
            .collect()  # bounded by n_buckets (≤ 2^16 rows)
        )
        for row in upd:
            weights[row["bucket"]] = weights.get(row["bucket"], 0) + int(row["dw"])
    return weights


def fit_feature_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 65536,
    weight_span: int = 1000,
    tau: int = 100,
    iters: int = 4,
) -> list[tuple[int, int]]:
    """Train the quality classifier and return its FROZEN weights as
    sorted (bucket, w) rows — the artifact the streaming quality gate
    serves at ingest (r8). Training semantics are exactly
    :func:`trained_feature_classifier`'s (same teacher, same dead
    zone, same integer batch-perceptron loop)."""
    fb = _hashed_feature_buckets(df, id_col, text_col, n_buckets)
    teacher_w = (
        _hashed_bucket(F.concat(F.lit("w:"), F.col("bucket").cast("string")))
        % (2 * weight_span + 1)
    ) - weight_span
    doc = (
        fb.withColumn("wt", teacher_w)
        .groupBy("id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("wt")).cast("bigint").alias("margin"),
        )
        .withColumn("y", F.when(F.col("margin") >= 0, 1).otherwise(-1))
        .filter(F.abs(F.col("margin")) >= tau * F.col("n_feats"))
        .select("id", "y")
    )
    weights = _perceptron_fit(df.sparkSession, fb, doc, iters)
    return sorted((int(b), int(w)) for b, w in weights.items())


def serve_feature_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[tuple[int, int]],
    n_buckets: int = 65536,
) -> DataFrame:
    """The SERVING half alone (r8): score documents against frozen
    trained weights — one broadcast join over the hashed feature
    relation, no training iterations, no teacher. (id, n_feats,
    trained_margin, trained_label); docs whose features hit no
    trained bucket score margin 0 → label 1, matching
    trained_feature_classifier's coalesce convention."""
    spark = df.sparkSession
    fb = _hashed_feature_buckets(df, id_col, text_col, n_buckets)
    wdf = _weights_df(spark, dict(weights))
    scored = (
        fb.groupBy("id")
        .agg(F.sum("c").cast("bigint").alias("n_feats"))
        .join(
            fb.join(F.broadcast(wdf), "bucket")
            .groupBy("id")
            .agg(
                F.sum(F.col("c") * F.col("w"))
                .cast("bigint")
                .alias("trained_margin")
            ),
            "id",
            "left",
        )
    )
    m = F.coalesce(F.col("trained_margin"), F.lit(0)).cast("bigint")
    return scored.select(
        "id",
        "n_feats",
        m.alias("trained_margin"),
        (m >= 0).cast("int").alias("trained_label"),
    )


def trained_feature_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 65536,
    weight_span: int = 1000,
    tau: int = 100,
    iters: int = 4,
) -> DataFrame:
    """Linear quality classifier with TRAINED weights (r7 — closes
    the hashed_feature_score "stand-in weights" annotation): the
    md5-derived weight table becomes the PLANTED TEACHER — a hidden
    labeling function, the standard synthetic-ground-truth pattern —
    and a student linear model is trained distributedly to recover
    it by batch perceptron over the same hashed unigram+bigram
    feature space.

    Training is exact INTEGER arithmetic and order-free, so both
    engines replay it identically (the oracle unrolls the iterations
    like the k-means oracles): per iteration, the misclassified set
    M_t = {i : y_i·(w_t·x_i) ≤ 0} is a distributed filter and the
    update w_{t+1} = w_t + Σ_{i∈M_t} y_i·x_i a per-bucket integer
    sum; w_0 = 0, so iteration 1's update sums over ALL training
    docs. Training uses only CONFIDENT teacher labels
    (|margin| ≥ tau·n_feats — a dead zone): teacher margins near 0
    are noise-level and would stall perceptron convergence (measured:
    confident-set agreement ≈ 94% after one round; boundary docs stay
    coin flips, as they should).

    Scale: the weight state is bounded by n_buckets (≤ 2^16 rows —
    collected and re-broadcast per iteration, the k-means-centroid
    pattern); each iteration is one broadcast join + two integer
    aggregations over the cached (id, bucket, c) relation. No
    all-pairs, no data-sized driver state.

    Output: (id, n_feats, margin, score, label, confident,
    trained_margin, trained_label, agree) — teacher columns first
    (unchanged semantics), then the student's verdicts.
    """
    fb = _hashed_feature_buckets(df, id_col, text_col, n_buckets)
    teacher_w = (
        _hashed_bucket(F.concat(F.lit("w:"), F.col("bucket").cast("string")))
        % (2 * weight_span + 1)
    ) - weight_span
    doc = (
        fb.withColumn("wt", teacher_w)
        .groupBy("id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("wt")).cast("bigint").alias("margin"),
        )
        .withColumn("y", F.when(F.col("margin") >= 0, 1).otherwise(-1))
        .withColumn(
            "confident",
            (F.abs(F.col("margin")) >= tau * F.col("n_feats")).cast("int"),
        )
        .localCheckpoint(eager=False)
    )
    spark = df.sparkSession
    train = doc.filter(F.col("confident") == 1).select("id", "y")
    weights = _perceptron_fit(spark, fb, train, iters)
    final = (
        fb.join(F.broadcast(_weights_df(spark, weights)), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("w")).cast("bigint").alias("trained_margin"))
    )
    score = F.col("margin") / F.col("n_feats")
    tlabel = (F.coalesce(F.col("trained_margin"), F.lit(0)) >= 0).cast("int")
    return (
        doc.join(final, "id", "left")
        .select(
            "id",
            "n_feats",
            "margin",
            score.alias("score"),
            (score >= 0).cast("int").alias("label"),
            "confident",
            F.coalesce(F.col("trained_margin"), F.lit(0))
            .cast("bigint")
            .alias("trained_margin"),
            tlabel.alias("trained_label"),
            (tlabel == (score >= 0).cast("int")).cast("int").alias("agree"),
        )
    )


def intradoc_dedup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Intra-document repetition scrub: within each doc, every
    repeated occurrence of a token ``n``-gram (same doc, earlier
    start position) has its covered tokens removed; first occurrences
    stay. The *detection* counterpart (dup-fraction stats, Gopher
    rules) exists in queries/pipelines.py — this is the *action*:
    emit the cleaned text.

    Declarative formulation (no UDF): gram occurrences keep their
    start positions; a window `row_number` per (doc, gram) marks
    repeats; repeats explode into covered positions; an anti-join
    removes them; ordered reassembly rebuilds the doc. Everything
    keys on (doc, gram) or (doc, pos) — row-linear, no self-join.

    Output: (id, n_tokens, n_removed, cleaned_text), one row per doc.
    """
    from pyspark.sql import Window

    base = _token_relation(df, id_col, text_col).localCheckpoint(eager=False)
    tok = base.select(
        "id", F.posexplode("toks").alias("p0", "tk")
    ).withColumn("p", F.col("p0") + 1)
    grams = base.select(
        "id", F.posexplode(token_ngrams(F.col("toks"), n)).alias("s0", "gram")
    ).withColumn("s", F.col("s0") + 1)
    w = Window.partitionBy("id", "gram").orderBy(F.col("s").asc())
    repeats = (
        grams.withColumn("occ", F.row_number().over(w))
        .filter(F.col("occ") > 1)
        .select("id", F.explode(F.sequence(F.col("s"), F.col("s") + n - 1)).alias("p"))
        .distinct()
    )
    kept = tok.join(repeats, ["id", "p"], "left_anti")
    clean = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tk"))),
                lambda x: x["tk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = base.select("id", F.size("toks").cast("bigint").alias("n_tokens"))
    return totals.join(clean, "id", "left").select(
        "id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("bigint").alias(
            "n_removed"
        ),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )
