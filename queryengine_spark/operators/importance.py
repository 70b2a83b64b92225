"""DSIR-shaped importance resampling (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"): score raw
documents by how much their hashed n-gram feature profile resembles a
TARGET distribution (a trusted high-quality subset), then keep the
top mass — the standard pretraining-data selection move when you have
a small clean corpus and a huge raw crawl.

Faithful to the paper's pipeline shape: features are token unigrams +
bigrams hashed into a fixed bucket space (the paper's hashed n-gram
generative model), per-bucket statistics come from one pass over the
target subset and one over the raw corpus, and each document's
importance is an additive per-feature weight sum. DIVERGENCE
(documented): the paper's per-feature weight is the log-likelihood
ratio log p_target(f) − log p_raw(f); engine-portable hashing demands
exact arithmetic, so the weight here is the SCALED PROBABILITY RATIO
with add-one smoothing, ``w_f = (scale·(t_f+1)) div (r_f+1)`` — an
integer, monotone in the same ratio — and the document score is the
exact BIGINT sum of w_f over feature OCCURRENCES divided once by the
occurrence count. Rank order ≈ the paper's sampling weight order;
every intermediate is integer so the DuckDB oracle matches
bit-for-bit. (Bounds: t_f ≤ target token count, so ``scale=10^6``
overflows int64 only past ~9·10^12 target tokens — raise/lower scale
per corpus.)

Scale: two groupBy passes over the exploded feature stream (map-side
partial counts), a weight table bounded by ``n_buckets`` rows (a
broadcast join — never a shuffle of the corpus against it), one
per-doc aggregation. No driver-side data, no UDF: the md5 bucket
hash, the counts and the weight sum are all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.operators.curation import token_ngrams
from queryengine_spark.plans import spread


def hashed_feature_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    flag: Column | None = None,
) -> DataFrame:
    """(id, bucket[, tgt]) — one row per unigram/bigram feature
    OCCURRENCE, bucket = first 4 hex chars of md5(feature) mod
    ``n_buckets`` (the package's engine-portable hash convention).
    ``flag`` rides along from the SOURCE row (evaluated before the
    explode), so downstream target/raw splits are a map-side filter
    instead of a semi-join shuffle of the feature stream."""
    toks = tokenize_ws(F.lower(F.col(text_col)))
    cols = [F.col(id_col).alias("id"), toks.alias("toks")]
    if flag is not None:
        cols.append(flag.cast("int").alias("tgt"))
    base = spread(df).select(*cols)
    feats = base.select(
        "id",
        *(["tgt"] if flag is not None else []),
        F.explode(
            F.concat(F.col("toks"), token_ngrams(F.col("toks"), 2))
        ).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 4), 16, 10).cast("bigint")
        % n_buckets
    )
    return feats.select(
        "id", *(["tgt"] if flag is not None else []), bucket.alias("bucket")
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter: Column,
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document DSIR-shaped importance over ``df``: target
    distribution from the rows matching ``target_filter``, raw
    distribution from all rows. Returns
    (id, n_feats, margin, score) with margin = Σ w_f (BIGINT) and
    score = margin / n_feats (one exact int/int double division)."""
    fb = hashed_feature_buckets(
        df, id_col, text_col, n_buckets, flag=target_filter
    )
    t_counts = (
        fb.filter(F.col("tgt") == 1)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_f"))
    )
    r_counts = fb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("r_f")
    )
    weights = r_counts.join(t_counts, "bucket", "left").select(
        "bucket",
        F.expr(f"((coalesce(t_f, 0) + 1) * {scale}) div (r_f + 1)")
        .cast("bigint")
        .alias("w"),
    )
    agg = (
        fb.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("w").cast("bigint").alias("margin"),
        )
    )
    return agg.select(
        "id", "n_feats", "margin", (F.col("margin") / F.col("n_feats")).alias("score")
    )
