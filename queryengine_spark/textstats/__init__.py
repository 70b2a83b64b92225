"""Text analysis for training-data pipelines: token counting, quality
scoring, heuristic language ID, document fingerprinting. All pure
column expressions (JVM-side, whole-stage codegen) over a text column
— designed to run as a single projection pass over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from queryengine_spark.functions.numeric import fround
from queryengine_spark.functions.text import tokenize_ws

#: marker stopwords per language for the n-gram/token heuristic
#: language identifier. Deliberately tiny — the point is the operator
#: shape (scored argmax over language profiles), not model quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "las", "es"),
}

#: ASCII punctuation class used by the quality scorer (kept explicit
#: so the same class works in any regex dialect).
PUNCT_CLASS = "[.,!?;:]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


#: BPE-ish pre-tokenizer pattern: letter runs, digit runs, punctuation
#: runs (GPT-2-style word splitting without lookaheads, so the same
#: pattern runs on Java regex and RE2 — engine-portable).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(tokenize_ws(c)).cast("bigint")


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish subword pre-tokenization as array<string> (the unit a
    byte-pair tokenizer would merge from) — pure regex, JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text)).cast("bigint")


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("bigint")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return fround(n_punct / F.length(c), 6)


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are common stopwords (a quality signal:
    natural prose has a stable stopword rate; boilerplate doesn't)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize_ws(F.lower(c))
    stops = list(STOPWORDS)
    n_stop = F.size(F.filter(toks, lambda tk: tk.isin(stops)))
    return fround(n_stop / F.size(toks), 6)


def avg_token_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize_ws(c)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, v: a + v)
    return fround(total / F.size(toks), 6)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-token hit counts per language (with multiplicity)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize_ws(F.lower(c))

    def count_in(markers: tuple[str, ...]):
        vals = list(markers)
        # NOTE: single-parameter lambda — PySpark higher-order lambdas
        # dispatch on arity (a second parameter would receive the
        # element index, not a closure default).
        return F.size(F.filter(toks, lambda tk: tk.isin(vals))).cast("bigint")

    return {lang: count_in(markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: Column | str) -> Column:
    """Heuristic language prediction: argmax of marker scores with a
    fixed priority order (en > de > fr > es) on ties; 'und' when all
    scores are zero."""
    s = lang_scores(text)
    return (
        F.when(
            (s["en"] + s["de"] + s["fr"] + s["es"]) == 0, F.lit("und")
        )
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )


def content_fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct lowercase token set — a cheap canonical-content key for
    shuffle-free near-dup bucketing (token-order / duplication
    invariant)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_sort(F.array_distinct(tokenize_ws(F.lower(c))))
    return F.md5(F.array_join(toks, " "))
