"""Byte-pair-encoding tokenizer: classic BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") —
train a merge table on a bounded corpus sample, apply it distributed.

Spark shape: training is a driver-side pure function over a BOUNDED
sample (like the k-means quantizers — O(1) in corpus size); the merge
table ships to executors inside one Arrow UDF closure and application
is embarrassingly parallel. At 100 TB the merge table is a few KB of
broadcast state; the apply pass is a row-linear map, no shuffle.

Determinism: pair counts are exact integers; ties in "most frequent
pair" break lexicographically — same sample → same merges on any
machine. Application uses standard lowest-merge-rank-first rewriting,
a pure function of (merges, token). Not SQL-expressible (iterative
data-dependent rewriting), so the contract query is rows-only; pytest
pins it against an independent quadratic reference implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: end-of-word sentinel: lets merges learn suffixes without crossing
#: token boundaries (standard BPE practice)
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def bpe_train(words: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word-frequency dict.
    Each round merges the most frequent adjacent symbol pair (ties →
    lexicographically smallest pair). Stops early when no pair occurs
    twice."""
    vocab = {_word_symbols(w): c for w, c in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE application: repeatedly merge the pair with the
    LOWEST merge rank until none applies."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow UDF: array<string> of whitespace tokens → array<string>
    of BPE subwords (token boundaries never crossed). The merge table
    rides the closure — broadcast-sized state, no join. Distinct
    tokens encode once per Arrow batch (vocabulary ≪ occurrences)."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(toks: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for arr in toks:
            if arr is None:
                out.append(None)
                continue
            subs: list[str] = []
            for w in arr:
                enc = cache.get(w)
                if enc is None:
                    enc = bpe_encode_word(w, ranks)
                    cache[w] = enc
                subs.extend(enc)
            out.append(subs)
        return pd.Series(out)

    return _encode


def bpe_train_on_sample(
    df, id_col: str, text_col: str, sample_n: int, n_merges: int
) -> list[tuple[str, str]]:
    """Train merges on the ``sample_n`` smallest-id documents (one
    bounded driver collect, like the ANN quantizers); word frequencies
    are exact over the sample."""
    from queryengine_spark.functions.text import tokenize_ws

    rows = (
        df.select(
            F.col(id_col).alias("sid"),
            tokenize_ws(F.lower(F.col(text_col))).alias("toks"),
        )
        .orderBy("sid")
        .limit(sample_n)
        .collect()
    )
    words: dict[str, int] = {}
    for r in rows:
        for w in r["toks"]:
            words[w] = words.get(w, 0) + 1
    return bpe_train(words, n_merges)
