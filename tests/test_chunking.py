"""RAG chunking (text_chunk_rag) boundary semantics, pinned against
an independent pure-Python chunker on hand-built corpora."""

from __future__ import annotations

import pytest

from queryengine_spark.queries.textstats import RAG_CHUNK, RAG_STRIDE


def _py_chunks(tokens: list[str], c: int = RAG_CHUNK, s: int = RAG_STRIDE):
    """Independent reference: chunk i covers tokens[i*s : i*s + c];
    the last chunk is the first reaching the end."""
    n = len(tokens)
    if n == 0:
        return []
    k = (n - c + s - 1) // s if n > c else 0
    return [
        (i, i * s, tokens[i * s : i * s + c]) for i in range(k + 1)
    ]


@pytest.mark.parametrize(
    "n",
    [
        1,
        RAG_CHUNK - 1,
        RAG_CHUNK,  # exactly one full window → single chunk
        RAG_CHUNK + 1,  # one token over → exactly two chunks
        RAG_STRIDE,  # under C → still one chunk (no runt)
        2 * RAG_STRIDE + RAG_CHUNK,  # last start exactly n - C
        100,
        257,
    ],
)
def test_chunk_count_and_coverage(n):
    toks = [f"t{i}" for i in range(n)]
    chunks = _py_chunks(toks)
    # every token covered
    covered = set()
    for _, start, ch in chunks:
        covered.update(range(start, start + len(ch)))
    assert covered == set(range(n))
    # the last chunk reaches the end; the one before it (if any) does not
    assert chunks[-1][1] + len(chunks[-1][2]) == n
    if len(chunks) > 1:
        prev_i, prev_start, prev = chunks[-2]
        assert prev_start + RAG_CHUNK < n  # no runt fully inside predecessor
    # overlap is C - S for all adjacent full chunks
    for (i1, s1, c1), (i2, s2, c2) in zip(chunks, chunks[1:]):
        assert s2 - s1 == RAG_STRIDE


def test_spark_matches_python_reference(spark):
    from queryengine_spark.queries.textstats import text_chunk_rag

    docs = [
        (0, ""),  # dropped: zero tokens
        (1, "   "),  # dropped: whitespace-only
        (2, "one"),
        (3, " ".join(f"w{i}" for i in range(RAG_CHUNK))),
        (4, " ".join(f"w{i}" for i in range(RAG_CHUNK + 1))),
        (5, "  a  b\tc\nd  " + " ".join(f"x{i}" for i in range(95))),
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [
                (i, txt, "en", "test", len(txt))
                for i, txt in docs
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r["doc_id"], r["chunk_idx"]): r
            for r in text_chunk_rag(spark, td).collect()
        }
    expect = {}
    for doc_id, txt in docs:
        toks = txt.split()
        for i, start, ch in _py_chunks(toks):
            expect[(doc_id, i)] = (start, len(ch), " ".join(ch))
    assert set(got) == set(expect)
    for key, (start, n_tok, text) in expect.items():
        r = got[key]
        assert r["start_tok"] == start, key
        assert r["n_tok"] == n_tok, key
