"""Independent-reference tests for the round-4 late curation pack
(sequence packing, MAD outliers, shard audit, cross-source overlap).

Each test recomputes the expected result in plain Python (hashlib +
dict arithmetic — no Spark, no DuckDB) from the collected documents
table, so correctness evidence is engine-independent of both sides of
the driver's oracle comparison."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from queryengine_spark.queries.base import t
from queryengine_spark.queries.curation2 import (
    MAD_K,
    N_SHARDS,
    PACK_SHARDS,
    SEQ_LEN,
    SRC_MAX_DF_RATIO,
    dedup_cross_source_overlap,
    pipeline_sequence_packing,
    pipeline_shard_assign,
    text_outlier_mad,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _h48(s: str) -> int:
    return int(_md5(s)[:12], 16)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return [
        r.asDict()
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang", "text")
        .collect()
    ]


def _ntok(text: str) -> int:
    return len(text.split())


def test_sequence_packing_matches_reference(spark, sf_dir, docs):
    # reference: per (source, shard) md5-ordered concat-and-chunk
    groups = defaultdict(list)
    for d in docs:
        n = _ntok(d["text"])
        if n == 0:
            continue
        shard = _h48(str(d["doc_id"])) % PACK_SHARDS
        groups[(d["source"], shard)].append((_md5(str(d["doc_id"])), d["doc_id"], n))
    expect = defaultdict(lambda: [0, 0, 0])  # (src, shard, pack) -> docs, toks, cross
    for (src, shard), rows in groups.items():
        cum = 0
        for _, _, n in sorted(rows):
            start, cum = cum, cum + n
            for p in range(start // SEQ_LEN, (cum - 1) // SEQ_LEN + 1):
                lo, hi = p * SEQ_LEN, (p + 1) * SEQ_LEN
                cell = expect[(src, shard, p)]
                cell[0] += 1
                cell[1] += min(cum, hi) - max(start, lo)
                cell[2] += 1 if (start < lo or cum > hi) else 0
    got = {
        (r["source"], r["shard"], r["pack_id"]): [
            r["n_docs"],
            r["n_tokens"],
            r["n_boundary_docs"],
        ]
        for r in pipeline_sequence_packing(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in expect.items()}
    # every pack except a group's last must be exactly full
    last = {
        (s, sh): max(p for (s2, sh2, p) in expect if (s2, sh2) == (s, sh))
        for (s, sh, _p) in expect
    }
    for (s, sh, p), (_d, toks, _c) in expect.items():
        if p < last[(s, sh)]:
            assert toks == SEQ_LEN


def _lower_median(vals: list[int]) -> int:
    vs = sorted(vals)
    return vs[(len(vs) + 1) // 2 - 1]


def test_outlier_mad_matches_reference(spark, sf_dir, docs):
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d["lang"]].append(_ntok(d["text"]))
    med = {lg: _lower_median(v) for lg, v in by_lang.items()}
    mad = {
        lg: _lower_median([abs(x - med[lg]) for x in v]) for lg, v in by_lang.items()
    }
    expect = {
        d["doc_id"]: (
            _ntok(d["text"]),
            med[d["lang"]],
            mad[d["lang"]],
            int(abs(_ntok(d["text"]) - med[d["lang"]]) > MAD_K * mad[d["lang"]]),
        )
        for d in docs
    }
    rows = text_outlier_mad(spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[r["doc_id"]] == (
            r["n_tokens"],
            r["med_tokens"],
            r["mad_tokens"],
            r["is_outlier"],
        )
    # the rule must flag something somewhere at sf0.001+ (non-vacuous)
    assert any(v[3] for v in expect.values()) or all(
        v[2] > 0 for v in expect.values()
    )


def test_shard_assign_matches_reference(spark, sf_dir, docs):
    agg = defaultdict(lambda: [0, 0, set(), set(), 0])
    for d in docs:
        h = _h48(str(d["doc_id"]))
        cell = agg[h % N_SHARDS]
        cell[0] += 1
        cell[1] += _ntok(d["text"])
        cell[2].add(d["lang"])
        cell[3].add(d["source"])
        cell[4] ^= h
    got = {r["shard"]: r for r in pipeline_shard_assign(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for sh, (nd, nt, langs, srcs, sig) in agg.items():
        r = got[sh]
        assert (nd, nt, len(langs), len(srcs), sig) == (
            r["n_docs"],
            r["n_tokens"],
            r["n_langs"],
            r["n_sources"],
            r["xor_sig"],
        )


def _trigrams(text: str) -> set[str]:
    toks = text.lower().split()
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }


def test_cross_source_overlap_matches_reference(spark, sf_dir, docs):
    df_count: dict[str, int] = defaultdict(int)
    doc_tris = []
    for d in docs:
        tris = _trigrams(d["text"])
        doc_tris.append((d["source"], tris))
        for sh in tris:
            df_count[sh] += 1
    hot = {sh for sh, c in df_count.items() if c > SRC_MAX_DF_RATIO * len(docs)}
    per_src = defaultdict(set)
    for src, tris in doc_tris:
        per_src[src] |= tris - hot
    expect = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expect[(a, b)] = (
                    shared,
                    len(per_src[a]),
                    len(per_src[b]),
                    1_000_000 * shared // min(len(per_src[a]), len(per_src[b])),
                )
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared"],
            r["n_a"],
            r["n_b"],
            r["containment_ppm"],
        )
        for r in dedup_cross_source_overlap(spark, sf_dir).collect()
    }
    assert got == expect


def test_html_extract_hand_cases(spark, sf_dir):
    """The three classic extraction traps, via the registered query's
    own synthesis: (1) script/style payloads must NOT leak (the
    script contains '<' and '>' that a greedy tag-stripper would
    mangle); (2) entity decoding order — '&amp;' decodes LAST;
    (3) whitespace collapse leaves single spaces."""
    from queryengine_spark.queries.curation2 import text_html_extract

    out = {r["doc_id"]: r for r in text_html_extract(spark, sf_dir).collect()}
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    import hashlib
    import re

    for doc_id, text in docs[:25]:
        html = (
            f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
            "<style>body { color: #111; }</style>"
            f"<script>var js = 1 < 2 && 3 > 2; track('{doc_id}');</script>"
            "</head><body><nav>home &amp; about &gt; docs</nav>"
            f'<div class="main" id="c{doc_id}"><h1>Title {doc_id}</h1><p>{text}'
            f" &lt;tail {doc_id}&gt; &quot;quoted&quot; &#39;s&#39;&nbsp;end</p></div>"
            f"<footer>&copy; site{doc_id % 7}.example</footer></body></html>"
        )
        s = re.sub(r"(?s)<script[^>]*>.*?</script>", " ", html)
        s = re.sub(r"(?s)<style[^>]*>.*?</style>", " ", s)
        s = re.sub(r"<[^>]*>", " ", s)
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
        ):
            s = s.replace(ent, ch)
        s = re.sub(r"\s+", " ", s).strip()
        r = out[doc_id]
        assert r["extracted_hash"] == hashlib.md5(s.encode()).hexdigest(), doc_id
        assert "track(" not in s and "color" not in s  # no script/style leak
        assert f'<tail {doc_id}>' in s  # entities decoded to literals
        assert '"quoted"' in s and "'s'" in s
        assert "  " not in s  # whitespace collapsed
        assert r["n_tags"] > 10 and r["n_entities"] >= 8


def test_html_extract_warc_leg_lossless(spark, sf_dir):
    """r8: the WARC→WET leg must produce IDENTICAL extraction values
    to the direct leg for every document (the wrap/unwrap is
    byte-lossless), with fmt routed by doc parity."""
    from queryengine_spark.queries.curation2 import text_html_extract

    rows = text_html_extract(spark, sf_dir).collect()
    direct = {r["doc_id"]: r for r in rows if r["leg"] == "direct"}
    warc = {r["doc_id"]: r for r in rows if r["leg"] == "warc"}
    assert set(direct) == set(warc) and len(direct) > 0
    for did, dr in direct.items():
        wr = warc[did]
        assert dr["fmt"] is None
        assert wr["fmt"] == ("warc" if did % 2 == 0 else "warc.gz")
        for c in (
            "n_tags", "n_entities", "extracted_len", "extracted_hash",
            "boilerplate_ratio_ppm",
        ):
            assert dr[c] == wr[c], (did, c)
