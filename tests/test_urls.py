"""URL canonicalization kernels pinned on hand-written messy URLs —
independent of the query synthesis formulas, so a matched
synthesizer/canonicalizer bug pair cannot cancel."""

from __future__ import annotations

from pyspark.sql import functions as F

from queryengine_spark.functions.urls import (
    canonicalize_url,
    url_domain,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM/a/b", "http://www.example.com/a/b"),
    ("https://host.com:443/x", "https://host.com/x"),       # default port strip
    ("http://host.com:80/", "http://host.com/"),
    ("http://host.com:8080/x", "http://host.com:8080/x"),   # explicit port kept
    ("https://Host.com", "https://host.com/"),              # empty path -> /
    ("http://h.com/p?z=1&a=2", "http://h.com/p?a=2&z=1"),   # query sort
    ("http://h.com/p?single=1", "http://h.com/p?single=1"),
    ("http://h.com/p#frag", "http://h.com/p"),              # fragment strip
    ("HtTpS://A.B.C.com:9999/P/Q?b=2&a=1#x", "https://a.b.c.com:9999/P/Q?a=1&b=2"),
    # r5 percent-escape normalization:
    ("http://h.com/a%41b", "http://h.com/aAb"),           # unreserved decodes
    ("http://h.com/a%2fb", "http://h.com/a%2Fb"),         # reserved kept, hex upper
    ("http://h.com/%7e%5F%2E", "http://h.com/~_."),       # ~ _ . all decode
    ("http://h.com/%G1%", "http://h.com/%G1%"),           # malformed passes through
    ("http://h.com/p?a=%3d1", "http://h.com/p?a=%3D1"),   # query escapes normalized too
]


def test_canonicalize_hand_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["u"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("u"))).collect()]
    assert got == [c for _, c in CASES]


def test_host_and_domain(spark):
    rows = [
        ("http://WWW.News.Site.CO:80/x", "www.news.site.co", "site.co"),
        ("https://abc.com/", "abc.com", "abc.com"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["u"])
    host = url_host(F.col("u"))
    got = df.select(host.alias("h"), url_domain(host).alias("d")).collect()
    assert [(r["h"], r["d"]) for r in got] == [(h, d) for _, h, d in rows]


def test_path_case_preserved_query_sorted_stable(spark):
    """Path case must survive (only scheme/host lowercase); sorting
    is idempotent: canonicalize(canonicalize(u)) == canonicalize(u)."""
    raw = "HTTPS://X.Com/CaseSensitive/Path?c=3&b=2&a=1#f"
    df = spark.createDataFrame([(raw,)], ["u"])
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"))
    c1 = once.collect()[0]["c"]
    assert c1 == "https://x.com/CaseSensitive/Path?a=1&b=2&c=3"
    assert twice.collect()[0]["c2"] == c1


def test_fragment_question_mark_not_resurrected(spark):
    """r5 ADVICE: a '?' INSIDE the fragment is fragment content, not
    a query — the canonical form must not resurrect it."""
    cases = [
        ("http://h.com/p#sec?x=1", "http://h.com/p"),
        ("http://h.com/p?a=1#sec?x=9", "http://h.com/p?a=1"),
        ("http://h.com#f?z=1&a=2", "http://h.com/"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["u"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("u"))).collect()]
    assert got == [c for _, c in cases]


def test_registered_domain_psl_suffixes(spark):
    """r6 PSL longest-suffix-match: co.uk-style registries resolve to
    label+suffix, single-label suffixes behave like last-two, unknown
    TLDs fall back, and a bare public suffix maps to itself."""
    from queryengine_spark.functions.urls import registered_domain_psl

    rows = [
        ("www.foo.co.uk", "foo.co.uk"),        # multi-label suffix
        ("a.b.example.com", "example.com"),
        ("deep.sub.x.gov.uk", "x.gov.uk"),
        ("www.site.com.au", "site.com.au"),
        ("example.io", "example.io"),
        ("weird.host.zz", "host.zz"),           # no PSL entry: fallback
        ("co.uk", "co.uk"),                     # bare suffix: itself
        ("single", "single"),                   # one label: itself
    ]
    df = spark.createDataFrame(rows, ["host", "want"])
    got = registered_domain_psl(df, "host", "domain").collect()
    for r in got:
        assert r["domain"] == r["want"], (r["host"], r["domain"])
    assert len(got) == len(rows)


def test_robots_filter_rfc_semantics(spark, sf_dir):
    """Independent scalar re-derivation of the RFC 9309 verdicts:
    longest match wins, Allow wins equal-length ties, no-rule →
    allowed. Checks every doc against the formulas."""
    from queryengine_spark.queries.urlsq import curation_robots_filter

    out = {r["doc_id"]: r for r in curation_robots_filter(spark, sf_dir).collect()}
    assert out
    saw_allow_exception = saw_root_block = saw_plain_dis = False
    for doc_id, r in out.items():
        s, d = doc_id % 7, doc_id % 11
        path = r["path"]
        d1 = len(f"/p{s % 4}") if path.startswith(f"/p{s % 4}") else -1
        a1 = (
            len(f"/p{s % 4}/x")
            if d % 3 == 0 and path.startswith(f"/p{s % 4}/x")
            else -1
        )
        dr = 1 if (s + d) % 13 == 0 else -1
        best_dis = max(d1, dr)
        assert r["best_allow_len"] == a1, doc_id
        assert r["best_dis_len"] == best_dis, doc_id
        assert r["allowed"] == int(best_dis <= a1), doc_id
        if a1 > best_dis >= 0:
            saw_allow_exception = True
        if dr == 1 and r["allowed"] == 0:
            saw_root_block = True
        if d1 > a1:
            saw_plain_dis = True
    # the corpus must actually exercise all three rule interactions
    assert saw_allow_exception and saw_root_block and saw_plain_dis


def test_robots_filter_plan_broadcast_rules(spark, sf_dir):
    from queryengine_spark.queries.urlsq import curation_robots_filter

    plan = (
        curation_robots_filter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the rules relation
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
