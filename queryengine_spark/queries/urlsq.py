"""Round-5 URL/domain curation pack — the standard web-corpus
stages that key on the document's origin rather than its content:

- ``curation_url_canonicalize``: messy URL → canonical form + host +
  registered domain (``functions/urls.py`` kernels, pure JVM regex);
- ``curation_domain_cap``: per-domain document quota (smallest-md5
  draw — replayable, mirroring pipeline_cluster_balanced_sample);
- ``curation_domain_overlap``: pairwise cross-DOMAIN trigram
  containment — the domain-keyed twin of
  ``dedup_cross_source_overlap`` (same hot-trigram guard, same
  bounded inverted self-join; key = registered domain instead of the
  source label).

The documents table carries no URL column, so each doc gets a
deterministic MESSY url synthesized from doc_id arithmetic (uppercase
scheme/host, planted default and non-default ports, missing paths,
unsorted query params, fragments, and percent-escape mess — a
lowercase-hex reserved escape, an unreserved escape that must
decode, and a non-unreserved escape that must survive). Spark runs
the GENERAL
canonicalizer over the messy strings; the oracle writes the canonical
result directly from the synthesis formulas — so the driver hash
certifies that canonicalization undoes exactly the planted mess, the
same synthesize→operate-for-real→formula-oracle pattern the media
decoders use.

Scale: canonicalization is map-side; the cap is one window over a
(doc, domain) shuffle; the overlap join is bounded by
domains-per-trigram after the df guard. Nothing is data-sized on the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queryengine_spark.functions.text import tokenize_ws
from queryengine_spark.functions.urls import (
    canonicalize_url,
    registered_domain_psl,
    url_host,
    url_path,
)
from queryengine_spark.plans import spread
from queryengine_spark.queries.base import t

#: per-domain document quota
DOMAIN_CAP_K = 10
#: hot-trigram guard, same role as curation2.SRC_MAX_DF_RATIO
DOM_MAX_DF_RATIO = 0.05
#: r6: drop trigrams spanning more than this many DOMAINS — bounds
#: the overlap self-join at DOM_MAX_DOMS² pairs per trigram at any
#: domain cardinality (see curation_domain_overlap)
DOM_MAX_DOMS = 16


def _s(c: Column) -> Column:
    return c.cast("string")


def _messy_url() -> Column:
    """Deterministic messy URL for doc_id d (every branch mirrored in
    the oracle formulas): uppercase-mixed scheme (d%3) and host
    casing; default port planted when d%5==0 (80/443 matching the
    scheme — must be stripped), explicit :8080 kept when d%5==1;
    empty path when d%6==0 (must normalize to '/'); query params in
    REVERSE order when d%2==1 (must sort); fragment when d%4==0
    (must strip)."""
    d = F.col("doc_id")
    scheme = (
        F.when(d % 3 == 0, F.lit("HTTP"))
        .when(d % 3 == 1, F.lit("https"))
        .otherwise(F.lit("HtTpS"))
    )
    # r6: the host's PUBLIC SUFFIX cycles through single- and
    # MULTI-LABEL entries (co.uk, com.au) so the PSL registered-domain
    # path is oracle-visible — last-two-labels would collapse the
    # multi-label cases to the bare suffix and break the hash
    suf = (
        F.when(d % 5 == 0, F.lit("COM"))
        .when(d % 5 == 1, F.lit("Co.Uk"))
        .when(d % 5 == 2, F.lit("ORG"))
        .when(d % 5 == 3, F.lit("CoM.aU"))
        .otherwise(F.lit("Io"))
    )
    host = F.concat(
        F.lit("WWW.Site"), _s(d % 7), F.lit(".Dom"), _s(d % 11), F.lit("."), suf
    )
    port = (
        F.when((d % 5 == 0) & (d % 3 == 0), F.lit(":80"))
        .when(d % 5 == 0, F.lit(":443"))
        .when(d % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    # percent-escape mess (r5): '%4'||(d%10) decodes to A..I for
    # digits 1-9 (unreserved) but must STAY '%40' for 0 ('@' is not
    # unreserved); '%7e' must decode to '~'; '%2f' must stay, hex
    # uppercased, as '%2F' (reserved '/')
    path = F.when(d % 6 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("/p"), _s(d % 4), F.lit("/x%4"), _s(d % 10), F.lit("%7e%2f")
        )
    )
    query = F.when(d % 2 == 1, F.concat(F.lit("?z="), _s(d % 10), F.lit("&a="), _s(d % 9))).otherwise(F.lit(""))
    frag = F.when(d % 4 == 0, F.concat(F.lit("#sec"), _s(d))).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def _with_url(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "documents").withColumn("url_raw", _messy_url())


def curation_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """Canonicalize + host + PSL registered domain (r6: the domain
    column comes from the broadcast public-suffix longest-match join
    — functions/urls.py::registered_domain_psl — certified against
    the suffix formula in the oracle, including the co.uk/com.au
    multi-label legs the last-two-labels rule gets wrong)."""
    d = _with_url(spark, sf)
    host = url_host(F.col("url_raw"))
    base = d.select(
        "doc_id",
        canonicalize_url(F.col("url_raw")).alias("url_canon"),
        host.alias("host"),
    )
    return registered_domain_psl(base, "host", "domain")


#: canonical components written straight from the synthesis formulas
_SCHEME_C = "CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END"
_SUF_C = (
    "CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'"
    " WHEN 2 THEN 'org' WHEN 3 THEN 'com.au' ELSE 'io' END"
)
_HOST_C = (
    "'www.site' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.dom' || CAST(doc_id % 11 AS VARCHAR) || '.' || " + _SUF_C
)
_PORT_C = "CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END"
_PATH_C = (
    "CASE WHEN doc_id % 6 = 0 THEN '/'"
    " ELSE '/p' || CAST(doc_id % 4 AS VARCHAR) || '/x'"
    " || CASE WHEN doc_id % 10 = 0 THEN '%40'"
    "         ELSE chr(64 + CAST(doc_id % 10 AS INT)) END"
    " || '~%2F' END"
)
_QUERY_C = (
    "CASE WHEN doc_id % 2 = 1 THEN '?a=' || CAST(doc_id % 9 AS VARCHAR)"
    " || '&z=' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END"
)
#: PSL registered domain: one label left of the public suffix
_DOMAIN_C = "'dom' || CAST(doc_id % 11 AS VARCHAR) || '.' || " + _SUF_C

URL_CANONICALIZE_SQL = f"""
SELECT doc_id,
       {_SCHEME_C} || '://' || {_HOST_C} || {_PORT_C} || {_PATH_C} || {_QUERY_C}
         AS url_canon,
       {_HOST_C} AS host,
       {_DOMAIN_C} AS domain
FROM documents
"""


def curation_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document quota: keep the DOMAIN_CAP_K smallest-md5
    docs per registered domain (replayable — re-running on the same
    corpus keeps the same docs; adding docs can only displace at the
    quota boundary). Output is the per-domain audit: total docs,
    kept docs, and the checksum of kept ids so the hash certifies
    WHICH docs survived, not just how many."""
    d = _with_url(spark, sf)
    dom = registered_domain_psl(
        d.select("doc_id", url_host(F.col("url_raw")).alias("host")),
        "host",
        "domain",
    ).select("doc_id", "domain")
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = dom.withColumn("rn", F.row_number().over(w))
    return r.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("rn") <= DOMAIN_CAP_K).cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("rn") <= DOMAIN_CAP_K, F.col("doc_id"))).cast("bigint").alias("kept_checksum"),
    )


DOMAIN_CAP_SQL = f"""
WITH u AS (SELECT doc_id, {_DOMAIN_C} AS domain FROM documents),
r AS (SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM u)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn <= {DOMAIN_CAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn <= {DOMAIN_CAP_K} THEN doc_id END) AS BIGINT) AS kept_checksum
FROM r GROUP BY domain
"""


def curation_domain_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise cross-DOMAIN contamination matrix — the domain-keyed
    twin of curation2.dedup_cross_source_overlap: distinct word
    trigrams per registered domain after the hot-trigram df guard,
    inverted self-join bounded by domains-per-trigram (≤ 11 here, ≤
    |domains| always), ppm containment of the smaller side. Output ≤
    |domains|² rows — a dashboard relation."""
    d = _with_url(spark, sf)
    from queryengine_spark.queries.pipelines import _word_trigrams

    toks = tokenize_ws(F.lower(F.col("text")))
    # spread AFTER the PSL join, not before: AQE rightly coalesces the
    # small join output to one partition, which would serialize the
    # row-multiplying trigram explode onto one core (measured 29 s of
    # the 37 s r6 regression at sf0.1; 3.4 s spread) — the canonical
    # fan-out-before-explode placement.
    with_dom = spread(
        registered_domain_psl(
            d.withColumn("host", url_host(F.col("url_raw"))),
            "host",
            "domain",
        )
    )
    tri = (
        with_dom.select(
            "doc_id",
            "domain",
            F.explode(F.array_distinct(_word_trigrams(toks))).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    dfreq = tri.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    hot = (
        dfreq.crossJoin(F.broadcast(tot))
        .filter(F.col("df") > DOM_MAX_DF_RATIO * F.col("n_docs"))
        .select("sh")
    )
    ssh = (
        tri.join(F.broadcast(hot), "sh", "left_anti")
        .select("domain", "sh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # r6: DOMAIN-df cap — the join's cost driver is Σ_sh d(sh)² with
    # d(sh) ≤ |domains|, and the PSL change grew the correct domain
    # space 11 → 55 on this corpus (37 s uncapped at sf0.1). A
    # trigram present in more than DOM_MAX_DOMS domains identifies
    # nothing (it is a domain-space stopword) yet contributes the
    # quadratic bulk; dropping it bounds pairs-per-trigram at
    # DOM_MAX_DOMS² at ANY domain cardinality — the standard
    # df-capping move, now keyed to the join's actual unit. The
    # frequent set is tiny (trigrams spanning >16 domains), so it
    # broadcasts into an anti-join.
    dcnt = ssh.groupBy("sh").agg(F.count(F.lit(1)).alias("dd"))
    wide = dcnt.filter(F.col("dd") > DOM_MAX_DOMS).select("sh")
    kept = ssh.join(F.broadcast(wide), "sh", "left_anti").localCheckpoint(
        eager=False
    )
    ns = kept.groupBy("domain").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = kept.select(F.col("domain").alias("domain_a"), "sh")
    b = kept.select(F.col("domain").alias("domain_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("domain_a") < F.col("domain_b"))
        .groupBy("domain_a", "domain_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(ns.select(F.col("domain").alias("domain_a"), F.col("n").alias("n_a"))),
            "domain_a",
        )
        .join(
            F.broadcast(ns.select(F.col("domain").alias("domain_b"), F.col("n").alias("n_b"))),
            "domain_b",
        )
        .select(
            "domain_a",
            "domain_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(1000000 * n_shared) div least(n_a, n_b)").alias("containment_ppm"),
        )
    )


# DuckDB-side whitespace tokens matching functions.text.tokenize_ws
_TOKS = (
    "list_filter(string_split_regex(regexp_replace({c}, '^\\s+|\\s+$', '', 'g'),"
    " '\\s+'), t0 -> t0 <> '')"
)

DOMAIN_OVERLAP_SQL = f"""
WITH d AS (SELECT doc_id, {_DOMAIN_C} AS domain,
                  {_TOKS.format(c="lower(text)")} AS toks FROM documents),
tri AS (SELECT doc_id, domain,
        unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh
        FROM d),
tot AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (SELECT sh, count(*) AS df FROM tri GROUP BY sh),
ssh AS (SELECT DISTINCT t.domain, t.sh
        FROM tri t JOIN dfreq f ON t.sh = f.sh, tot
        WHERE f.df <= {DOM_MAX_DF_RATIO} * tot.n_docs),
dcnt AS (SELECT sh, count(*) AS dd FROM ssh GROUP BY sh),
kept AS (SELECT s.domain, s.sh
         FROM ssh s JOIN dcnt c ON c.sh = s.sh
         WHERE c.dd <= {DOM_MAX_DOMS}),
ns AS (SELECT domain, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY domain),
shared AS (SELECT a.domain AS domain_a, b.domain AS domain_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM kept a JOIN kept b ON a.sh = b.sh AND a.domain < b.domain
           GROUP BY a.domain, b.domain)
SELECT s.domain_a, s.domain_b, s.n_shared, na.n AS n_a, nb.n AS n_b,
       (1000000 * s.n_shared) // least(na.n, nb.n) AS containment_ppm
FROM shared s
JOIN ns na ON s.domain_a = na.domain
JOIN ns nb ON s.domain_b = nb.domain
"""


# ---------------------------------------------------------------------------
# Robots-exclusion filtering (r6)
# ---------------------------------------------------------------------------


def curation_robots_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Robots-exclusion URL filtering (r6) — RFC 9309 semantics over
    a BROADCAST per-host rules relation, the opt-out-compliance pass
    a crawled training corpus runs before ingestion: each host
    carries Disallow/Allow path-prefix rules (here synthesized
    deterministically per host — a real pipeline materializes them
    from fetched robots.txt into exactly this relation); a URL's
    verdict is the LONGEST matching rule, with Allow winning
    length-ties (RFC 9309 §2.2.2). The rules relation is bounded by
    host cardinality (three rows/host max), so it broadcasts at any
    corpus size; matching is one broadcast join + a per-doc max —
    map-side except one partial agg.

    Synthesized rule set per host www.site{s}.dom{d}.{suf}:
    - Disallow: /p{s % 4}              (every host)
    - Allow:    /p{s % 4}/x            (only hosts with d % 3 == 0 —
      the longest-match EXCEPTION that re-allows deeper paths)
    - Disallow: /                      (full-site opt-out when
      (s + d) % 13 == 0)
    The oracle re-derives the rules and the longest-match arithmetic
    from the same formulas."""
    d = _with_url(spark, sf)
    urls = d.select(
        "doc_id",
        url_host(F.col("url_raw")).alias("host"),
        url_path(canonicalize_url(F.col("url_raw"))).alias("path"),
    )
    hosts = (
        urls.select("host")
        .distinct()
        .select(
            "host",
            F.regexp_extract("host", r"site(\d+)", 1).cast("int").alias("s"),
            F.regexp_extract("host", r"\.dom(\d+)\.", 1).cast("int").alias("d"),
        )
    )
    dis1 = F.concat(F.lit("/p"), (F.col("s") % 4).cast("string"))
    rules = hosts.select(
        "host",
        F.explode(
            F.filter(
                F.array(
                    F.struct(
                        F.lit("disallow").alias("rtype"), dis1.alias("prefix")
                    ),
                    F.struct(
                        F.lit("allow").alias("rtype"),
                        F.concat(dis1, F.lit("/x")).alias("prefix"),
                    ),
                    F.struct(
                        F.lit("disallow").alias("rtype"),
                        F.lit("/").alias("prefix"),
                    ),
                ),
                lambda r: F.when(
                    r["rtype"] == "allow", F.col("d") % 3 == 0
                ).otherwise(
                    (r["prefix"] != "/") | ((F.col("s") + F.col("d")) % 13 == 0)
                ),
            )
        ).alias("r"),
    ).select("host", F.col("r.rtype").alias("rtype"), F.col("r.prefix").alias("prefix"))
    m = (
        urls.join(F.broadcast(rules), "host", "left")
        .withColumn(
            "mlen",
            F.when(
                F.col("prefix").isNotNull()
                & F.col("path").startswith(F.col("prefix")),
                F.length("prefix"),
            ).otherwise(F.lit(-1)),
        )
        .groupBy("doc_id", "host", "path")
        .agg(
            F.max(
                F.when(F.col("rtype") == "allow", F.col("mlen")).otherwise(-1)
            )
            .cast("int")
            .alias("best_allow_len"),
            F.max(
                F.when(F.col("rtype") == "disallow", F.col("mlen")).otherwise(-1)
            )
            .cast("int")
            .alias("best_dis_len"),
        )
    )
    return m.select(
        "doc_id",
        "host",
        "path",
        F.greatest("best_allow_len", F.lit(-1)).alias("best_allow_len"),
        F.greatest("best_dis_len", F.lit(-1)).alias("best_dis_len"),
        # RFC 9309: longest match wins, Allow wins equal-length ties;
        # no matching rule at all → allowed
        (F.col("best_dis_len") <= F.col("best_allow_len"))
        .cast("int")
        .alias("allowed"),
    )


ROBOTS_FILTER_SQL = f"""
WITH urls AS (
  SELECT doc_id,
         {_HOST_C} AS host,
         {_PATH_C} AS path,
         doc_id % 7 AS s, doc_id % 11 AS d
  FROM documents
),
scored AS (
  SELECT doc_id, host, path,
         -- Disallow /p(s%4): every host
         CASE WHEN starts_with(path, '/p' || CAST(s % 4 AS VARCHAR))
              THEN length('/p' || CAST(s % 4 AS VARCHAR)) ELSE -1 END AS d1,
         -- Allow /p(s%4)/x: hosts with d % 3 == 0
         CASE WHEN d % 3 = 0
                   AND starts_with(path, '/p' || CAST(s % 4 AS VARCHAR) || '/x')
              THEN length('/p' || CAST(s % 4 AS VARCHAR) || '/x') ELSE -1 END AS a1,
         -- Disallow /: full-site opt-out when (s + d) % 13 == 0
         CASE WHEN (s + d) % 13 = 0 THEN 1 ELSE -1 END AS dr
  FROM urls
)
SELECT doc_id, host, path,
       CAST(a1 AS INT) AS best_allow_len,
       CAST(greatest(d1, dr) AS INT) AS best_dis_len,
       CAST(CASE WHEN greatest(d1, dr) <= a1 THEN 1 ELSE 0 END AS INT) AS allowed
FROM scored
"""


QUERIES = {
    "curation_url_canonicalize": (curation_url_canonicalize, URL_CANONICALIZE_SQL),
    "curation_domain_cap": (curation_domain_cap, DOMAIN_CAP_SQL),
    "curation_domain_overlap": (curation_domain_overlap, DOMAIN_OVERLAP_SQL),
    "curation_robots_filter": (curation_robots_filter, ROBOTS_FILTER_SQL),
}
