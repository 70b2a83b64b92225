"""URL canonicalization kernels — pure Column expressions (JVM
regex, whole-stage codegen; no UDF in the hot path), the first stage
of any web-corpus curation pipeline.

Canonical form produced by :func:`canonicalize_url`:

- scheme and host lowercased;
- default ports stripped (``http:80``, ``https:443``), any other
  explicit port kept;
- empty path normalized to ``/``;
- query parameters sorted (lexicographically by the whole ``k=v``
  token — equivalent to a key sort whenever keys are distinct, the
  overwhelmingly common case; a stable key-wise sort would need an
  explode/re-aggregate for identical keys, documented divergence);
- fragment stripped (never sent to the server, pure client state).

Percent-encoding normalization (r5, RFC 3986 §2.3/§6.2.2): escapes
of UNRESERVED characters (ALPHA / DIGIT / ``-._~``) decode to the
character (``%7E`` → ``~``, ``%41`` → ``A``); every other escape
keeps its percent form with UPPERCASED hex (``%2f`` → ``%2F`` — a
reserved character must never be decoded, that would change path
semantics); a ``%`` not followed by two hex digits passes through
verbatim. Applied to path and query; implemented as
split-on-%% → per-segment CASE → rejoin, still pure JVM expressions.

Registered-domain extraction (r6): :func:`registered_domain_psl`
joins the host's label suffixes against a broadcast PUBLIC-SUFFIX
table with longest-suffix-match — ``foo.co.uk`` → ``foo.co.uk``'s
registrable part is the label left of the longest matching public
suffix (``co.uk``), so it yields ``foo.co.uk`` where the naive
last-two-labels rule collapses to ``co.uk``. ``PSL_SUFFIXES`` is a
bounded curated snapshot of publicsuffix.org entries (the common
ccTLD second-level registries plus gTLDs); hosts matching no entry
fall back to last-two-labels (:func:`url_domain`, kept as the
documented approximation). Wildcard (``*.ck``) and exception
(``!www.ck``) PSL rules are out of the snapshot's scope, documented.

Deliberately NOT done (documented): IDN/punycode — needs codepoint
tables that would bury the Spark-side plumbing this module exists to
show.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (scheme, default port) pairs whose explicit port is redundant
DEFAULT_PORTS = (("http", "80"), ("https", "443"))


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def _authority(url: Column | str) -> Column:
    return F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)


def url_host(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_authority(url), r"^([^:]*)", 1))


def url_port(url: Column | str) -> Column:
    """Explicit port string, '' if absent."""
    return F.regexp_extract(_authority(url), r":(\d+)$", 1)


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)


def url_query(url: Column | str) -> Column:
    # Strip the fragment FIRST: a '?' inside the fragment
    # (http://h/p#sec?x=1) is fragment content, not a query — matching
    # '\?' over the whole URL would resurrect it as one.
    pre_fragment = F.regexp_extract(url, r"^([^#]*)", 1)
    return F.regexp_extract(pre_fragment, r"\?(.*)$", 1)


def url_domain(host: Column | str) -> Column:
    """Registered-domain APPROXIMATION: the last two dot-labels of
    the host ('www.a.b.com' → 'b.com'). Wrong for multi-label public
    suffixes ('foo.co.uk' → 'co.uk'); :func:`registered_domain_psl`
    is the PSL-correct path and uses this as its no-match fallback.
    A single-label host is its own domain (slice length clamps)."""
    parts = F.split(host, r"\.")
    k = F.least(F.lit(2), F.size(parts))
    return F.array_join(F.slice(parts, -k, k), ".")


#: bounded curated snapshot of publicsuffix.org entries: the common
#: multi-label ccTLD registries (the cases last-two-labels gets
#: wrong) plus frequent gTLDs/ccTLDs. Single-label parents (uk, jp,
#: au, …) are listed too so longest-match is load-bearing: 'co.uk'
#: must win over 'uk'. A production deployment swaps the full list
#: in — same relation shape, same join.
PSL_SUFFIXES: tuple[str, ...] = (
    # multi-label public suffixes
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    # single-label suffixes (incl. the parents of the above)
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "dev",
    "app", "ai", "co", "me", "info", "biz", "xyz", "uk", "au", "jp",
    "br", "in", "cn", "mx", "nz", "za", "ar", "tr", "kr", "sg", "hk",
    "tw", "de", "fr", "it", "es", "nl", "se", "no", "fi", "dk", "pl",
    "ru", "ca", "us", "ch", "at", "be", "cz", "pt", "gr", "ie", "il",
)

#: longest suffix in the snapshot, in LABELS (bounds the candidate
#: explode per distinct host)
PSL_MAX_LABELS = max(s.count(".") + 1 for s in PSL_SUFFIXES)


def registered_domain_psl(
    df: DataFrame, host_col: str = "host", out: str = "domain"
) -> DataFrame:
    """PSL registered-domain extraction (r6): adds ``out`` =
    registrable domain of ``host_col`` via longest-suffix-match
    against the broadcast ``PSL_SUFFIXES`` relation; hosts matching
    no suffix fall back to last-two-labels (:func:`url_domain`).

    Scale shape: candidate suffixes (≤ PSL_MAX_LABELS per host) are
    exploded over the DISTINCT hosts only — a relation bounded by
    host cardinality, never corpus size — matched with one broadcast
    hash join, and the host→domain map equi-joins back onto the
    input. A host that IS a public suffix ('co.uk' itself) has no
    registrable part and maps to itself, documented."""
    spark = df.sparkSession
    psl = F.broadcast(
        spark.createDataFrame([(s,) for s in PSL_SUFFIXES], "_suf string")
    )
    hosts = df.select(F.col(host_col).alias("_h")).distinct()
    parts = F.split(F.col("_h"), r"\.")
    nlab = F.size(parts)
    cand = hosts.select(
        "_h",
        nlab.alias("_n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(nlab, F.lit(PSL_MAX_LABELS))),
                lambda k: F.struct(
                    k.alias("_k"),
                    F.array_join(F.slice(parts, -k, k), ".").alias("_s"),
                ),
            )
        ).alias("_c"),
    ).select("_h", "_n", F.col("_c._k").alias("_k"), F.col("_c._s").alias("_s"))
    best = (
        cand.join(psl, cand["_s"] == psl["_suf"])
        .groupBy("_h")
        .agg(F.max("_k").alias("_k"))
    )
    reg = (
        hosts.join(best, "_h", "left")
        .select(
            "_h",
            F.when(
                F.col("_k").isNull(),
                # no PSL entry matched: last-two-labels fallback
                url_domain(F.col("_h")),
            )
            .otherwise(
                F.array_join(
                    F.slice(
                        F.split(F.col("_h"), r"\."),
                        -F.least(F.col("_k") + 1, F.size(F.split(F.col("_h"), r"\."))),
                        F.least(F.col("_k") + 1, F.size(F.split(F.col("_h"), r"\."))),
                    ),
                    ".",
                )
            )
            .alias(out),
        )
    )
    return df.join(reg, df[host_col] == reg["_h"]).drop("_h")


def pct_normalize(col: Column) -> Column:
    """RFC 3986 percent-escape normalization (module docstring):
    split on '%', then each tail segment either DECODES (unreserved
    target character), UPPERCASES its hex (reserved/other target),
    or passes through verbatim (malformed — no two hex digits).
    hex→int is ``conv``, int→char is the built-in ``char`` — no UDF,
    stays in whole-stage codegen."""
    parts = F.split(col, "%")
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix(s: Column) -> Column:
        code = F.conv(F.substring(s, 1, 2), 16, 10).cast("int")
        unreserved = (
            ((code >= 48) & (code <= 57))      # DIGIT
            | ((code >= 65) & (code <= 90))    # ALPHA upper
            | ((code >= 97) & (code <= 122))   # ALPHA lower
            | code.isin(45, 46, 95, 126)       # - . _ ~
        )
        rest = s.substr(F.lit(3), F.length(s))
        hex2 = F.upper(F.substring(s, 1, 2))
        return (
            F.when(
                s.rlike("^[0-9A-Fa-f]{2}"),
                F.when(unreserved, F.concat(F.call_function("char", code), rest))
                .otherwise(F.concat(F.lit("%"), hex2, rest)),
            )
            .otherwise(F.concat(F.lit("%"), s))
        )

    return F.concat(head, F.array_join(F.transform(tail, fix), ""))


def canonicalize_url(url: Column | str) -> Column:
    """Messy URL → canonical form (module docstring). '' stays ''
    componentwise: a string with no scheme yields empty scheme/host
    and the result is not a usable URL — filter upstream."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    path = url_path(url)
    query = url_query(url)
    is_default = F.lit(False)
    for s, p in DEFAULT_PORTS:
        is_default = is_default | ((scheme == s) & (port == p))
    port_part = F.when((port == "") | is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path_part = pct_normalize(F.when(path == "", F.lit("/")).otherwise(path))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    q_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), pct_normalize(sorted_q))
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part)
