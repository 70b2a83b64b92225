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

Deliberately NOT done (documented): IDN/punycode — needs codepoint
tables that would bury the Spark-side plumbing this module exists to
show; and public-suffix-list domain extraction — :func:`url_domain`
returns the last two host labels, the standard approximation when
the PSL isn't shipped (swap in a broadcast PSL table in production).
"""

from __future__ import annotations

from pyspark.sql import Column
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
    """Registered-domain approximation: the last two dot-labels of
    the host ('www.a.b.com' → 'b.com'). Production swaps in a
    public-suffix-list broadcast table (see module docstring)."""
    parts = F.split(host, r"\.")
    return F.array_join(F.slice(parts, -2, 2), ".")


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
