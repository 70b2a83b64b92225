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

Deliberately NOT done (documented): percent-encoding normalization
(%7E vs ~) and IDN/punycode — both need codepoint tables that would
bury the Spark-side plumbing this module exists to show; and
public-suffix-list domain extraction — :func:`url_domain` returns the
last two host labels, the standard approximation when the PSL isn't
shipped (swap in a broadcast PSL table in production).
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
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def url_domain(host: Column | str) -> Column:
    """Registered-domain approximation: the last two dot-labels of
    the host ('www.a.b.com' → 'b.com'). Production swaps in a
    public-suffix-list broadcast table (see module docstring)."""
    parts = F.split(host, r"\.")
    return F.array_join(F.slice(parts, -2, 2), ".")


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
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    q_part = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part)
