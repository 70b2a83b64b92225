"""From-scratch PDF text source (r11) — the most common non-HTML
document format in LLM corpora.

Same correctness story as every source in the repo (archives, WARC,
the codec matrix): spec-valid PDFs are SYNTHESIZED from arithmetic
formulas worker-side (classic cross-reference table, object graph
catalog→pages→page→content stream, Tj/TJ text operators, half the
content streams FlateDecoded), parsed back FOR REAL (header check,
startxref → xref walk with offset validation, trailer /Root chain,
object parser for dicts/arrays/names/numbers/strings/references,
stream /Length + endstream cross-check, FlateDecode via stdlib zlib —
the same entropy-layer dispensation as the gzip/bz2/xz slots — and a
content-stream tokenizer extracting text in operator order from
Tj / TJ / ' / " with full escape handling), and the DuckDB oracle
recomputes per-page text statistics FROM THE FORMULAS.

Honest refusals (None, never a guessed extraction):
- encrypted documents (/Encrypt in the trailer);
- PDF 1.5+ cross-reference STREAMS (startxref pointing at an object
  instead of the ``xref`` keyword) and object streams (/ObjStm);
- filters other than a single /FlateDecode;
- any structural violation (bad offsets, /Length mismatch, malformed
  escapes, unbalanced strings).

Reference scope note: the reference engine (rickbeeloo/QueryEngine,
src/heurFuzz.py) reads plain text files; document-format ingestion is
part of the LLM-data-pipeline surface this repo adds beyond the
reference.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# synthesis formulas — mirrored in the oracle SQL
# (queries/archives.py::SOURCE_PDF_TEXT_SQL); keep in sync.
# ---------------------------------------------------------------------------
PDF_NP_MOD = 4  # pages per doc: 1 + doc % PDF_NP_MOD        (1..4)
PDF_NL_MOD = 5  # text lines per page: 2 + (doc + p) % MOD    (2..6)
PDF_LEN_BASE, PDF_LEN_MOD = 6, 20  # line length 6..25
PDF_CH = (7, 3, 5)  # char j of line ln on page p of doc d:
#                     97 + (7*d + 3*p + 5*ln + j) % 26


def pdf_n_pages(doc_id: int) -> int:
    return 1 + doc_id % PDF_NP_MOD


def pdf_n_lines(doc_id: int, p: int) -> int:
    return 2 + (doc_id + p) % PDF_NL_MOD


def pdf_line_len(doc_id: int, p: int, ln: int) -> int:
    return PDF_LEN_BASE + (doc_id + 2 * p + 3 * ln) % PDF_LEN_MOD


def pdf_line_text(doc_id: int, p: int, ln: int) -> str:
    a, b, c = PDF_CH
    return "".join(
        chr(97 + (a * doc_id + b * p + c * ln + j) % 26)
        for j in range(pdf_line_len(doc_id, p, ln))
    )


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _content_stream(doc_id: int, p: int) -> bytes:
    """Page p's content: BT/ET block, even lines as plain Tj, odd
    lines as TJ arrays with kerning numbers BETWEEN string segments
    (an extractor that grabs only the first array element, or treats
    numbers as text, fails the oracle)."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for ln in range(pdf_n_lines(doc_id, p)):
        txt = pdf_line_text(doc_id, p, ln)
        if ln % 2 == 0:
            ops.append("(" + txt + ") Tj")
        else:
            cut = max(1, len(txt) // 2)
            kern = -20 - ((doc_id + ln) % 60)
            ops.append(
                "[(" + txt[:cut] + ") " + str(kern) + " ("
                + txt[cut:] + ")] TJ"
            )
        ops.append("0 -14 Td")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def make_pdf(doc_id: int) -> bytes:
    """Spec-valid PDF 1.4: header with a binary comment line, catalog
    (1 0) → pages (2 0) → page objects each holding a /Contents
    stream — pages where (doc_id + p) is even ship FlateDecoded,
    odd ship raw — a shared Type1 font object, a classic xref table
    with correct byte offsets, and a trailer + startxref."""
    return _make_pdf_base(doc_id, stale_last=False)[0]


def make_pdf_updated(doc_id: int) -> bytes:
    """Incrementally-UPDATED PDF (r11 — the real-world shape of an
    edited document): the base body ships the last page's content as
    a STALE placeholder stream, then an appended update section
    replaces that object — new object generation, a second xref
    table covering only it, and a trailer chaining back via /Prev.
    The final document state equals the formulas, so the shared
    oracle certifies that the reader honors the update (a reader
    serving the original object emits the placeholder text and
    hash-fails)."""
    base, xref1_at, n_objs, last_cid = _make_pdf_base(
        doc_id, stale_last=True
    )
    out = bytearray(base)
    upd_off = len(out)
    raw = _content_stream(doc_id, pdf_n_pages(doc_id) - 1)
    data = zlib.compress(raw, 6)
    body = (
        ("<< /Length " + str(len(data)) + " /Filter /FlateDecode >>").encode()
        + b"\nstream\n" + data + b"\nendstream"
    )
    out += str(last_cid).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref2_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += (
        str(last_cid).encode() + b" 1\n"
        + ("%010d 00000 n \n" % upd_off).encode()
    )
    out += (
        b"trailer\n<< /Size " + str(n_objs + 1).encode()
        + b" /Root 1 0 R /Prev " + str(xref1_at).encode()
        + b" >>\nstartxref\n" + str(xref2_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


#: the stale last-page content an incremental update supersedes
PDF_STALE_TEXT = b"withdrawn draft \\(do not serve\\)"


def _make_pdf_base(
    doc_id: int, stale_last: bool
) -> tuple[bytes, int, int, int]:
    """The single-generation document → (bytes, xref offset, object
    count, last page's content object id)."""
    n_pages = pdf_n_pages(doc_id)
    objects: list[bytes] = []  # bodies of objects 1..N in id order

    # object ids: 1 catalog, 2 pages, 3 font, then per page:
    # 4+2k page, 5+2k content
    kids = " ".join(f"{4 + 2 * p} 0 R" for p in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        (
            "<< /Type /Pages /Kids [" + kids + "] /Count "
            + str(n_pages) + " >>"
        ).encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for p in range(n_pages):
        objects.append(
            (
                "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                "/Resources << /Font << /F1 3 0 R >> >> /Contents "
                + str(5 + 2 * p) + " 0 R >>"
            ).encode()
        )
        if stale_last and p == n_pages - 1:
            raw = b"BT (" + PDF_STALE_TEXT + b") Tj ET"
        else:
            raw = _content_stream(doc_id, p)
        if (doc_id + p) % 2 == 0:
            data = zlib.compress(raw, 6)
            head = (
                "<< /Length " + str(len(data))
                + " /Filter /FlateDecode >>"
            ).encode()
        else:
            data = raw
            head = ("<< /Length " + str(len(data)) + " >>").encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out), xref_at, len(objects), 5 + 2 * (n_pages - 1)


# ---------------------------------------------------------------------------
# object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Objs:
    """Minimal PDF object reader over a byte buffer; raises
    ValueError on malformation."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.b = buf
        self.p = pos

    def _skip_ws(self) -> None:
        while self.p < len(self.b):
            c = self.b[self.p]
            if c in _WS:
                self.p += 1
            elif c == 0x25:  # '%' comment to EOL
                nl = self.b.find(b"\n", self.p)
                self.p = len(self.b) if nl < 0 else nl + 1
            else:
                return

    def value(self):
        """One object: dict, array, name, number, string, bool, null,
        or an indirect reference tuple ('ref', n, g)."""
        self._skip_ws()
        if self.p >= len(self.b):
            raise ValueError("pdf: eof in object")
        b, p = self.b, self.p
        if b[p : p + 2] == b"<<":
            return self._dict()
        if b[p] == 0x5B:  # [
            self.p += 1
            arr = []
            while True:
                self._skip_ws()
                if self.p >= len(b):
                    raise ValueError("pdf: unterminated array")
                if b[self.p] == 0x5D:
                    self.p += 1
                    return arr
                arr.append(self.value())
        if b[p] == 0x2F:  # /name
            self.p += 1
            q = self.p
            while q < len(b) and b[q] not in _WS and b[q] not in _DELIM:
                q += 1
            name = b[self.p : q].decode("latin-1")
            self.p = q
            return ("name", name)
        if b[p] == 0x28:  # (string)
            return ("str", self._literal_string())
        if b[p] == 0x3C:  # <hex string>
            q = b.find(b">", p + 1)
            if q < 0:
                raise ValueError("pdf: unterminated hex string")
            hx = bytes(c for c in b[p + 1 : q] if c not in _WS)
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii"))
            except (UnicodeDecodeError, ValueError) as e:
                raise ValueError("pdf: bad hex string") from e
            self.p = q + 1
            return ("str", s)
        m = re.match(rb"[-+]?\d+(\.\d*)?|[-+]?\.\d+", b[p:])
        if m:
            tok = m.group(0)
            # indirect reference lookahead: INT INT R
            if b"." not in tok:
                m2 = re.match(
                    rb"(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])", b[p:]
                )
                if m2 and tok == m2.group(1):
                    self.p = p + m2.end()
                    return ("ref", int(m2.group(1)), int(m2.group(2)))
            self.p = p + len(tok)
            return float(tok) if b"." in tok else int(tok)
        for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
            if b[p : p + len(lit)] == lit:
                self.p = p + len(lit)
                return val
        raise ValueError("pdf: unparseable object")

    def _dict(self):
        self.p += 2
        d = {}
        while True:
            self._skip_ws()
            if self.b[self.p : self.p + 2] == b">>":
                self.p += 2
                return d
            k = self.value()
            if not (isinstance(k, tuple) and k[0] == "name"):
                raise ValueError("pdf: dict key is not a name")
            d[k[1]] = self.value()

    def _literal_string(self) -> bytes:
        b = self.b
        p = self.p + 1
        out = bytearray()
        depth = 1
        while p < len(b):
            c = b[p]
            if c == 0x5C:  # backslash escape
                if p + 1 >= len(b):
                    raise ValueError("pdf: dangling escape")
                e = b[p + 1]
                mapped = {
                    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                    0x62: b"\b", 0x66: b"\f", 0x28: b"(",
                    0x29: b")", 0x5C: b"\\",
                }.get(e)
                if mapped is not None:
                    out += mapped
                    p += 2
                elif 0x30 <= e <= 0x37:  # \ooo octal, 1-3 digits
                    q = p + 1
                    oct_s = b""
                    while q < len(b) and len(oct_s) < 3 and 0x30 <= b[q] <= 0x37:
                        oct_s += bytes([b[q]])
                        q += 1
                    out.append(int(oct_s, 8) & 0xFF)
                    p = q
                elif e in (0x0A, 0x0D):  # line continuation
                    p += 2
                    if e == 0x0D and p < len(b) and b[p] == 0x0A:
                        p += 1
                else:  # unknown escape: the char itself (spec §7.3.4.2)
                    out.append(e)
                    p += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.p = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise ValueError("pdf: unterminated string")


# ---------------------------------------------------------------------------
# document walk
# ---------------------------------------------------------------------------


def _parse_xref_section(
    b: bytes, xref_at: int
) -> tuple[dict[int, int], dict] | None:
    """One classic xref table at ``xref_at`` → (obj id → offset,
    trailer). A cross-reference STREAM (PDF 1.5+: startxref pointing
    at ``N G obj``) refuses."""
    if xref_at >= len(b):
        return None
    if not b[xref_at:].lstrip().startswith(b"xref"):
        return None  # xref STREAM (PDF 1.5 /ObjStm world): refuse
    r = _Objs(b, b.index(b"xref", xref_at) + 4)
    offsets: dict[int, int] = {}
    while True:
        r._skip_ws()
        if b[r.p : r.p + 7] == b"trailer":
            r.p += 7
            trailer = r.value()
            if not isinstance(trailer, dict):
                return None
            return offsets, trailer
        m2 = re.match(rb"(\d+)\s+(\d+)", b[r.p :])
        if not m2:
            return None
        start, count = int(m2.group(1)), int(m2.group(2))
        r.p += m2.end()
        for k in range(count):
            r._skip_ws()
            m3 = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", b[r.p :])
            if not m3:
                return None
            if m3.group(3) == b"n":
                offsets[start + k] = int(m3.group(1))
            r.p += m3.end()


def _parse_xref(b: bytes) -> tuple[dict[int, int], dict] | None:
    """startxref → the NEWEST xref table, then the /Prev chain of an
    incrementally-updated document (r11): each earlier section fills
    in only the object ids the newer sections did not already define
    (the update wins — a reader that takes the original object serves
    STALE content and fails the oracle). The newest trailer is
    authoritative for /Root; /Encrypt anywhere in the chain refuses;
    /Prev cycles refuse."""
    tail = b[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass  # keep the LAST startxref (incremental updates)
    if m is None:
        return None
    xref_at = int(m.group(1))
    seen: set[int] = set()
    offsets: dict[int, int] = {}
    newest_trailer: dict | None = None
    while True:
        if xref_at in seen or len(seen) > 64:
            return None  # /Prev cycle or absurd chain
        seen.add(xref_at)
        sec = _parse_xref_section(b, xref_at)
        if sec is None:
            return None
        sec_offsets, trailer = sec
        for k, v in sec_offsets.items():
            offsets.setdefault(k, v)  # newer sections win
        if newest_trailer is None:
            newest_trailer = trailer
        if "Encrypt" in trailer:
            newest_trailer = dict(newest_trailer)
            newest_trailer["Encrypt"] = trailer["Encrypt"]
        prev = trailer.get("Prev")
        if prev is None:
            return offsets, newest_trailer
        if not isinstance(prev, int):
            return None
        xref_at = prev


def _load_object(b: bytes, offsets: dict[int, int], num: int):
    """Object ``num`` at its xref offset: validates the ``N G obj``
    header, returns (value, stream_bytes | None)."""
    off = offsets.get(num)
    if off is None or off >= len(b):
        raise ValueError("pdf: missing object")
    m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", b[off:])
    if not m or int(m.group(1)) != num:
        raise ValueError("pdf: xref offset does not hit the object")
    r = _Objs(b, off + m.end())
    val = r.value()
    r._skip_ws()
    if b[r.p : r.p + 6] == b"stream":
        if not isinstance(val, dict):
            raise ValueError("pdf: stream without a dict")
        q = r.p + 6
        if b[q : q + 2] == b"\r\n":
            q += 2
        elif b[q : q + 1] == b"\n":
            q += 1
        ln = val.get("Length")
        if isinstance(ln, tuple) and ln[0] == "ref":
            ln = _load_object(b, offsets, ln[1])[0]
        if not isinstance(ln, int) or q + ln > len(b):
            raise ValueError("pdf: bad stream length")
        data = b[q : q + ln]
        tail = b[q + ln :].lstrip(b"\r\n")
        if not tail.startswith(b"endstream"):
            raise ValueError("pdf: /Length does not reach endstream")
        return val, data
    return val, None


def _deref(b, offsets, v):
    if isinstance(v, tuple) and v[0] == "ref":
        return _load_object(b, offsets, v[1])[0]
    return v


def _extract_text_ops(content: bytes) -> list[bytes] | None:
    """Content-stream walk: every string SHOWN by Tj / TJ / ' / ",
    in operator order. TJ arrays contribute the concatenation of
    their string elements (kerning numbers are positioning, not
    text). Strings used by non-showing operators are ignored."""
    r = _Objs(content, 0)
    stack: list = []
    out: list[bytes] = []
    while True:
        r._skip_ws()
        if r.p >= len(content):
            return out
        c = content[r.p]
        if (
            c in b"([</+-."
            or 0x30 <= c <= 0x39
            or content[r.p : r.p + 2] == b"<<"
        ):
            try:
                stack.append(r.value())
            except ValueError:
                return None
            continue
        m = re.match(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*", content[r.p :])
        if not m:
            return None
        op = m.group(0)
        r.p += m.end()
        if op in (b"Tj", b"'", b'"'):
            if not stack or not (
                isinstance(stack[-1], tuple) and stack[-1][0] == "str"
            ):
                return None
            out.append(stack[-1][1])
        elif op == b"TJ":
            if not stack or not isinstance(stack[-1], list):
                return None
            shown = bytearray()
            for el in stack[-1]:
                if isinstance(el, tuple) and el[0] == "str":
                    shown += el[1]
                elif not isinstance(el, (int, float)):
                    return None
            out.append(bytes(shown))
        stack.clear() if op in (b"Tj", b"TJ", b"'", b'"') else None
        if op not in (b"Tj", b"TJ", b"'", b'"'):
            stack.clear()  # other operators consume their operands


def parse_pdf_text(b: bytes) -> list[list[bytes]] | None:
    """bytes → per-page lists of shown text strings (operator order),
    or None. Walks header → startxref → classic xref → trailer /Root
    → /Pages → /Kids → each page's /Contents stream (FlateDecode
    undone via stdlib zlib), then tokenizes the content stream for
    Tj/TJ/'/\" show operators. Refusals per the module docstring."""
    try:
        return _parse_pdf_strict(b)
    except (ValueError, KeyError, IndexError, TypeError, zlib.error):
        return None


def _parse_pdf_strict(b: bytes) -> list[list[bytes]] | None:
    if not b.startswith(b"%PDF-"):
        return None
    xr = _parse_xref(b)
    if xr is None:
        return None
    offsets, trailer = xr
    if "Encrypt" in trailer:
        return None  # encrypted document: honest refusal
    root = trailer.get("Root")
    if not (isinstance(root, tuple) and root[0] == "ref"):
        return None
    catalog = _load_object(b, offsets, root[1])[0]
    if _deref(b, offsets, catalog.get("Type")) != ("name", "Catalog"):
        return None
    pages = _deref(b, offsets, catalog.get("Pages"))
    if not isinstance(pages, dict):
        return None
    kids = _deref(b, offsets, pages.get("Kids"))
    count = _deref(b, offsets, pages.get("Count"))
    if not isinstance(kids, list) or count != len(kids):
        return None
    doc: list[list[bytes]] = []
    for kid in kids:
        if not (isinstance(kid, tuple) and kid[0] == "ref"):
            return None
        page = _load_object(b, offsets, kid[1])[0]
        if not isinstance(page, dict) or page.get("Type") != ("name", "Page"):
            return None
        cref = page.get("Contents")
        if not (isinstance(cref, tuple) and cref[0] == "ref"):
            return None
        cdict, data = _load_object(b, offsets, cref[1])
        if data is None:
            return None
        filt = cdict.get("Filter")
        if filt is not None:
            if filt != ("name", "FlateDecode"):
                return None  # DCT/LZW/ASCII85/filter arrays: refuse
            data = zlib.decompress(data)
        ops = _extract_text_ops(data)
        if ops is None:
            return None
        doc.append(ops)
    return doc


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------

PDF_ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

PDF_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("page_idx", IntegerType()),
        StructField("n_pages", IntegerType()),
        StructField("n_text_ops", IntegerType()),
        StructField("text_len", LongType()),
        StructField("char_sum", LongType()),
    ]
)


def synthesize_pdf(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One PDF per input row, built worker-side (mapInPandas).
    doc_id % 3 == 2 ships INCREMENTALLY UPDATED (stale last page +
    appended update section chained via /Prev — the edited-document
    shape), the rest single-generation; final text state is identical
    either way, so the formula oracle certifies both walks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = [int(a) for a in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_, dtype="int64"),
                    "payload": [
                        make_pdf_updated(a) if a % 3 == 2 else make_pdf(a)
                        for a in ids_
                    ],
                }
            )

    return ids.mapInPandas(run, PDF_ASSET_SCHEMA)


def pdf_text_stats(assets: DataFrame) -> DataFrame:
    """Parse each PDF and emit one row per page: show-operator count,
    total extracted text length, and the exact byte-sum of the text —
    certifying the xref walk, stream decode, and the Tj/TJ
    concatenation semantics against the oracle's formula expansion.
    Row-linear mapInPandas, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                doc = (
                    parse_pdf_text(bytes(payload))
                    if payload is not None
                    else None
                )
                if doc is None:
                    continue
                for p, ops in enumerate(doc):
                    text = b"".join(ops)
                    rows.append(
                        (
                            int(did), p, len(doc), len(ops),
                            len(text), sum(text),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PDF_STATS_SCHEMA.fields]
            )

    return assets.mapInPandas(run, PDF_STATS_SCHEMA)
