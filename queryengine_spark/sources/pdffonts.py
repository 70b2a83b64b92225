"""Simple-font text decoding for the PDF source (r12) — the layer
between "which byte codes were shown" and "which Unicode text the
document displays".

A crawled PDF's text bytes are only meaningful through its fonts:
each simple (single-byte) font maps codes 0..255 to glyphs via an
encoding — a named base encoding (/WinAnsiEncoding,
/MacRomanEncoding), an /Encoding dictionary refining a base with a
/Differences array of (code, glyphname...) runs, or the font's
built-in encoding — and optionally carries a /ToUnicode CMap stream
mapping codes straight to UTF-16BE text (which, when present, is
authoritative for extraction). A byte-passthrough extractor silently
mis-reads every custom-encoded font; this module makes the decode
explicit:

- glyph-name → Unicode via the Adobe Glyph List naming conventions:
  the algorithmic ``uniXXXX`` / ``uXXXX[XX]`` forms, an
  algorithmically derived Latin-1 letter block (AGL accent-suffix
  names reconstructed from the Unicode character names — agrave,
  eacute, ntilde, ...), and a hand table of the ASCII / Latin-1
  symbol / cp1252-C1 glyph names;
- base encodings /WinAnsiEncoding and /MacRomanEncoding through the
  stdlib cp1252 / mac_roman codecs (same dispensation as zlib for
  the entropy layer: the TABLES are published, the stdlib carries
  them verbatim);
- /Differences arrays (multiple code runs, spec §9.6.6.1);
- /ToUnicode CMaps: bfchar pairs, bfrange with contiguous
  destination AND the bracketed destination-array form, UTF-16BE
  destinations including multi-unit (ligature) expansions
  (spec §9.10.3).

Honest refusals (None, surfaced as a document refusal by the
caller):
- composite /Subtype /Type0 (CID) fonts — multi-byte code spaces
  are out of contract;
- base-encoding names other than the two above (incl. explicit
  /StandardEncoding — nothing synthesizes it and guessing Adobe's
  table from memory is how mojibake happens);
- a SHOWN code whose table entry is undefined (unknown glyph name,
  cp1252 hole, no Differences/base coverage) — never U+FFFD
  guessing;
- malformed CMaps (odd hex, multi-byte source codes, unbalanced
  sections).

Fonts carrying NO /Encoding and NO /ToUnicode keep byte-passthrough
semantics (the document's built-in-encoding case) — deliberately:
it preserves the repo's long-certified byte-level extraction for
the plain-Helvetica corpus flavors, and it is what a spec reader
may do absent any encoding information.

Reference scope note: the reference engine (rickbeeloo/QueryEngine,
src/heurFuzz.py) reads plain text files; document-format ingestion
is part of the LLM-data-pipeline surface this repo adds beyond the
reference.
"""

from __future__ import annotations

import re
import unicodedata

# ---------------------------------------------------------------------------
# Adobe Glyph List subset
# ---------------------------------------------------------------------------

#: ASCII + Latin-1 symbols + cp1252 C1 names, typed from the
#: published AGL; letters and digits are generated below.
_AGL_HAND: dict[str, int] = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22,
    "numbersign": 0x23, "dollar": 0x24, "percent": 0x25,
    "ampersand": 0x26, "quotesingle": 0x27, "parenleft": 0x28,
    "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40,
    "bracketleft": 0x5B, "backslash": 0x5C, "bracketright": 0x5D,
    "asciicircum": 0x5E, "underscore": 0x5F, "grave": 0x60,
    "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D,
    "asciitilde": 0x7E,
    # Latin-1 symbol block
    "exclamdown": 0xA1, "cent": 0xA2, "sterling": 0xA3,
    "currency": 0xA4, "yen": 0xA5, "brokenbar": 0xA6,
    "section": 0xA7, "dieresis": 0xA8, "copyright": 0xA9,
    "ordfeminine": 0xAA, "guillemotleft": 0xAB, "logicalnot": 0xAC,
    "registered": 0xAE, "macron": 0xAF, "degree": 0xB0,
    "plusminus": 0xB1, "acute": 0xB4, "mu": 0xB5, "paragraph": 0xB6,
    "periodcentered": 0xB7, "cedilla": 0xB8, "ordmasculine": 0xBA,
    "guillemotright": 0xBB, "onequarter": 0xBC, "onehalf": 0xBD,
    "threequarters": 0xBE, "questiondown": 0xBF,
    "multiply": 0xD7, "divide": 0xF7, "germandbls": 0xDF,
    # cp1252 C1 region glyphs
    "Euro": 0x20AC, "quotesinglbase": 0x201A, "florin": 0x192,
    "quotedblbase": 0x201E, "ellipsis": 0x2026, "dagger": 0x2020,
    "daggerdbl": 0x2021, "circumflex": 0x2C6, "perthousand": 0x2030,
    "Scaron": 0x160, "guilsinglleft": 0x2039, "OE": 0x152,
    "Zcaron": 0x17D, "quoteleft": 0x2018, "quoteright": 0x2019,
    "quotedblleft": 0x201C, "quotedblright": 0x201D, "bullet": 0x2022,
    "endash": 0x2013, "emdash": 0x2014, "tilde": 0x2DC,
    "trademark": 0x2122, "scaron": 0x161, "guilsinglright": 0x203A,
    "oe": 0x153, "zcaron": 0x17E, "Ydieresis": 0x178,
    # common ligature glyphs (multi-char names stay single-cp here)
    "fi": 0xFB01, "fl": 0xFB02,
    "eth": 0xF0, "Eth": 0xD0, "thorn": 0xFE, "Thorn": 0xDE,
    "ae": 0xE6, "AE": 0xC6, "oslash": 0xF8, "Oslash": 0xD8,
}

_DIGIT_NAMES = (
    "zero", "one", "two", "three", "four",
    "five", "six", "seven", "eight", "nine",
)

#: Unicode-name accent phrase → AGL suffix, for the Latin-1 letter
#: block (AGL names are base letter + suffix: agrave, Edieresis, …)
_ACCENT_SUFFIX = {
    "GRAVE": "grave",
    "ACUTE": "acute",
    "CIRCUMFLEX": "circumflex",
    "TILDE": "tilde",
    "DIAERESIS": "dieresis",
    "RING ABOVE": "ring",
}


def _build_agl() -> dict[str, int]:
    agl = dict(_AGL_HAND)
    for c in range(ord("A"), ord("Z") + 1):
        agl[chr(c)] = c
        agl[chr(c + 32)] = c + 32
    for d, name in enumerate(_DIGIT_NAMES):
        agl[name] = 0x30 + d
    # Latin-1 accented letters: reconstruct the AGL accent-suffix
    # names from the Unicode character names — no typed table to
    # mistype (ae/eth/thorn/oslash/germandbls handled above)
    pat = re.compile(
        r"^LATIN (SMALL|CAPITAL) LETTER ([A-Z]) WITH (.+)$"
    )
    for cp in range(0xC0, 0x100):
        try:
            uname = unicodedata.name(chr(cp))
        except ValueError:  # pragma: no cover - all assigned
            continue
        m = pat.match(uname)
        if not m:
            continue
        suffix = _ACCENT_SUFFIX.get(m.group(3))
        if suffix is None:
            continue
        base = m.group(2)
        letter = base if m.group(1) == "CAPITAL" else base.lower()
        agl[letter + suffix] = cp
    # C with cedilla spells "WITH CEDILLA"
    agl["ccedilla"] = 0xE7
    agl["Ccedilla"] = 0xC7
    return agl


AGL: dict[str, int] = _build_agl()

_UNI_RE = re.compile(r"^uni([0-9A-F]{4})$")
_U_RE = re.compile(r"^u([0-9A-F]{4,6})$")


def glyph_to_text(name: str) -> str | None:
    """AGL glyph name → text, or None (unknown name — the caller
    refuses if the code is ever shown)."""
    m = _UNI_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if 0xD800 <= cp <= 0xDFFF:
            return None  # lone surrogate is not a character
        return chr(cp)
    m = _U_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return None
        return chr(cp)
    cp = AGL.get(name)
    return chr(cp) if cp is not None else None


# ---------------------------------------------------------------------------
# base encodings
# ---------------------------------------------------------------------------


def _codec_table(codec: str) -> list[str | None]:
    tab: list[str | None] = []
    for c in range(256):
        try:
            tab.append(bytes([c]).decode(codec))
        except UnicodeDecodeError:
            tab.append(None)  # undefined code: refuse if shown
    return tab


#: /WinAnsiEncoding is the cp1252 table; /MacRomanEncoding the
#: classic Mac OS Roman table — both published in the PDF spec's
#: Annex D and carried verbatim by the stdlib codecs.
_BASE_ENCODINGS: dict[str, list[str | None]] = {
    "WinAnsiEncoding": _codec_table("cp1252"),
    "MacRomanEncoding": _codec_table("mac_roman"),
}


def base_encoding_table(name: str) -> list[str | None] | None:
    """Named base encoding → 256-entry code table (copy), or None
    for names out of contract (/StandardEncoding, /PDFDocEncoding,
    expert sets — refuse, never guess a table)."""
    tab = _BASE_ENCODINGS.get(name)
    return list(tab) if tab is not None else None


def apply_differences(
    table: list[str | None], diffs: list
) -> list[str | None] | None:
    """Apply an /Encoding /Differences array (runs of an integer
    code followed by glyph names, §9.6.6.1) onto ``table`` in
    place; returns the table, or None on malformation. Unknown
    glyph names map to None (refusal deferred to a show)."""
    code = None
    for el in diffs:
        if isinstance(el, bool):
            return None
        if isinstance(el, int):
            if not 0 <= el <= 255:
                return None
            code = el
        elif isinstance(el, tuple) and el[0] == "name":
            if code is None or code > 255:
                return None
            table[code] = glyph_to_text(el[1])
            code += 1
        else:
            return None
    return table


# ---------------------------------------------------------------------------
# ToUnicode CMaps
# ---------------------------------------------------------------------------

_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
# one bfrange entry: <lo> <hi> then either <dst> or [ <d> <d> ... ]
_RANGE_ENTRY_RE = re.compile(
    rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*"
    rb"(<[0-9A-Fa-f\s]*>|\[[^\]]*\])",
    re.S,
)


def _hex_bytes(h: bytes) -> bytes | None:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        return None
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return None


def _utf16be_text(b: bytes) -> str | None:
    if len(b) % 2:
        return None
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return None  # unpaired surrogate etc.


def _src_code(b: bytes | None) -> int | None:
    """Simple fonts carry ONE-byte codes; a wider source code means
    a CID code space — out of contract."""
    if b is None or len(b) != 1:
        return None
    return b[0]


def parse_tounicode(data: bytes) -> dict[int, str] | None:
    """ToUnicode CMap stream content → {code: text}, or None.
    Handles bfchar pairs and bfrange in both destination forms;
    destinations are UTF-16BE and may expand to multiple characters
    (ligatures)."""
    out: dict[int, str] = {}
    saw_section = False
    for sec in _BFCHAR_RE.findall(data):
        saw_section = True
        hexes = _HEX_RE.findall(sec)
        if len(hexes) % 2:
            return None
        for i in range(0, len(hexes), 2):
            code = _src_code(_hex_bytes(hexes[i]))
            if code is None:
                return None
            dst = _hex_bytes(hexes[i + 1])
            txt = _utf16be_text(dst) if dst is not None else None
            if txt is None:
                return None
            out[code] = txt
    for sec in _BFRANGE_RE.findall(data):
        saw_section = True
        consumed = 0
        for m in _RANGE_ENTRY_RE.finditer(sec):
            consumed += 1
            lo = _src_code(_hex_bytes(m.group(1)))
            hi = _src_code(_hex_bytes(m.group(2)))
            if lo is None or hi is None or lo > hi:
                return None
            dst = m.group(3)
            if dst.startswith(b"["):
                hexes = _HEX_RE.findall(dst)
                if len(hexes) != hi - lo + 1:
                    return None
                for k, h in enumerate(hexes):
                    db = _hex_bytes(h)
                    txt = _utf16be_text(db) if db is not None else None
                    if txt is None:
                        return None
                    out[lo + k] = txt
            else:
                db = _hex_bytes(dst[1:-1])
                txt = _utf16be_text(db) if db is not None else None
                if txt is None or not txt:
                    return None
                # contiguous destination: increment the LAST code
                # unit (spec §9.10.3 example semantics)
                head, last = txt[:-1], ord(txt[-1])
                if last + (hi - lo) > 0x10FFFF or (
                    last <= 0xDFFF and last + (hi - lo) >= 0xD800
                ):
                    return None  # walks off / through surrogates
                for k in range(hi - lo + 1):
                    out[lo + k] = head + chr(last + k)
        # junk between entries (unparsed leftovers) refuses: the
        # section must be exactly a sequence of entries
        stripped = _RANGE_ENTRY_RE.sub(b"", sec).strip()
        if stripped:
            return None
        if consumed == 0 and sec.strip():
            return None
    if not saw_section:
        return None  # a ToUnicode with no mappings is malformed
    return out


# ---------------------------------------------------------------------------
# the per-font decoder
# ---------------------------------------------------------------------------


class FontDecoder:
    """code bytes → text for one simple font. ``table`` is the
    encoding-derived 256-entry map (None = passthrough font with no
    encoding info); ``tounicode`` overrides per code when present."""

    __slots__ = ("table", "tounicode")

    def __init__(
        self,
        table: list[str | None] | None,
        tounicode: dict[int, str] | None,
    ) -> None:
        self.table = table
        self.tounicode = tounicode

    def decode(self, raw: bytes) -> bytes | None:
        """Shown string bytes → UTF-8 text bytes, or None when any
        code is undefined under this font (refuse, never U+FFFD)."""
        if self.table is None and self.tounicode is None:
            return raw  # no encoding info: byte passthrough
        parts: list[str] = []
        for c in raw:
            if self.tounicode is not None and c in self.tounicode:
                parts.append(self.tounicode[c])
                continue
            t = self.table[c] if self.table is not None else None
            if t is None:
                return None
            parts.append(t)
        return "".join(parts).encode("utf-8")
