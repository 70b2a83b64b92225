"""From-scratch PDF text source (sources/pdf.py): writer↔parser
round-trips against the synthesis formulas, hand-built byte vectors
the writer never emits (escapes, hex strings, octal, indirect
/Length), and honest-refusal probes (encryption, xref streams,
foreign filters, lying offsets/lengths)."""

from __future__ import annotations

import zlib

import pytest

from queryengine_spark.sources.pdf import (
    make_pdf,
    parse_pdf_text,
    pdf_line_text,
    pdf_n_lines,
    pdf_n_pages,
)


@pytest.mark.parametrize("d", list(range(12)))
def test_roundtrip_matches_formula(d):
    doc = parse_pdf_text(make_pdf(d))
    assert doc is not None
    assert len(doc) == pdf_n_pages(d)
    for p, ops in enumerate(doc):
        assert ops == [
            pdf_line_text(d, p, ln).encode()
            for ln in range(pdf_n_lines(d, p))
        ]


def _mini_pdf(content: bytes, *, filt: bool = False,
              trailer_extra: bytes = b"",
              length_override: int | None = None,
              indirect_length: bool = False) -> bytes:
    """One-page hand-assembled PDF around an arbitrary content
    stream."""
    data = zlib.compress(content) if filt else content
    ln = len(data) if length_override is None else length_override
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    ]
    head = b"<< /Length " + (
        b"5 0 R" if indirect_length else str(ln).encode()
    )
    if filt:
        head += b" /Filter /FlateDecode"
    head += b" >>"
    objs.append(head + b"\nstream\n" + data + b"\nendstream")
    if indirect_length:
        objs.append(str(ln).encode())
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R " + trailer_extra + b">>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def test_hand_escapes_hex_and_octal():
    r"""Literal-string escapes (\( \) \\ \n octal), hex strings shown
    by Tj, the ' show operator, and TJ kerning-number skipping — the
    corners the arithmetic writer never emits."""
    content = (
        rb"BT (a\(b\)c\\d\101) Tj "
        b"<48656C6C6F> Tj "
        rb"(line2) ' "
        b"[(x) -120 (y) 3.5 (z)] TJ ET"
    )
    doc = parse_pdf_text(_mini_pdf(content))
    assert doc == [[b"a(b)c\\dA", b"Hello", b"line2", b"xyz"]]


def test_hand_flate_and_indirect_length():
    content = b"BT (flate page) Tj ET"
    assert parse_pdf_text(_mini_pdf(content, filt=True)) == [[b"flate page"]]
    assert parse_pdf_text(_mini_pdf(content, indirect_length=True)) == [
        [b"flate page"]
    ]


def test_refusals():
    content = b"BT (t) Tj ET"
    good = _mini_pdf(content)
    # encrypted
    assert parse_pdf_text(
        _mini_pdf(content, trailer_extra=b"/Encrypt 9 0 R ")
    ) is None
    # lying /Length (stream does not reach endstream)
    assert parse_pdf_text(_mini_pdf(content, length_override=3)) is None
    # foreign filter
    bad = good.replace(b"/Length", b"/Filter /LZWDecode /Length")
    assert parse_pdf_text(bad) is None
    # truncations (note: cutting only the %%EOF comment leaves a
    # structurally complete document — readers accept that; cutting
    # into startxref or the body must refuse)
    for cut in (0, 10, len(good) // 2, good.rindex(b"startxref") + 12):
        assert parse_pdf_text(good[:cut]) is None
    # not a PDF
    assert parse_pdf_text(b"") is None
    assert parse_pdf_text(b"GIF89a" + b"\x00" * 64) is None
    # startxref pointing at a non-/Type /XRef object: refuse
    xs = good[: good.rindex(b"startxref")] + b"startxref\n9\n%%EOF\n"
    assert parse_pdf_text(xs) is None
    # a /Length reference cycle (object's /Length is itself) must
    # refuse, not blow the interpreter stack
    cyc = _mini_pdf(content, indirect_length=True).replace(
        b"/Length 5 0 R", b"/Length 4 0 R"
    )
    assert parse_pdf_text(cyc) is None
    # corrupt xref offset (points mid-object)
    broken = bytearray(good)
    i = broken.index(b"0000000000 65535 f \n") + len(b"0000000000 65535 f \n")
    broken[i : i + 10] = b"0000000003"
    assert parse_pdf_text(bytes(broken)) is None


def test_unbalanced_and_malformed_strings_refuse():
    assert parse_pdf_text(_mini_pdf(b"BT (unterminated Tj ET")) is None
    assert parse_pdf_text(_mini_pdf(b"BT ) Tj ET")) is None
    # TJ with a non-string, non-number element
    assert parse_pdf_text(_mini_pdf(b"BT [(a) /Nope] TJ ET")) is None
    # Tj with no operand
    assert parse_pdf_text(_mini_pdf(b"BT Tj ET")) is None


@pytest.mark.parametrize("d", [2, 5, 8, 11, 14])
def test_incremental_update_honored(d):
    """r11: doc_id % 3 == 2 ships an incrementally-updated document —
    the /Prev xref chain must serve the UPDATED last-page content,
    and the stale base really differs (a reader ignoring the update
    emits the placeholder and would hash-fail)."""
    from queryengine_spark.sources.pdf import (
        _make_pdf_base,
        make_pdf_updated,
    )

    updated = make_pdf_updated(d)
    assert parse_pdf_text(updated) == parse_pdf_text(make_pdf(d))
    base, _, _, _ = _make_pdf_base(d, stale_last=True)
    stale = parse_pdf_text(base)
    assert stale[-1] == [b"withdrawn draft (do not serve)"]
    assert stale != parse_pdf_text(updated)


def test_prev_cycle_refused():
    """A /Prev pointing back at the newest xref (cycle) refuses."""
    import re as _re

    from queryengine_spark.sources.pdf import make_pdf_updated

    u = make_pdf_updated(2)
    m = list(_re.finditer(rb"startxref\s+(\d+)", u))[-1]
    x2 = m.group(1)
    pm = _re.search(rb"/Prev (\d+)", u)
    # splice the newest xref's own offset into /Prev, padding to the
    # original field width so no other offset shifts
    patched = (
        u[: pm.start(1)]
        + x2.rjust(pm.end(1) - pm.start(1), b"0")
        + u[pm.end(1) :]
    )
    assert parse_pdf_text(patched) is None


# ---------------------------------------------------------------------------
# PDF 1.5 layouts (r11 second pass): xref streams, object streams,
# predictors, hybrid-reference, mixed /Prev chains
# ---------------------------------------------------------------------------


def _formula_doc(d):
    # the encoded-font flavor (d % 12 == 10, r12) decodes each
    # ASCII formula char to U+00E0+k (Differences + WinAnsi) or,
    # under the /ToUnicode slots (d % 24 == 22), to U+0100+k
    if d % 12 == 10:
        base = 0x100 if d % 24 == 22 else 0xE0
        tr = {97 + k: chr(base + k) for k in range(26)}
        return [
            [
                pdf_line_text(d, p, ln).translate(tr).encode()
                for ln in range(pdf_n_lines(d, p))
            ]
            for p in range(pdf_n_pages(d))
        ]
    return [
        [
            pdf_line_text(d, p, ln).encode()
            for ln in range(pdf_n_lines(d, p))
        ]
        for p in range(pdf_n_pages(d))
    ]


@pytest.mark.parametrize("d", list(range(36)))
def test_all_layout_flavors_match_formula(d):
    """All nine corpus flavors — classic, xref-stream/ObjStm with
    and without predictors, hybrid, both update chains, both RC4
    encryption revisions, and the encoded-font slots — extract the
    formula text (decoded per flavor)."""
    from queryengine_spark.sources.pdf import make_pdf_any

    assert parse_pdf_text(make_pdf_any(d)) == _formula_doc(d)


def test_xrefstream_layout_is_really_modern():
    """The 1.5 flavor must actually exercise the modern structures:
    no classic ``xref`` keyword, an /ObjStm, an /XRef stream, and
    (odd ids) a predictor declaration."""
    from queryengine_spark.sources.pdf import make_pdf_xrefstream

    b = make_pdf_xrefstream(5)  # 5 % 2 == 1 → predictor, % 4 == 1 → split /Index
    assert b"\nxref\n" not in b and b"trailer" not in b
    assert b"/ObjStm" in b and b"/XRef" in b
    assert b"/Predictor 15" in b and b"/Index [" in b
    b4 = make_pdf_xrefstream(4)
    assert b"/Predictor" not in b4
    assert parse_pdf_text(b) == _formula_doc(5)
    assert parse_pdf_text(b4) == _formula_doc(4)


def test_hybrid_requires_xrefstm():
    """Hybrid-reference: the classic table alone cannot resolve the
    catalog (it lives in the ObjStm) — dropping /XRefStm from the
    trailer must refuse, honoring it must match the formulas."""
    from queryengine_spark.sources.pdf import make_pdf_hybrid

    b = make_pdf_hybrid(9)
    assert b"/XRefStm" in b
    assert parse_pdf_text(b) == _formula_doc(9)
    crippled = b.replace(b"/XRefStm", b"/XRefStX")
    assert parse_pdf_text(crippled) is None


@pytest.mark.parametrize("d", [5, 11, 17, 23])
def test_mixed_chain_update_honored(d):
    """doc_id % 6 == 5: classic base + xref-STREAM update section.
    The update must be served (stale placeholder refused by value)."""
    from queryengine_spark.sources.pdf import make_pdf_updated_xrstream

    b = make_pdf_updated_xrstream(d)
    assert b"/Prev" in b and b"/XRef" in b and b"\nxref\n" in b
    doc = parse_pdf_text(b)
    assert doc == _formula_doc(d)
    assert all(b"withdrawn draft" not in op for ops in doc for op in ops)


def test_predictor_undo_all_tags():
    """PNG predictor undo: synthesis applies a cycling tag per row,
    the reader reconstructs exactly; TIFF predictor 2; refusals for
    unknown tags and ragged data."""
    from queryengine_spark.sources.pdf import (
        _png_filter_rows,
        _undo_predictor,
    )

    rows = [bytes((i * 37 + j * 11) % 256 for j in range(5)) for i in range(7)]
    filtered = _png_filter_rows(rows, 1)
    assert _undo_predictor(filtered, 15, 5, 1, 8) == b"".join(rows)
    # any predictor value >= 10 reads per-row tags the same way
    assert _undo_predictor(filtered, 12, 5, 1, 8) == b"".join(rows)
    # TIFF horizontal
    raw = bytes([10, 250, 7, 3, 200, 100])
    tiff = bytes([10, 240, 13, 252, 197, 156])
    assert _undo_predictor(tiff, 2, 6, 1, 8) == raw
    # predictor 1 = identity
    assert _undo_predictor(raw, 1, 6, 1, 8) == raw
    # refusals: unknown row tag, ragged length, unknown predictor
    assert _undo_predictor(b"\x09" + bytes(5), 15, 5, 1, 8) is None
    assert _undo_predictor(filtered[:-1], 15, 5, 1, 8) is None
    assert _undo_predictor(raw, 7, 6, 1, 8) is None


def test_xrefstream_refusals():
    """Malformed xref streams refuse instead of guessing: /W sum 0,
    /Index count mismatch, object-stream entry mismatch."""
    from queryengine_spark.sources.pdf import make_pdf_xrefstream

    good = make_pdf_xrefstream(4)
    assert parse_pdf_text(good.replace(b"/W [1 3 1]", b"/W [0 0 0]")) is None
    assert parse_pdf_text(good.replace(b"/Type /XRef", b"/Type /Xref")) is None
    # /Size lie → /Index [0 Size] row-count mismatch
    import re as _re

    m = _re.search(rb"/Size (\d+)", good)
    bad_size = str(int(m.group(1)) + 3).encode().rjust(
        len(m.group(1)), b"0"
    )
    assert parse_pdf_text(
        good[: m.start(1)] + bad_size + good[m.end(1) :]
    ) is None
    # ObjStm /First beyond the body
    assert parse_pdf_text(
        good.replace(b"/First ", b"/First 9")
    ) is None


def test_modern_truncations_and_bitflips_never_crash():
    import random

    from queryengine_spark.sources.pdf import make_pdf_any

    for d in (1, 3, 5):
        b = make_pdf_any(d)
        step = max(1, len(b) // 40)
        for cut in range(0, len(b), step):
            parse_pdf_text(b[:cut])  # must not raise
        rng = random.Random(d)
        for _ in range(120):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_pdf_text(bytes(fb))  # must not raise


# ---------------------------------------------------------------------------
# encryption (r11 third pass): standard security handler, RC4,
# empty user password
# ---------------------------------------------------------------------------


def test_rc4_published_vectors():
    """The RC4 primitive against the classic published vectors —
    the only externally-pinnable piece of the handler in this
    offline sandbox (MD5 is stdlib)."""
    from queryengine_spark.sources.pdfcrypt import rc4

    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45a01f645fc35b383552544b9bf5"
    )
    # RC4 is its own inverse
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


@pytest.mark.parametrize("d,r", [(6, 2), (9, 3), (18, 2), (33, 3)])
def test_encrypted_roundtrip(d, r):
    from queryengine_spark.sources.pdf import make_pdf_encrypted

    b = make_pdf_encrypted(d, r=r)
    assert b"/Encrypt" in b and b"/Filter /Standard" in b
    # content really is ciphertext: no formula line appears raw
    assert _formula_doc(d)[0][0] not in b
    assert parse_pdf_text(b) == _formula_doc(d)


def test_encrypted_refusals():
    """Tampering with any handler input (/O, /U, /P, /ID) must flip
    the user-password verification and refuse; unsupported
    revisions / missing /ID refuse structurally."""
    from queryengine_spark.sources.pdf import make_pdf_encrypted

    b = make_pdf_encrypted(6, r=2)

    def flip_hex(buf, marker):
        i = buf.index(marker) + len(marker) + 2
        t = bytearray(buf)
        t[i] = ord("0") if t[i] != ord("0") else ord("1")
        return bytes(t)

    assert parse_pdf_text(flip_hex(b, b"/O <")) is None
    assert parse_pdf_text(flip_hex(b, b"/U <")) is None
    assert parse_pdf_text(flip_hex(b, b"/ID [<")) is None
    assert parse_pdf_text(b.replace(b"/P -3904", b"/P -3903")) is None
    # V/R combination mismatch (V1 with R3) refuses structurally
    assert parse_pdf_text(b.replace(b"/R 2", b"/R 3")) is None
    # unsupported: AES (/V 4), R4, non-Standard handler
    assert parse_pdf_text(
        b.replace(b"/V 1 /R 2", b"/V 4 /R 4")
    ) is None
    assert parse_pdf_text(
        b.replace(b"/Filter /Standard", b"/Filter /MyCrypt ")
    ) is None
    # missing /ID
    noid = b[: b.index(b" /ID [")] + b" >>" + b[b.index(b">>\nstartxref") :]
    assert parse_pdf_text(noid) is None


def test_aes_fips_197_vector():
    """The from-scratch AES-128 against FIPS-197 Appendix C.1 — the
    externally-pinnable anchor for the /AESV2 path (the S-box is
    generated, so this vector certifies the whole cipher)."""
    from queryengine_spark.sources.pdfcrypt import (
        _expand_key_128,
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
        aes128_decrypt_block,
        aes128_encrypt_block,
    )

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    ks = _expand_key_128(key)
    assert aes128_encrypt_block(ks, pt) == ct
    assert aes128_decrypt_block(ks, ct) == pt
    # CBC + PKCS#7 round-trip and bad-padding refusal
    iv = bytes(range(16))
    data = b"aes cbc round trip payload"
    enc = aes128_cbc_encrypt(key, iv, data)
    assert aes128_cbc_decrypt(key, enc) == data
    assert aes128_cbc_decrypt(key, enc[:-16] + bytes(16)) is None
    assert aes128_cbc_decrypt(key, enc[:24]) is None  # ragged length


@pytest.mark.parametrize("d", [21, 45, 4])
def test_aesv2_encrypted_roundtrip(d):
    """/V 4 /R 4 /StdCF /CFM /AESV2: AES-128-CBC streams decrypt to
    the formula text; tampering with /U refuses."""
    from queryengine_spark.sources.pdf import make_pdf_encrypted

    b = make_pdf_encrypted(d, r=4)
    assert b"/AESV2" in b and b"/StmF /StdCF" in b
    assert _formula_doc(d)[0][0] not in b
    assert parse_pdf_text(b) == _formula_doc(d)
    # unsupported CFM variants refuse
    assert parse_pdf_text(b.replace(b"/AESV2", b"/AESV3")) is None
    assert parse_pdf_text(
        b.replace(b"/StrF /StdCF", b"/StrF /Identity")
    ) is None


def test_real_user_password_refuses():
    """A document keyed to a NON-empty user password must refuse:
    build one by deriving /U from user pw 'secret' and check the
    empty-password verifier rejects it."""
    import hashlib

    from queryengine_spark.sources.pdfcrypt import (
        compute_key,
        compute_o,
        compute_u,
        verify_empty_user_password,
    )

    id0 = hashlib.md5(b"x").digest()
    for r, nb in ((2, 5), (3, 16)):
        o = compute_o(b"owner", b"secret", r, nb)
        key = compute_key(b"secret", o, -3904, id0, r, nb)
        u = compute_u(key, id0, r)
        assert verify_empty_user_password(o, u, -3904, id0, r, nb) is None
        # and the matching empty-pw document verifies
        o2 = compute_o(b"owner", b"", r, nb)
        k2 = compute_key(b"", o2, -3904, id0, r, nb)
        u2 = compute_u(k2, id0, r)
        assert (
            verify_empty_user_password(o2, u2, -3904, id0, r, nb) == k2
        )


def test_spark_stats_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from queryengine_spark.sources.pdf import pdf_text_stats, synthesize_pdf

    ids = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    df = pdf_text_stats(synthesize_pdf(ids))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = df.collect()
    assert len(rows) == sum(pdf_n_pages(d) for d in range(6))
    for r in rows:
        texts = [
            pdf_line_text(r.doc_id, r.page_idx, ln)
            for ln in range(pdf_n_lines(r.doc_id, r.page_idx))
        ]
        assert r.n_text_ops == len(texts)
        assert r.text_len == sum(len(t) for t in texts)
        assert r.char_sum == sum(sum(t.encode()) for t in texts)


# ---------------------------------------------------------------------------
# r12: font encodings — /Differences, base encodings, ToUnicode
# ---------------------------------------------------------------------------


def test_agl_subset_sane():
    import unicodedata

    from queryengine_spark.sources.pdffonts import AGL, glyph_to_text

    # generated letter/digit/accent entries cross-check unicodedata
    assert AGL["a"] == 0x61 and AGL["Z"] == 0x5A and AGL["seven"] == 0x37
    for name, cp in (
        ("agrave", 0xE0), ("eacute", 0xE9), ("ntilde", 0xF1),
        ("Adieresis", 0xC4), ("ccedilla", 0xE7), ("oslash", 0xF8),
        ("germandbls", 0xDF), ("Euro", 0x20AC), ("bullet", 0x2022),
        ("quoteright", 0x2019),
    ):
        assert AGL[name] == cp, name
        unicodedata.name(chr(cp))  # assigned
    # algorithmic forms
    assert glyph_to_text("uni00E9") == "é"
    assert glyph_to_text("u1F600") == "\U0001F600"
    # refusals: unknown name, lone surrogate, out of range
    assert glyph_to_text("notaglyphname") is None
    assert glyph_to_text("uniD800") is None
    assert glyph_to_text("u110000") is None


def test_base_encodings_and_differences():
    from queryengine_spark.sources.pdffonts import (
        apply_differences,
        base_encoding_table,
    )

    win = base_encoding_table("WinAnsiEncoding")
    assert win[0x41] == "A" and win[0xE9] == "é"
    assert win[0x80] == "€" and win[0x81] is None  # cp1252 hole
    mac = base_encoding_table("MacRomanEncoding")
    assert mac[0x41] == "A" and mac[0x8E] == "é"
    # out-of-contract names refuse (never guess Adobe's table)
    assert base_encoding_table("StandardEncoding") is None
    assert base_encoding_table("PDFDocEncoding") is None

    tab = [None] * 256
    diffs = [65, ("name", "eacute"), ("name", "uni0042"),
             200, ("name", "Euro")]
    assert apply_differences(tab, diffs) is tab
    assert tab[65] == "é" and tab[66] == "B" and tab[200] == "€"
    # malformed arrays refuse
    assert apply_differences([None] * 256, [("name", "a")] ) is None
    assert apply_differences([None] * 256, [300, ("name", "a")]) is None
    assert apply_differences([None] * 256, [65, 1.5]) is None


def test_tounicode_cmap_parse():
    from queryengine_spark.sources.pdffonts import parse_tounicode

    cm = (
        b"begincmap\n"
        b"2 beginbfchar\n<41> <0100>\n<42> <00660069>\nendbfchar\n"
        b"2 beginbfrange\n<50> <52> <0200>\n"
        b"<60> <61> [<0300> <0301>]\nendbfrange\nendcmap\n"
    )
    got = parse_tounicode(cm)
    assert got[0x41] == "Ā"
    assert got[0x42] == "fi"  # multi-unit (ligature) destination
    assert got[0x50] == "Ȁ" and got[0x52] == "Ȃ"
    assert got[0x60] == "̀" and got[0x61] == "́"
    # refusals: multi-byte source code (CID territory), odd hex,
    # array length mismatch, junk inside a range section, no section
    assert parse_tounicode(
        b"1 beginbfchar\n<0041> <0100>\nendbfchar\n") is None
    assert parse_tounicode(
        b"1 beginbfchar\n<4> <0100>\nendbfchar\n") is None
    assert parse_tounicode(
        b"1 beginbfrange\n<50> <52> [<0200>]\nendbfrange\n") is None
    assert parse_tounicode(
        b"1 beginbfrange\n<50> <52> <0200> junk\nendbfrange\n") is None
    assert parse_tounicode(b"nothing here") is None


@pytest.mark.parametrize("d", [10, 34, 58, 70])
def test_encoded_flavor_differences_roundtrip(d):
    from queryengine_spark.sources.pdf import make_pdf_encoded

    doc = parse_pdf_text(make_pdf_encoded(d, tounicode=False))
    assert doc is not None
    for p, ops in enumerate(doc):
        exp = "".join(
            "".join(
                chr(0xE0 + ord(ch) - 97)
                for ch in pdf_line_text(d, p, ln)
            )
            for ln in range(pdf_n_lines(d, p))
        )
        assert b"".join(ops).decode("utf-8") == exp


@pytest.mark.parametrize("d", [22, 46, 94])
def test_encoded_flavor_tounicode_precedence(d):
    """The /ToUnicode CMap deliberately disagrees with the
    /Differences decode — extraction must prefer it."""
    from queryengine_spark.sources.pdf import make_pdf_encoded

    doc = parse_pdf_text(make_pdf_encoded(d, tounicode=True))
    assert doc is not None
    for p, ops in enumerate(doc):
        exp = "".join(
            "".join(
                chr(0x100 + ord(ch) - 97)
                for ch in pdf_line_text(d, p, ln)
            )
            for ln in range(pdf_n_lines(d, p))
        )
        assert b"".join(ops).decode("utf-8") == exp


def test_font_refusals():
    from queryengine_spark.sources.pdf import make_pdf_encoded

    good = make_pdf_encoded(10, tounicode=False)
    # composite (Type0/CID) fonts are out of contract
    assert parse_pdf_text(
        good.replace(b"/Subtype /Type1", b"/Subtype /Type0")
    ) is None
    # an explicit /StandardEncoding base refuses (no guessed table)
    assert parse_pdf_text(
        good.replace(b"/WinAnsiEncoding ", b"/StandardEncoding ")
    ) is None
    # a shown code whose Differences glyph name is unknown refuses
    assert parse_pdf_text(
        good.replace(b"/agrave", b"/zzzzzz")
    ) is None
    # Tf naming a font absent from the resources refuses
    assert parse_pdf_text(
        good.replace(b"/F1 12 Tf", b"/F9 12 Tf")
    ) is None


def test_encoded_flavor_never_crashes_on_damage():
    from queryengine_spark.sources.pdf import make_pdf_encoded

    import random

    for d, tou in ((10, False), (22, True)):
        b = make_pdf_encoded(d, tounicode=tou)
        step = max(1, len(b) // 40)
        for cut in range(0, len(b), step):
            parse_pdf_text(b[:cut])  # must not raise
        rng = random.Random(d)
        for _ in range(120):
            i = rng.randrange(len(b))
            fb = bytearray(b)
            fb[i] ^= 1 << rng.randrange(8)
            parse_pdf_text(bytes(fb))  # must not raise
