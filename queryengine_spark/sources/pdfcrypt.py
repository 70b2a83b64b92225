"""PDF standard security handler (RC4) — from the published spec
(PDF 32000-1 §7.6.3 / PDF 1.7 reference Algorithms 2-5), pure
stdlib (hashlib MD5 + a from-scratch RC4).

Scope: the overwhelmingly common crawled shape — documents encrypted
with an OWNER password only (print/copy restrictions) and an EMPTY
user password, /Filter /Standard with R=2 (V1, 40-bit) or R=3 (V2,
/Length up to 128). A document whose user-password check fails (a
REAL user password) refuses honestly — this module never guesses or
brute-forces. AES (/V 4+ /AESV2) and crypt filters refuse in the
caller.

Validation: the RC4 primitive is pinned against published test
vectors (test_sources_pdf.py), MD5 is stdlib, and the handler
algorithms are synthesis↔parse round-tripped with tamper probes
(any byte flip in /O, /U, /P or /ID must flip the U-verification
and refuse). No independent PDF-crypto oracle exists in this
offline sandbox; that boundary is documented rather than papered
over.

Reference scope note: the reference engine (rickbeeloo/QueryEngine,
src/heurFuzz.py) reads plain text; encrypted-document ingestion is
part of the LLM-data-pipeline surface this repo adds.
"""

from __future__ import annotations

import hashlib

#: the spec's 32-byte password padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA). Used ONLY for the PDF
    standard security handler — RC4 is cryptographically broken and
    exists here to READ legacy documents, never to protect data."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_key(
    user_pw: bytes, o: bytes, p: int, id0: bytes, r: int, nbytes: int
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (as 4-byte little-endian, sign bits kept), and
    the first /ID element. R>=3 re-hashes 50 times over the key
    prefix."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def compute_o(
    owner_pw: bytes, user_pw: bytes, r: int, nbytes: int
) -> bytes:
    """Algorithm 3: the /O value. An absent owner password falls back
    to the user password per spec."""
    h = hashlib.md5(_pad_pw(owner_pw if owner_pw else user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rkey = h[:nbytes]
    o = rc4(rkey, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rkey), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3): the /U value. R3 pads
    the 16 significant bytes to 32 with zeros (only the first 16
    compare)."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)


def verify_empty_user_password(
    o: bytes, u: bytes, p: int, id0: bytes, r: int, nbytes: int
) -> bytes | None:
    """Algorithm 6 with the EMPTY user password: derive the key and
    check it reproduces /U (all 32 bytes for R2, first 16 for R3).
    Returns the file key, or None — a real user password protects
    the document and the caller must refuse."""
    key = compute_key(b"", o, p, id0, r, nbytes)
    want = compute_u(key, id0, r)
    ok = want[:32] == u[:32] if r == 2 else want[:16] == u[:16]
    return key if ok else None


def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object RC4 key — MD5 of the file key
    plus the low 3 bytes of the object number and low 2 of the
    generation, truncated to min(len(key)+5, 16)."""
    h = hashlib.md5(
        key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def decrypt_object_bytes(
    key: bytes, num: int, gen: int, data: bytes
) -> bytes:
    """RC4-decrypt one object's string/stream bytes (RC4 is its own
    inverse)."""
    return rc4(object_key(key, num, gen), data)
