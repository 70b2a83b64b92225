"""PDF standard security handler (RC4 + AES-128) — from the
published spec (PDF 32000-1 §7.6 / PDF 1.7 reference Algorithms
1-6), pure stdlib (hashlib MD5) plus from-scratch RC4 and FIPS-197
AES-128.

Scope: the overwhelmingly common crawled shape — documents encrypted
with an OWNER password only (print/copy restrictions) and an EMPTY
user password: /Filter /Standard with R=2 (V1, RC4-40), R=3 (V2,
RC4, /Length up to 128), and R=4 (V4 crypt filters: /CFM /AESV2 =
AES-128-CBC with IV-prefixed PKCS#7 payloads and the 'sAlT'
per-object keying, or /CFM /V2 = RC4). A document whose
user-password check fails (a REAL user password) refuses honestly —
this module never guesses or brute-forces. AES-256 (/AESV3, R5/R6)
and per-object crypt filters refuse in the caller.

Validation: the RC4 primitive is pinned against published test
vectors and AES-128 against the FIPS-197 Appendix C.1 vector
(test_sources_pdf.py — the S-box is GENERATED from the GF(2^8)
inverse + affine transform, so one vector certifies the whole
cipher); MD5 is stdlib; the handler algorithms are synthesis↔parse
round-tripped with tamper probes (any byte flip in /O, /U, /P or
/ID must flip the U-verification and refuse). No independent
PDF-crypto oracle exists in this offline sandbox; that boundary is
documented rather than papered over.

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
    user_pw: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    nbytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (as 4-byte little-endian, sign bits kept), and
    the first /ID element. R>=4 with /EncryptMetadata false appends
    0xFFFFFFFF (step f); R>=3 re-hashes 50 times over the key
    prefix."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
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
    """Algorithm 4 (R2) / Algorithm 5 (R3/R4): the /U value. R>=3
    pads the 16 significant bytes to 32 with zeros (only the first
    16 compare)."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)


def verify_empty_user_password(
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    nbytes: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6 with the EMPTY user password: derive the key and
    check it reproduces /U (all 32 bytes for R2, first 16 for
    R3/R4). Returns the file key, or None — a real user password
    protects the document and the caller must refuse."""
    key = compute_key(b"", o, p, id0, r, nbytes, encrypt_metadata)
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


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), from scratch — for /V 4 /CFM /AESV2 documents.
# The S-box is GENERATED (GF(2^8) inverse + affine transform), not a
# pasted table; the cipher is pinned against the FIPS-197 Appendix C.1
# vector in tests.
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _make_sbox() -> tuple[list[int], list[int]]:
    exp = [0] * 255
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # multiply by the generator 0x03
    sbox = [0] * 256
    inv_sbox = [0] * 256
    for c in range(256):
        g = 0 if c == 0 else exp[(255 - log[c]) % 255]
        s = g
        for _ in range(4):
            g = ((g << 1) | (g >> 7)) & 0xFF
            s ^= g
        s ^= 0x63
        sbox[c] = s
        inv_sbox[s] = c
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _make_sbox()


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p & 0xFF


#: generated GF(2^8) multiplication tables for the MixColumns
#: constants — the per-byte hot path of CBC decryption stays table
#: lookups instead of bit loops
_M2 = [_gmul(x, 2) for x in range(256)]
_M3 = [_gmul(x, 3) for x in range(256)]
_M9 = [_gmul(x, 9) for x in range(256)]
_M11 = [_gmul(x, 11) for x in range(256)]
_M13 = [_gmul(x, 13) for x in range(256)]
_M14 = [_gmul(x, 14) for x in range(256)]


def _expand_key_128(key: bytes) -> list[bytes]:
    """AES-128 key schedule → 11 round keys of 16 bytes."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[x] for x in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [
        bytes(sum((w[4 * r + c] for c in range(4)), []))
        for r in range(11)
    ]


def _add_rk(s: list[int], rk: bytes) -> None:
    for i in range(16):
        s[i] ^= rk[i]


def aes128_encrypt_block(key_sched: list[bytes], block: bytes) -> bytes:
    s = list(block)
    _add_rk(s, key_sched[0])
    for rnd in range(1, 10):
        s = [_SBOX[x] for x in s]
        s = [s[4 * ((i // 4 + i % 4) % 4) + i % 4] for i in range(16)]
        ns = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            ns[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            ns[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            ns[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        s = ns
        _add_rk(s, key_sched[rnd])
    s = [_SBOX[x] for x in s]
    s = [s[4 * ((i // 4 + i % 4) % 4) + i % 4] for i in range(16)]
    _add_rk(s, key_sched[10])
    return bytes(s)


def aes128_decrypt_block(key_sched: list[bytes], block: bytes) -> bytes:
    s = list(block)
    _add_rk(s, key_sched[10])
    for rnd in range(9, 0, -1):
        s = [s[4 * ((i // 4 - i % 4) % 4) + i % 4] for i in range(16)]
        s = [_INV_SBOX[x] for x in s]
        _add_rk(s, key_sched[rnd])
        ns = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            ns[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            ns[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            ns[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = ns
    s = [s[4 * ((i // 4 - i % 4) % 4) + i % 4] for i in range(16)]
    s = [_INV_SBOX[x] for x in s]
    _add_rk(s, key_sched[0])
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """PDF AESV2 payload: the first 16 bytes are the IV, then CBC
    ciphertext with PKCS#7 padding. Returns the plaintext or None on
    structural violation (bad length / bad padding) — never a
    guess."""
    if len(key) != 16 or len(data) < 32 or len(data) % 16:
        return None
    ks = _expand_key_128(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        pt = aes128_decrypt_block(ks, blk)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        return None
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Synthesis-side CBC encrypt (IV prepended, PKCS#7 padded)."""
    ks = _expand_key_128(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes128_encrypt_block(ks, blk)
        out += prev
    return bytes(out)


#: the AESV2 per-object key salt (Algorithm 1 step b extension)
AES_SALT = b"sAlT"


def object_key_aes(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 for /CFM /AESV2: like the RC4 object key but with
    the 4-byte salt 'sAlT' appended to the MD5 input."""
    h = hashlib.md5(
        key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + AES_SALT
    ).digest()
    return h[: min(len(key) + 5, 16)]


def decrypt_object_bytes_aes(
    key: bytes, num: int, gen: int, data: bytes
) -> bytes | None:
    return aes128_cbc_decrypt(object_key_aes(key, num, gen), data)
