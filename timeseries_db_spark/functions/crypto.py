"""From-spec stream/block ciphers backing the PDF standard security
handler (``operators/pdf.py``): RC4 (the classic PDF /V 1-2 cipher,
Schneier's published description) and AES-128 in CBC mode (FIPS-197 +
the /AESV2 crypt filter of ISO 32000-1 §7.6.2). Pure Python over
``bytes`` — these run inside the same Arrow-batched payload kernels as
the media codecs, per-record on the executors, so there is nothing to
vectorize across rows; correctness is pinned by the published FIPS-197
appendix vectors and RC4 test vectors in ``tests/test_semistructured``.

No cryptographic *protection* is claimed — this is a data-engineering
decoder for the encrypted PDFs a crawl corpus contains (RC4 and
AES-128 here are 20+-year-old standards; opening them with a known or
empty password is ordinary text extraction, the same thing pdfminer or
poppler does).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt): KSA + PRGA exactly as
    published. Key length 1-256 bytes."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), CBC mode
# ---------------------------------------------------------------------------

#: the FIPS-197 §5.1.1 S-box, generated (not transcribed): multiplicative
#: inverse in GF(2^8) followed by the affine transform — the spec's own
#: construction doubles as its verification (S[0x53] == 0xED etc.)


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply modulo the AES polynomial x^8+x^4+x^3+x+1."""
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox[x] = s
    invbox = bytearray(256)
    for x in range(256):
        invbox[sbox[x]] = x
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    """AES-128 key schedule → 11 round keys of 16 bytes (FIPS-197 §5.2)."""
    assert len(key) == 16
    w = [key[4 * i : 4 * i + 4] for i in range(4)]
    for i in range(4, 44):
        t = w[i - 1]
        if i % 4 == 0:
            t = bytes(
                _SBOX[t[(j + 1) % 4]] ^ (_RCON[i // 4 - 1] if j == 0 else 0)
                for j in range(4)
            )
        w.append(bytes(a ^ b for a, b in zip(w[i - 4], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(11)]


def _add_round_key(s: bytearray, rk: bytes) -> None:
    for i in range(16):
        s[i] ^= rk[i]


# state is column-major per FIPS-197: s[r + 4c]


def _shift_rows(s: bytearray) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        for c in range(4):
            s[r + 4 * c] = row[(c + r) % 4]


def _inv_shift_rows(s: bytearray) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        for c in range(4):
            s[r + 4 * c] = row[(c - r) % 4]


def _mix_columns(s: bytearray) -> None:
    for c in range(4):
        a = s[4 * c : 4 * c + 4]
        s[4 * c + 0] = _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3]
        s[4 * c + 1] = a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3]
        s[4 * c + 2] = a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3)
        s[4 * c + 3] = _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2)


def _inv_mix_columns(s: bytearray) -> None:
    for c in range(4):
        a = s[4 * c : 4 * c + 4]
        s[4 * c + 0] = (
            _gf_mul(a[0], 14) ^ _gf_mul(a[1], 11)
            ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9)
        )
        s[4 * c + 1] = (
            _gf_mul(a[0], 9) ^ _gf_mul(a[1], 14)
            ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13)
        )
        s[4 * c + 2] = (
            _gf_mul(a[0], 13) ^ _gf_mul(a[1], 9)
            ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11)
        )
        s[4 * c + 3] = (
            _gf_mul(a[0], 11) ^ _gf_mul(a[1], 13)
            ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14)
        )


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, forward cipher (FIPS-197 §5.1)."""
    rks = _expand_key(key)
    s = bytearray(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, 10):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s)
        _mix_columns(s)
        _add_round_key(s, rks[rnd])
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s)
    _add_round_key(s, rks[10])
    return bytes(s)


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, inverse cipher (FIPS-197 §5.3)."""
    rks = _expand_key(key)
    s = bytearray(block)
    _add_round_key(s, rks[10])
    for rnd in range(9, 0, -1):
        _inv_shift_rows(s)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_round_key(s, rks[rnd])
        _inv_mix_columns(s)
    _inv_shift_rows(s)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes128_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """AES-128-CBC with PKCS#7 padding, IV prepended to the output —
    the exact /AESV2 stream layout of ISO 32000-1 §7.6.2 (the writer
    half; a fixed deterministic IV is the caller's choice)."""
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = aes128_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes128_cbc_encrypt`: first 16 bytes are the
    IV, PKCS#7 padding stripped. Raises ValueError on malformed
    length/padding (the caller quarantines, crawl-chain style)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AESV2 stream length invalid")
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i : i + 16]
        dec = aes128_decrypt_block(key, blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AESV2 padding invalid")
    return bytes(out[:-pad])
