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

#: r14 — precomputed GF(2^8) multiplication tables for the MixColumns
#: constants (generated from _gf_mul, the spec's own arithmetic): the
#: ISO 32000-2 Algorithm 2.B password hash runs thousands of AES
#: blocks per call, and table lookups beat the bit loop ~10×.
_MUL = {
    c: bytes(_gf_mul(x, c) for x in range(256))
    for c in (2, 3, 9, 11, 13, 14)
}


def _build_ttables() -> tuple[list[int], ...]:
    """The classic 32-bit T-tables of the FORWARD cipher — each entry
    fuses SubBytes and MixColumns for one input byte position
    (generated from the same S-box and GF tables, so the FIPS-197
    appendix vectors pin them). One AES round over a column becomes 4
    lookups + xors; Algorithm 2.B needs this to run in useful time in
    pure Python."""
    m2, m3 = _MUL[2], _MUL[3]
    t0, t1, t2, t3 = [], [], [], []
    for x in range(256):
        s = _SBOX[x]
        a, b = m2[s], m3[s]
        t0.append((a << 24) | (s << 16) | (s << 8) | b)
        t1.append((b << 24) | (a << 16) | (s << 8) | s)
        t2.append((s << 24) | (b << 16) | (a << 8) | s)
        t3.append((s << 24) | (s << 16) | (b << 8) | a)
    return t0, t1, t2, t3


_T0, _T1, _T2, _T3 = _build_ttables()


import functools


@functools.lru_cache(maxsize=64)
def _expand_key(key: bytes) -> list[bytes]:
    """AES key schedule → Nr+1 round keys of 16 bytes (FIPS-197 §5.2).
    r14: generalized to all three FIPS key sizes — Nk ∈ {4, 6, 8}
    words (128/192/256 bits), Nr = Nk + 6, with the extra SubWord step
    at ``i % Nk == 4`` for Nk > 6 — and memoized: CBC/CTR call the
    block cipher per 16 bytes with the SAME key, and Algorithm 2.B
    runs thousands of such blocks."""
    nk = len(key) // 4
    assert len(key) in (16, 24, 32)
    nr = nk + 6
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(
                _SBOX[t[(j + 1) % 4]] ^ (_RCON[i // nk - 1] if j == 0 else 0)
                for j in range(4)
            )
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(nr + 1)]


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
    m2, m3 = _MUL[2], _MUL[3]
    for c in range(4):
        a = s[4 * c : 4 * c + 4]
        s[4 * c + 0] = m2[a[0]] ^ m3[a[1]] ^ a[2] ^ a[3]
        s[4 * c + 1] = a[0] ^ m2[a[1]] ^ m3[a[2]] ^ a[3]
        s[4 * c + 2] = a[0] ^ a[1] ^ m2[a[2]] ^ m3[a[3]]
        s[4 * c + 3] = m3[a[0]] ^ a[1] ^ a[2] ^ m2[a[3]]


def _inv_mix_columns(s: bytearray) -> None:
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for c in range(4):
        a = s[4 * c : 4 * c + 4]
        s[4 * c + 0] = m14[a[0]] ^ m11[a[1]] ^ m13[a[2]] ^ m9[a[3]]
        s[4 * c + 1] = m9[a[0]] ^ m14[a[1]] ^ m11[a[2]] ^ m13[a[3]]
        s[4 * c + 2] = m13[a[0]] ^ m9[a[1]] ^ m14[a[2]] ^ m11[a[3]]
        s[4 * c + 3] = m11[a[0]] ^ m13[a[1]] ^ m9[a[2]] ^ m14[a[3]]


@functools.lru_cache(maxsize=64)
def _round_key_words(key: bytes) -> list[tuple[int, int, int, int]]:
    return [
        tuple(int.from_bytes(rk[4 * c : 4 * c + 4], "big") for c in range(4))
        for rk in _expand_key(key)
    ]


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, forward cipher (FIPS-197 §5.1) — any FIPS
    key size (r14: 128/192/256). T-table form: each round is 16
    lookups + xors over the four column words (the same math as
    SubBytes∘ShiftRows∘MixColumns, fused per byte)."""
    rkw = _round_key_words(key)
    nr = len(rkw) - 1
    sbox = _SBOX
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    rk = rkw[0]
    c0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for rnd in range(1, nr):
        rk = rkw[rnd]
        n0 = (
            t0[c0 >> 24] ^ t1[(c1 >> 16) & 0xFF]
            ^ t2[(c2 >> 8) & 0xFF] ^ t3[c3 & 0xFF] ^ rk[0]
        )
        n1 = (
            t0[c1 >> 24] ^ t1[(c2 >> 16) & 0xFF]
            ^ t2[(c3 >> 8) & 0xFF] ^ t3[c0 & 0xFF] ^ rk[1]
        )
        n2 = (
            t0[c2 >> 24] ^ t1[(c3 >> 16) & 0xFF]
            ^ t2[(c0 >> 8) & 0xFF] ^ t3[c1 & 0xFF] ^ rk[2]
        )
        n3 = (
            t0[c3 >> 24] ^ t1[(c0 >> 16) & 0xFF]
            ^ t2[(c1 >> 8) & 0xFF] ^ t3[c2 & 0xFF] ^ rk[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    rk = rkw[nr]
    o0 = (
        (sbox[c0 >> 24] << 24) | (sbox[(c1 >> 16) & 0xFF] << 16)
        | (sbox[(c2 >> 8) & 0xFF] << 8) | sbox[c3 & 0xFF]
    ) ^ rk[0]
    o1 = (
        (sbox[c1 >> 24] << 24) | (sbox[(c2 >> 16) & 0xFF] << 16)
        | (sbox[(c3 >> 8) & 0xFF] << 8) | sbox[c0 & 0xFF]
    ) ^ rk[1]
    o2 = (
        (sbox[c2 >> 24] << 24) | (sbox[(c3 >> 16) & 0xFF] << 16)
        | (sbox[(c0 >> 8) & 0xFF] << 8) | sbox[c1 & 0xFF]
    ) ^ rk[2]
    o3 = (
        (sbox[c3 >> 24] << 24) | (sbox[(c0 >> 16) & 0xFF] << 16)
        | (sbox[(c1 >> 8) & 0xFF] << 8) | sbox[c2 & 0xFF]
    ) ^ rk[3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, inverse cipher (FIPS-197 §5.3) — any FIPS
    key size (r14: 128/192/256)."""
    rks = _expand_key(key)
    nr = len(rks) - 1
    s = bytearray(block)
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, 0, -1):
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


#: the original 128-bit names stay as the PDF /AESV2 call sites
aes128_encrypt_block = aes_encrypt_block
aes128_decrypt_block = aes_decrypt_block


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Raw CBC, no padding, no IV prefix — the ISO 32000-2 key-blob
    mode (/UE, /OE and Algorithm 2.B's intermediate encryption).
    ``plain`` must be block-aligned."""
    assert len(plain) % 16 == 0
    out = bytearray()
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = aes_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt_nopad`."""
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        dec = aes_decrypt_block(key, blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    return bytes(out)


def aes_ctr_le(key: bytes, data: bytes) -> bytes:
    """AES-CTR with a LITTLE-ENDIAN 128-bit counter starting at 1 and
    no nonce — the WinZip AE-1/AE-2 keystream (encrypt == decrypt)."""
    out = bytearray()
    for i in range(0, len(data), 16):
        ks = aes_encrypt_block(
            key, (i // 16 + 1).to_bytes(16, "little")
        )
        chunk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


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
