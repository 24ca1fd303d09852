"""PDF text extraction (r12): the other document container a real
training corpus is full of. Parsed from the ISO 32000 spec with
stdlib only — no library — for the subset that covers the vast
majority of machine-generated PDFs' text layer:

* **object directory** (r13): the XREF WALK — classic tables and
  PDF-1.5 xref streams (``/Type /XRef``, ``/W`` binary rows),
  ``/Prev`` incremental-update chains, and ``/Type /ObjStm`` object
  streams expanded into their member objects — with a direct ``N G
  obj … endobj`` scan as the fallback for the damaged xrefs
  real-world files are full of (extractors scan as a matter of
  course).
* **streams**: ``<< dict >> stream … endstream``, sliced by
  ``/Length`` when it is a direct integer or (r13) resolvable
  indirect reference (``N G R`` — often an integer living in an
  object stream), else by the ``endstream`` delimiter;
  ``/FlateDecode`` inflated with ``zlib`` (the overwhelmingly
  dominant content filter), ``/LZWDecode`` (r13) decoded by the
  repo's TIFF-variant LZW — ISO 32000 §7.4.4 is the same MSB-first
  early-change algorithm.
* **content text operators**: a tokenizer over the decompressed
  content stream evaluates ``BT … ET`` text objects — ``Tj`` (show
  string), ``'`` and ``"`` (next-line show), and ``TJ`` (array show
  with kerning numbers, which are dropped); ``TD``/``Td``/``T*``
  break lines, other operators are skipped with their operands.
* **string syntax**: ``(…)`` literal strings with balanced nested
  parens, ``\\n \\r \\t \\b \\f \\( \\) \\\\`` escapes, 1-3 digit
  octal escapes, and line-continuation backslash; ``<hex>`` strings
  (whitespace-tolerant, odd final digit padded with 0). Bytes decode
  as PDFDocEncoding≈latin-1 for the ASCII range this subset targets.

* **encryption** (r13): the Standard security handler, from ISO
  32000-1 §7.6 with from-spec ciphers (``functions/crypto.py``) —
  /V 1 (RC4-40), /V 2 (RC4-128), /V 4 crypt filters /V2 (RC4) and
  /AESV2 (AES-128-CBC, FIPS-197) — authenticating the EMPTY user
  password (Algorithm 6), i.e. the owner-locked world-readable files
  crawls contain; per-object keys per Algorithm 1, streams decrypted
  before filter decode.
* **images** (r13): ``/Subtype /Image`` XObjects via
  :func:`pdf_images` — ``/DCTDecode`` decodes through the repo's full
  JPEG decoder (the one-time content-filter seam is just a JPEG
  payload on the image path), ``/FlateDecode``/raw are inflated
  samples; ``px_sum`` is the closed-form signal, video-leg style.

* **CID/Type0 fonts** (r13 late): the ``Tf`` operator tracks the
  active font through page /Resources, and fonts carrying a
  ``/ToUnicode`` CMap (ISO 32000-1 §9.10.3 — bfchar + both bfrange
  forms, codespace-derived code width) decode their multi-byte show
  strings to unicode — the way machine-generated CID PDFs are
  actually extracted. The writer's ``cid_font=True`` emits
  Identity-H Type0 text whose codes are offset from the characters,
  so only a real CMap decode reproduces the text.

Out of scope, raising ``ValueError`` with the capability name exactly
like the media codecs' seams: AES-256 (/V 5, rev 5/6) and
non-Standard security handlers, password-protected files (non-empty
user password), CCITT/JBIG2/JPX image filters, LZW with
``EarlyChange 0``. CID fonts WITHOUT a ToUnicode CMap (glyph-id-only
text) remain the pdfminer/poppler seam — there is nothing to map
them back with short of font-file cmap tables.

The writer half (:func:`pdf_build`) emits a minimal valid PDF
(catalog → pages → page → Flate or raw content stream + one Type1
font) and is the roundtrip pin for the extractor, the same
own-encoder-as-oracle pattern as the FLAC/ADPCM/GIF codecs.

At 100 TB this runs exactly like the other payload kernels: an
Arrow-batched ``mapInPandas`` over a projected binary column,
map-only, per-asset parallel, nothing leaving the executors.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_PREV_RE = re.compile(rb"/Prev\s+(\d+)\b")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)\b")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_INDEX_RE = re.compile(rb"/Index\s*\[([\d\s]+)\]")
_N_RE = re.compile(rb"/N\s+(\d+)\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _pdf_objects(payload: bytes) -> list[tuple[int, bytes]]:
    """Every ``(objnum, body)`` from a direct ``obj … endobj`` scan —
    the resilient path real extractors keep for files whose xref is
    damaged (common enough in the wild that scanning is standard)."""
    out = []
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("PDF object unterminated")
        out.append((int(m.group(1)), payload[m.end() : end]))
    return out


def _obj_at(payload: bytes, off: int) -> tuple[int, bytes] | None:
    """The ``(objnum, body)`` whose ``N G obj`` header sits at byte
    ``off`` (leading whitespace tolerated), or None when the offset is
    stale — the caller falls back to scanning."""
    while off < len(payload) and payload[off] in _WS:
        off += 1
    m = _OBJ_RE.match(payload, off)
    if not m:
        return None
    end = payload.find(b"endobj", m.end())
    if end < 0:
        return None
    return int(m.group(1)), payload[m.end() : end]


def _stream_raw(body: bytes, resolve=None, decrypt=None) -> bytes | None:
    """The RAW (sliced + decrypted, filters NOT decoded) stream bytes
    of one object body — None when it has no stream: sliced by a
    direct /Length integer when present, by the resolved referenced
    integer when /Length is indirect (``N G R``) and a resolver is
    given (r13 — real-world PDFs routinely store content-stream
    lengths as separate objects, often inside an object stream), else
    by the endstream delimiter. The image path (:func:`pdf_images`)
    consumes this directly so /DCTDecode data reaches the repo's JPEG
    decoder instead of the content-filter seam."""
    at = body.find(b"stream")
    if at < 0:
        return None
    dict_part = body[:at]
    i = at + len(b"stream")
    # EOL after the `stream` keyword: CRLF or LF per spec
    if body[i : i + 2] == b"\r\n":
        i += 2
    elif body[i : i + 1] == b"\n":
        i += 1
    m = _LENGTH_RE.search(dict_part)
    clen = None
    if m:
        clen = int(m.group(1))
    elif resolve is not None:
        mr = _LENGTH_REF_RE.search(dict_part)
        if mr:
            ref_body = resolve(int(mr.group(1)))
            if ref_body is not None:
                mi = re.match(rb"\s*(\d+)\s*$", ref_body)
                if mi:
                    clen = int(mi.group(1))
    if clen is not None:
        data = body[i : i + clen]
    else:  # unresolvable /Length: fall back to the delimiter
        end = body.find(b"endstream", i)
        if end < 0:
            raise ValueError("PDF stream unterminated")
        data = body[i:end].rstrip(b"\r\n")
    if decrypt is not None:
        # decryption is the OUTERMOST layer (ISO 32000-1 §7.6.2):
        # decrypt the raw stream bytes first, THEN decode filters
        data = decrypt(data)
    return data


def _apply_filters(dict_part: bytes, data: bytes) -> bytes:
    """Decode the content filters: /FlateDecode inflated with zlib,
    /LZWDecode via the repo's TIFF-variant LZW — ISO 32000 §7.4.4 is
    the same MSB-first early-change algorithm (EarlyChange=1 default;
    0 stays a seam). Other filters raise the capability seam."""
    if b"/Filter" in dict_part:
        if b"/FlateDecode" in dict_part:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"PDF FlateDecode failed: {e}") from e
        elif b"/LZWDecode" in dict_part:
            if re.search(rb"/EarlyChange\s+0\b", dict_part):
                raise ValueError(
                    "PDF LZW EarlyChange=0 outside PDF_CAPABILITIES "
                    "(pdfminer seam)"
                )
            from timeseries_db_spark.operators.multimodal import (
                _tiff_lzw_decode,
            )

            data = bytes(_tiff_lzw_decode(data, None))
        else:
            raise ValueError(
                "PDF filter outside PDF_CAPABILITIES (FlateDecode/"
                "LZWDecode only; DCT/etc = pdfminer seam)"
            )
    return data


def _stream_of(body: bytes, resolve=None, decrypt=None) -> bytes | None:
    """The fully DECODED stream of one object body (None when it has
    no stream): raw slice + decrypt (:func:`_stream_raw`) then filter
    decode (:func:`_apply_filters`)."""
    data = _stream_raw(body, resolve, decrypt)
    if data is None:
        return None
    at = body.find(b"stream")
    return _apply_filters(body[:at], data)


def _pdf_xref(payload: bytes) -> dict[int, tuple]:
    """The cross-reference directory (r13, VERDICT item 5): follows
    ``startxref`` to a CLASSIC table (``xref`` keyword, 20-byte
    entries, ``trailer`` dict) or a PDF-1.5 XREF STREAM (``/Type
    /XRef``, ``/W`` field widths, ``/Index`` subsections, binary rows,
    usually Flate), chaining ``/Prev`` sections newest-first (the
    first definition of an object number wins — incremental-update
    semantics). Returns ``{objnum: ('at', offset)}`` for regular
    objects and ``{objnum: ('in', objstm_num, idx)}`` for type-2
    entries living inside an object stream. Raises ``ValueError`` on
    structural damage — callers fall back to the direct scan."""
    m = None
    for m in _STARTXREF_RE.finditer(payload):
        pass
    if m is None:
        raise ValueError("PDF has no startxref")
    off = int(m.group(1))
    entries: dict[int, tuple] = {}
    seen_offsets: set[int] = set()
    while off is not None and off not in seen_offsets:
        seen_offsets.add(off)
        j = off
        while j < len(payload) and payload[j] in _WS:
            j += 1
        if payload[j : j + 4] == b"xref":  # classic table
            j += 4
            while True:
                while j < len(payload) and payload[j] in _WS:
                    j += 1
                ms = re.match(rb"(\d+)\s+(\d+)", payload[j:])
                if not ms:
                    break
                start, count = int(ms.group(1)), int(ms.group(2))
                j += ms.end()
                while j < len(payload) and payload[j] in b"\r\n ":
                    j += 1
                for k in range(count):
                    row = payload[j : j + 20]
                    if len(row) < 18:
                        raise ValueError("PDF xref table truncated")
                    kind = row[17:18]
                    if kind == b"n":
                        entries.setdefault(
                            start + k, ("at", int(row[0:10]))
                        )
                    elif kind != b"f":
                        raise ValueError("PDF xref entry type unknown")
                    j += 20
            at_trailer = payload.find(b"trailer", j)
            if at_trailer < 0:
                raise ValueError("PDF xref table has no trailer")
            tail = payload[at_trailer : at_trailer + 512]
            mp = _PREV_RE.search(tail)
            off = int(mp.group(1)) if mp else None
        else:  # xref STREAM object
            got = _obj_at(payload, off)
            if got is None:
                raise ValueError("PDF startxref points at no object")
            _num, body = got
            at = body.find(b"stream")
            dict_part = body[: at if at >= 0 else len(body)]
            if b"/XRef" not in dict_part:
                raise ValueError("PDF startxref object is not /Type /XRef")
            mw = _W_RE.search(dict_part)
            msz = _SIZE_RE.search(dict_part)
            if not mw or not msz:
                raise ValueError("PDF xref stream missing /W or /Size")
            w = tuple(int(mw.group(g)) for g in (1, 2, 3))
            mi = _INDEX_RE.search(dict_part)
            if mi:
                nums = [int(x) for x in mi.group(1).split()]
                index = list(zip(nums[0::2], nums[1::2]))
            else:
                index = [(0, int(msz.group(1)))]
            data = _stream_of(body)
            if data is None:
                raise ValueError("PDF xref stream has no stream data")
            rw = sum(w)
            pos = 0
            for start, count in index:
                for k in range(count):
                    row = data[pos : pos + rw]
                    if len(row) < rw:
                        raise ValueError("PDF xref stream rows truncated")
                    pos += rw
                    fields = []
                    p2 = 0
                    for width in w:
                        fields.append(
                            int.from_bytes(row[p2 : p2 + width], "big")
                            if width
                            else None
                        )
                        p2 += width
                    typ = fields[0] if w[0] else 1
                    if typ == 1:
                        entries.setdefault(start + k, ("at", fields[1]))
                    elif typ == 2:
                        entries.setdefault(
                            start + k, ("in", fields[1], fields[2])
                        )
                    # type 0 = free list: skipped
            mp = _PREV_RE.search(dict_part)
            off = int(mp.group(1)) if mp else None
    return entries


def _objstm_members(
    body: bytes, resolve=None, decrypt=None
) -> list[tuple[int, bytes]]:
    """The ``(objnum, body)`` members of one ``/Type /ObjStm`` object
    stream (r13): the decoded stream opens with N (objnum, offset)
    integer pairs, member bodies start at ``/First + offset``. Members
    are dict/number/array objects by spec (streams cannot nest), so
    they feed reference resolution and the text scan's object
    directory, never the stream decoder."""
    at = body.find(b"stream")
    dict_part = body[: at if at >= 0 else len(body)]
    mn, mf = _N_RE.search(dict_part), _FIRST_RE.search(dict_part)
    if not mn or not mf:
        raise ValueError("PDF ObjStm missing /N or /First")
    n, first = int(mn.group(1)), int(mf.group(1))
    data = _stream_of(body, resolve, decrypt)
    if data is None:
        raise ValueError("PDF ObjStm has no stream")
    nums = data[:first].split()
    if len(nums) < 2 * n:
        raise ValueError("PDF ObjStm header pairs truncated")
    pairs = [
        (int(nums[2 * i]), int(nums[2 * i + 1])) for i in range(n)
    ]
    out = []
    for i, (objnum, o) in enumerate(pairs):
        end = first + pairs[i + 1][1] if i + 1 < n else len(data)
        out.append((objnum, data[first + o : end]))
    return out


# ---------------------------------------------------------------------------
# Standard security handler (ISO 32000-1 §7.6.3) — r13
# ---------------------------------------------------------------------------

#: the 32-byte password pad of Algorithm 2 (ISO 32000-1 Table 7.6.3.3)
_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

#: /Encrypt as an indirect reference OR a direct dictionary (r14
#: ADVICE — ISO 32000-1 allows both; a direct dict previously read as
#: "unencrypted" and streams silently yielded ciphertext)
_ENCRYPT_RE = re.compile(rb"/Encrypt\s*(?:(\d+)\s+\d+\s+R\b|(<<))")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>")


def _balanced_dict(b: bytes, at: int) -> bytes:
    """The ``<< … >>`` dictionary starting at ``at`` (index of the
    opening ``<<``), nesting-aware."""
    depth = 0
    i = at
    n = len(b)
    while i < n - 1:
        two = b[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return b[at:i]
        else:
            i += 1
    raise ValueError("PDF dictionary unbalanced")


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + _PDF_PAD)[:32]


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (r14 — the AES-256 / R6 password
    hash): SHA-256 of (pwd ∥ salt ∥ udata), then the iterated
    AES-128-CBC + SHA-256/384/512 schedule — at least 64 rounds,
    stopping when the last byte of the encryption output is ≤
    rounds − 32. The 64-fold repetition keeps K1 block-aligned for
    any password length."""
    import hashlib

    from timeseries_db_spark.functions.crypto import aes_cbc_encrypt_nopad

    k = hashlib.sha256(pwd + salt + udata).digest()
    rounds = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            return k[:32]


def _hash_r5(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """The deprecated Adobe rev-5 variant: a single SHA-256."""
    import hashlib

    return hashlib.sha256(pwd + salt + udata).digest()


def _std_key(
    pwd: bytes, o: bytes, p: int, id0: bytes, r: int, klen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (user) password,
    /O, /P (as 4 LE bytes of its 32-bit two's complement), the first
    /ID element, and — rev ≥ 4 with /EncryptMetadata false — 4 0xFF
    bytes; rev ≥ 3 re-digests 50× over the first ``klen`` bytes."""
    import hashlib

    h = hashlib.md5()
    h.update(_pad_pwd(pwd))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:klen]).digest()
    return key[:klen]


def _compute_o(owner_pwd: bytes, user_pwd: bytes, r: int, klen: int) -> bytes:
    """Algorithm 3: the /O entry — RC4 of the padded user password
    under a key digested from the owner password (50× for rev ≥ 3),
    then 19 more RC4 passes with the key XORed by the pass number."""
    import hashlib

    from timeseries_db_spark.functions.crypto import rc4

    h = hashlib.md5(_pad_pwd(owner_pwd or user_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4key = h[:klen]
    o = rc4(rc4key, _pad_pwd(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (rev 2) / 5 (rev ≥ 3): the /U entry. Rev ≥ 3 pads
    the 16 digest bytes with zeros — comparisons use the first 16."""
    from timeseries_db_spark.functions.crypto import rc4

    if r == 2:
        return rc4(key, _PDF_PAD)
    import hashlib

    u = rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def _obj_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key — MD5 of the file key + 3 LE
    bytes of the object number + 2 LE of the generation (+ ``sAlT``
    for /AESV2), truncated to min(klen + 5, 16)."""
    import hashlib

    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    return hashlib.md5(key + ext).digest()[: min(len(key) + 5, 16)]


def _dict_string_bytes(d: bytes, name: bytes) -> bytes | None:
    """The raw BYTES of dict entry ``name`` when it is a ``<hex>`` or
    ``(literal)`` string (the /O and /U entries — never encrypted)."""
    m = re.search(re.escape(name) + rb"\s*", d)
    if not m:
        return None
    i = m.end()
    if i < len(d) and d[i : i + 1] == b"<":
        s, _ = _hex_string(d, i)
        return s.encode("latin-1")
    if i < len(d) and d[i : i + 1] == b"(":
        s, _ = _lit_string(d, i)
        return s.encode("latin-1")
    return None


def _encryption_of(
    payload: bytes, directory: dict[int, bytes], password: bytes = b""
):
    """None for an unencrypted file, else ``(file_key, mode)`` for the
    Standard security handler variants this reader opens from spec —
    /V 1 (RC4-40), /V 2 (RC4 ≤128), /V 4 with /CFM /V2 (RC4) or
    /AESV2 (AES-128-CBC), and r14: /V 5 /R 5-6 /AESV3 (AES-256 —
    Algorithm 2.B validation against /U, file key unwrapped from /UE,
    no per-object key derivation) — authenticating the EMPTY user
    password, the case a crawl corpus actually contains: owner-locked
    but world-readable files. Raises ValueError naming the seam for
    non-Standard handlers, crypt filters beyond StdCF, and
    password-protected files."""
    m = None
    for m in _ENCRYPT_RE.finditer(payload):
        pass  # last match: the live trailer in an incremental chain
    if m is None:
        if re.search(rb"/Encrypt[\s/<\[(]", payload):
            # r14 (ADVICE): /Encrypt present but in neither legal form
            # — raise the seam instead of silently treating ciphertext
            # streams as plaintext
            raise ValueError(
                "PDF /Encrypt entry unparseable (encryption seam)"
            )
        return None
    if m.group(1):
        body = directory.get(int(m.group(1)))
        if body is None:
            raise ValueError("PDF /Encrypt dictionary unresolvable")
    else:  # direct dictionary in the trailer (r14 ADVICE)
        body = _balanced_dict(payload, m.end(2) - 2)
    if not re.search(rb"/Filter\s*/Standard\b", body):
        raise ValueError(
            "PDF non-Standard security handler outside PDF_CAPABILITIES "
            "(pdfminer seam)"
        )
    mv = re.search(rb"/V\s+(\d+)", body)
    mr = re.search(rb"/R\s+(\d+)", body)
    mp = re.search(rb"/P\s+(-?\d+)", body)
    ml = re.search(rb"/Length\s+(\d+)", body)
    v = int(mv.group(1)) if mv else 0
    r = int(mr.group(1)) if mr else 2
    if v == 5 and r in (5, 6):
        # r14: AES-256 — ISO 32000-2 rev 6 (and deprecated Adobe rev
        # 5). /U = hash(32) ∥ validation salt(8) ∥ key salt(8); the
        # empty user password validates against the hash, then /UE
        # unwraps the 256-bit file key (CBC, zero IV, no padding).
        mcfm = re.search(rb"/CFM\s*/(\w+)", body)
        if not mcfm or mcfm.group(1) != b"AESV3":
            raise ValueError(
                "PDF AES-256 (/V 5) crypt filter missing /AESV3 "
                "(pdfminer seam)"
            )
        u5 = _dict_string_bytes(body, b"/U")
        ue = _dict_string_bytes(body, b"/UE")
        if u5 is None or len(u5) < 48 or ue is None or len(ue) < 32:
            raise ValueError("PDF /V 5 dictionary missing /U or /UE")
        h = _hash_2b if r == 6 else _hash_r5
        from timeseries_db_spark.functions.crypto import (
            aes_cbc_decrypt_nopad,
        )

        # r14 late: empty user password first, then (password given)
        # the user hash, then the OWNER path — /O's hash salts with
        # the full 48-byte /U and /OE unwraps the same file key
        if h(b"", u5[32:40]) == u5[:32]:
            pwd = b""
        elif password and h(password, u5[32:40]) == u5[:32]:
            pwd = password
        else:
            o5 = _dict_string_bytes(body, b"/O")
            oe = _dict_string_bytes(body, b"/OE")
            if (
                password
                and o5 is not None and len(o5) >= 48
                and oe is not None and len(oe) >= 32
                and h(password, o5[32:40], u5[:48]) == o5[:32]
            ):
                return (
                    aes_cbc_decrypt_nopad(
                        h(password, o5[40:48], u5[:48]),
                        bytes(16),
                        oe[:32],
                    ),
                    "aes256",
                )
            raise ValueError(
                "encrypted PDF: wrong password (pdfminer seam)"
                if password
                else "encrypted PDF: non-empty user password required "
                "(pdfminer seam)"
            )
        file_key = aes_cbc_decrypt_nopad(
            h(pwd, u5[40:48]), bytes(16), ue[:32]
        )
        return file_key, "aes256"
    if v not in (1, 2, 4) or r not in (2, 3, 4):
        raise ValueError(
            f"PDF encryption V={v} R={r} outside PDF_CAPABILITIES "
            "(AES-256 needs /R 5-6; pdfminer seam)"
        )
    aes = False
    if v == 4:
        mcfm = re.search(rb"/CFM\s*/(\w+)", body)
        cfm = mcfm.group(1) if mcfm else b""
        if cfm == b"AESV2":
            aes = True
        elif cfm != b"V2":
            raise ValueError(
                "PDF crypt filter outside PDF_CAPABILITIES "
                "(V2/AESV2 only; pdfminer seam)"
            )
    o = _dict_string_bytes(body, b"/O")
    u = _dict_string_bytes(body, b"/U")
    if o is None or u is None or mp is None:
        raise ValueError("PDF /Encrypt dictionary missing /O, /U or /P")
    p = int(mp.group(1))
    klen = (int(ml.group(1)) if ml else 40) // 8
    if v == 1:
        klen = 5
    mid = None
    for mid in _ID_RE.finditer(payload):
        pass
    id0 = (
        bytes.fromhex(re.sub(rb"\s", rb"", mid.group(1)).decode())
        if mid
        else b""
    )
    enc_md = not re.search(rb"/EncryptMetadata\s+false", body)
    def u_ok(k: bytes) -> bool:
        u_chk = _compute_u(k, id0, r)
        return (u_chk[:16] if r >= 3 else u_chk) == (
            u[:16] if r >= 3 else u[:32]
        )

    key = _std_key(b"", o, p, id0, r, klen, enc_md)
    if not u_ok(key):
        # r14 late: try the given password as the USER password
        # (Algorithm 4/5 check), then as the OWNER password —
        # Algorithm 7 peels the 19 XOR'd RC4 passes off /O to recover
        # the PADDED user password, which Algorithm 2 accepts as-is
        # (already 32 bytes, the pad append truncates away)
        authed = False
        if password:
            key = _std_key(password, o, p, id0, r, klen, enc_md)
            authed = u_ok(key)
            if not authed:
                import hashlib

                from timeseries_db_spark.functions.crypto import rc4

                h = hashlib.md5(_pad_pwd(password)).digest()
                if r >= 3:
                    for _ in range(50):
                        h = hashlib.md5(h).digest()
                rkey = h[:klen]
                upad = o[:32]
                if r == 2:
                    upad = rc4(rkey, upad)
                else:
                    for i in range(19, -1, -1):
                        upad = rc4(bytes(x ^ i for x in rkey), upad)
                key = _std_key(upad, o, p, id0, r, klen, enc_md)
                authed = u_ok(key)
        if not authed:
            raise ValueError(
                "encrypted PDF: wrong password (pdfminer seam)"
                if password
                else "encrypted PDF: non-empty user password required "
                "(pdfminer seam)"
            )
    return key, ("aesv2" if aes else "rc4")


def _decrypt_for(enc, num: int):
    """The stream decryptor bound to object ``num`` (gen 0 — the only
    generation this reader's directory tracks, and what machine-
    generated files use), or None when the file is unencrypted.
    r14: mode 'aes256' uses the FILE key directly — /V 5 has no
    per-object key derivation (ISO 32000-2); the CBC+IV+padding
    stream layout is the same as /AESV2 and the generic block cipher
    dispatches on key length."""
    if enc is None:
        return None
    key, mode = enc
    if mode == "aes256":
        from timeseries_db_spark.functions.crypto import aes128_cbc_decrypt

        return lambda d: aes128_cbc_decrypt(key, d)
    if mode == "aesv2":
        from timeseries_db_spark.functions.crypto import aes128_cbc_decrypt

        return lambda d: aes128_cbc_decrypt(_obj_key(key, num, 0, True), d)
    from timeseries_db_spark.functions.crypto import rc4

    return lambda d: rc4(_obj_key(key, num, 0, False), d)


def _lit_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(…)`` literal string starting at the ``(``; returns
    (text, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in b"nrtbf":
                out += {"n": b"\n", "r": b"\r", "t": b"\t",
                        "b": b"\b", "f": b"\x0c"}[chr(e)]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= s[i] <= 0x37:
                    oct_digits.append(s[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped per spec
                out.append(e)
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("PDF literal string unterminated")


def _hex_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``<…>`` hex string starting at the ``<``."""
    end = s.find(b">", i)
    if end < 0:
        raise ValueError("PDF hex string unterminated")
    digits = bytes(c for c in s[i + 1 : end] if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("latin-1")).decode("latin-1"), end + 1


_BFCHAR_RE = re.compile(
    rb"beginbfchar(.*?)endbfchar", re.S
)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S
)


def _tounicode_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream (r13 — ISO 32000-1 §9.10.3):
    returns (code_byte_width, {code → unicode string}). bfchar pairs
    and both bfrange forms (consecutive destination, or an explicit
    destination array) are read; destinations are UTF-16BE."""
    m = _CODESPACE_RE.search(data)
    nbytes = len(m.group(1)) // 2 if m else 2

    def dst(h: bytes) -> str:
        return bytes.fromhex(h.decode()).decode("utf-16-be", "replace")

    cmap: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(data):
        hexes = _HEXPAIR_RE.findall(block)
        for k in range(0, len(hexes) - 1, 2):
            cmap[int(hexes[k], 16)] = dst(hexes[k + 1])
    for block in _BFRANGE_RE.findall(data):
        # form A: <lo> <hi> <dst>; form B: <lo> <hi> [<d> <d> ...]
        for mr in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])",
            block,
        ):
            lo, hi = int(mr.group(1), 16), int(mr.group(2), 16)
            if mr.group(3) is not None:
                base = int(mr.group(3), 16)
                width = len(mr.group(3))
                for k in range(hi - lo + 1):
                    cmap[lo + k] = dst(
                        f"{base + k:0{width}x}".encode()
                    )
            else:
                dsts = _HEXPAIR_RE.findall(mr.group(4))
                for k, d in enumerate(dsts):
                    if lo + k <= hi:
                        cmap[lo + k] = dst(d)
    return nbytes, cmap


def _apply_cmap(raw: str, font) -> str:
    """Map one show-string through the current font's ToUnicode CMap
    (``font`` = (nbytes, code→str); None = simple font, latin-1 as
    read). Unmapped codes become U+FFFD — visible, never silent."""
    if font is None:
        return raw
    nbytes, cmap = font
    bs = raw.encode("latin-1", "replace")
    out = []
    for k in range(0, len(bs) - nbytes + 1, nbytes):
        code = int.from_bytes(bs[k : k + nbytes], "big")
        out.append(cmap.get(code, "�"))
    return "".join(out)


def _content_text(stream: bytes, fonts=None) -> tuple[str, int]:
    """Evaluate the text-showing operators of one content stream:
    returns (extracted text, n_show_ops). Text runs inside one BT/ET
    are joined as-is; ``TD``/``Td``/``T*``/``ET`` insert a line
    break (collapsed later). ``fonts`` (r13) maps resource names to
    ToUnicode CMaps — the ``Tf`` operator switches the active font,
    and show strings under a CMap'd font decode as multi-byte codes
    (CID/Type0 text extraction)."""
    parts: list[str] = []
    n_shows = 0
    pending: list[str] = []  # operand stack (string operands only)
    i = 0
    n = len(stream)
    in_text = False
    last_name = ""
    cur_font = None

    def brk() -> None:
        if parts and parts[-1] != "\n":
            parts.append("\n")

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
        elif c == 0x28:  # (
            txt, i = _lit_string(stream, i)
            pending.append(txt)
        elif c == 0x3C:  # < — hex string or << dict
            if stream[i : i + 2] == b"<<":
                i += 2
            else:
                txt, i = _hex_string(stream, i)
                pending.append(txt)
        elif c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x5B or c == 0x5D or stream[i : i + 2] == b">>":  # [ ] >>
            i += 2 if stream[i : i + 2] == b">>" else 1
        elif c == 0x2F:  # /name — remembered for the Tf operator
            i += 1
            j = i
            while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
                j += 1
            last_name = stream[i:j].decode("latin-1")
            i = j
        else:  # number or operator token
            j = i
            while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
                j += 1
            tok = stream[i:j]
            i = j
            if tok == b"BT":
                in_text = True
                brk()
                pending.clear()
            elif tok == b"ET":
                in_text = False
                brk()
                pending.clear()
            elif tok == b"Tf":
                cur_font = (fonts or {}).get(last_name)
                pending.clear()
            elif in_text and tok in (b"Tj", b"'", b'"'):
                if tok != b"Tj":
                    brk()  # ' and " move to the next line first
                if pending:
                    parts.append(_apply_cmap(pending[-1], cur_font))
                    n_shows += 1
                pending.clear()
            elif in_text and tok == b"TJ":
                # array show: string operands concatenate, kerning
                # numbers (already skipped as non-string tokens) drop
                if pending:
                    parts.append(
                        "".join(_apply_cmap(p, cur_font) for p in pending)
                    )
                    n_shows += 1
                pending.clear()
            elif in_text and tok in (b"Td", b"TD", b"T*"):
                brk()
                pending.clear()
            elif tok and not (
                tok[0:1].isdigit() or tok[0:1] in (b"+", b"-", b".")
            ):
                pending.clear()  # any other OPERATOR consumes operands
    text = re.sub(r"[ \t]*\n[ \t\n]*", "\n", "".join(parts)).strip("\n")
    return text, n_shows


def _pdf_open(payload: bytes, password: bytes = b""):
    """The shared document-open path of :func:`pdf_text` and
    :func:`pdf_images` — (objs, directory, resolve, enc): xref walk
    with direct-scan fallback, Standard-security-handler setup (r13 —
    authenticate the empty user password, else raise the seam), and
    /ObjStm expansion with the members joining the directory."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    objs: list[tuple[int, bytes]] = []
    try:
        xref = _pdf_xref(payload)
        for num in sorted(xref):
            ent = xref[num]
            if ent[0] == "at":
                got = _obj_at(payload, ent[1])
                if got is None:  # stale offset: the xref lied
                    raise ValueError("PDF xref offset stale")
                objs.append((num, got[1]))
    except ValueError:
        objs = _pdf_objects(payload)
    directory = dict(objs)

    def resolve(num: int) -> bytes | None:
        return directory.get(num)

    # r13: Standard-security-handler decryption (RC4-40/128, AESV2) —
    # authenticate the empty user password and decrypt every stream
    # transparently; unsupported variants raise their seam name
    enc = _encryption_of(payload, directory, password)

    # expand object streams: members join the directory (reference
    # resolution) and the object list (no streams inside, by spec)
    for num, body in list(objs):
        at = body.find(b"stream")
        if at >= 0 and b"/ObjStm" in body[:at]:
            for mnum, mbody in _objstm_members(
                body, resolve, _decrypt_for(enc, num)
            ):
                directory.setdefault(mnum, mbody)
                objs.append((mnum, mbody))
    return objs, directory, resolve, enc


def pdf_text(payload: bytes, password: bytes = b"") -> tuple[str, int, int]:
    """REAL PDF text extraction — (text, n_show_ops, n_streams): every
    content stream's BT/ET text operators evaluated in document order,
    page texts separated by newlines. Raises with the capability name
    for encrypted files and unsupported filters.

    r13 (VERDICT item 5): the object directory comes from the XREF
    WALK when it parses — classic tables, PDF-1.5 xref streams, /Prev
    chains — with ``/Type /ObjStm`` object streams expanded so their
    members (the usual home of page dicts and length integers in
    real-world files) resolve indirect references; a damaged xref
    falls back to the direct scan, like real extractors. Indirect
    ``/Length N G R`` content-stream lengths resolve through the
    directory. ``/Type /ObjStm`` and ``/Type /XRef`` streams are
    infrastructure, not page content — they are excluded from the
    text scan (an xref stream's binary rows could contain ``BT`` by
    chance) but counted in ``n_streams`` like any other stream."""
    objs, directory, resolve, enc = _pdf_open(payload, password)
    # r13: resource-name → ToUnicode CMap (CID/Type0 text extraction)
    # — page /Font dicts name the font objects, a font's /ToUnicode
    # stream maps its multi-byte codes to unicode; fonts without one
    # decode as before (simple latin-1 shows).
    # r14 (ADVICE medium): fonts are resolved PER PAGE and bound to
    # that page's /Contents objects — real files reuse page-scoped
    # names like /F1 for DIFFERENT fonts, so one merged map would run
    # a simple-font page's show strings through another page's CID
    # CMap (garbling them to U+FFFD). The merged map survives only as
    # the fallback for streams no page dict claims (e.g. damaged page
    # trees under the direct-scan path).

    def fonts_of(fdict_bytes: bytes) -> dict[str, tuple]:
        got: dict[str, tuple] = {}
        for mm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fdict_bytes):
            fbody = directory.get(int(mm.group(2)))
            if fbody is None:
                continue
            mtu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fbody)
            if not mtu:
                continue
            tbody = directory.get(int(mtu.group(1)))
            if tbody is None:
                continue
            data = _stream_of(
                tbody, resolve, _decrypt_for(enc, int(mtu.group(1)))
            )
            if data is not None:
                got[mm.group(1).decode()] = _tounicode_cmap(data)
        return got

    def font_dict_in(body: bytes) -> bytes | None:
        md = re.search(rb"/Font\s*<<", body)
        if md:
            return _balanced_dict(body, md.end() - 2)
        mr = re.search(rb"/Font\s+(\d+)\s+\d+\s+R", body)
        if mr:
            return directory.get(int(mr.group(1)))
        return None

    page_fonts: dict[int, dict[str, tuple]] = {}  # content obj → fonts
    merged: dict[str, tuple] = {}
    for _num, body in objs:
        if b"/Page" not in body or body.find(b"stream") >= 0:
            continue
        fdict = font_dict_in(body)
        if fdict is None:
            mres = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", body)
            rbody = directory.get(int(mres.group(1))) if mres else None
            fdict = font_dict_in(rbody) if rbody is not None else None
        if fdict is None:
            continue
        fonts = fonts_of(fdict)
        merged.update(fonts)
        mc = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        refs = [int(mc.group(1))] if mc else []
        ma = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
        if ma:
            refs = [
                int(x.group(1))
                for x in re.finditer(rb"(\d+)\s+\d+\s+R", ma.group(1))
            ]
        for cnum in refs:
            page_fonts[cnum] = fonts
    texts: list[str] = []
    n_shows = 0
    n_streams = 0
    for _num, body in objs:
        at = body.find(b"stream")
        if at < 0:
            continue
        dict_part = body[:at]
        if b"/ObjStm" in dict_part or b"/XRef" in dict_part:
            n_streams += 1  # infrastructure stream, never page text
            continue
        if b"/Image" in dict_part:
            # image XObject (r13): counted, never text-scanned — its
            # bytes are pixel data (and /DCTDecode is not a content
            # filter); pdf_images owns the decode
            n_streams += 1
            continue
        data = _stream_of(body, resolve, _decrypt_for(enc, _num))
        if data is None:
            continue
        n_streams += 1
        if b"BT" not in data:  # not a text-bearing content stream
            continue
        t, k = _content_text(data, page_fonts.get(_num, merged))
        n_shows += k
        if t:
            texts.append(t)
    return "\n".join(texts), n_shows, n_streams


_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")


def pdf_images(
    payload: bytes, password: bytes = b""
) -> list[tuple[int, int, int, int]]:
    """REAL embedded-image extraction (r13) — one ``(width, height,
    channels, px_sum)`` per ``/Subtype /Image`` XObject, in document
    order: ``/DCTDecode`` data decodes through the repo's full JPEG
    decoder (``multimodal.jpeg_decode`` — the filter that was the
    documented seam for the TEXT path is simply a JPEG payload on the
    image path), ``/FlateDecode`` inflates to raw samples, unfiltered
    streams are raw samples; encrypted files decrypt per object like
    every other stream. ``px_sum`` is the integer sum of all decoded
    8-bit samples — the same closed-form-checkable signal the video
    frame legs use. Dimensions are cross-checked against the dict.
    /CCITTFaxDecode, /JBIG2Decode, /JPXDecode and BitsPerComponent ≠ 8
    raise the capability seam."""
    objs, directory, resolve, enc = _pdf_open(payload, password)
    out: list[tuple[int, int, int, int]] = []
    for num, body in objs:
        at = body.find(b"stream")
        if at < 0:
            continue
        dict_part = body[:at]
        if b"/Subtype" not in dict_part or b"/Image" not in dict_part:
            continue
        mw = _WIDTH_RE.search(dict_part)
        mh = _HEIGHT_RE.search(dict_part)
        if not mw or not mh:
            raise ValueError("PDF image missing /Width or /Height")
        w, h = int(mw.group(1)), int(mh.group(1))
        mb = _BPC_RE.search(dict_part)
        if mb and int(mb.group(1)) != 8:
            raise ValueError(
                "PDF image BitsPerComponent != 8 outside "
                "PDF_CAPABILITIES (pdfminer seam)"
            )
        data = _stream_raw(body, resolve, _decrypt_for(enc, num))
        if data is None:
            continue
        if b"/DCTDecode" in dict_part:
            from timeseries_db_spark.operators.multimodal import jpeg_decode

            jw, jh, ch, px = jpeg_decode(data)
            if (jw, jh) != (w, h):
                raise ValueError(
                    f"PDF image dict {w}x{h} != JPEG {jw}x{jh}"
                )
        elif b"/FlateDecode" in dict_part:
            px = zlib.decompress(data)
            ch = len(px) // (w * h)
        elif b"/Filter" in dict_part:
            raise ValueError(
                "PDF image filter outside PDF_CAPABILITIES "
                "(DCT/Flate/raw only; pdfminer seam)"
            )
        else:
            px = data
            ch = len(px) // (w * h)
        if ch not in (1, 3) or len(px) != w * h * ch:
            raise ValueError("PDF image sample count inconsistent")
        out.append((w, h, ch, sum(px)))
    return out


def _pdf_shows(
    lines: list[str], use_tj_array: bool, codes: dict[str, int] | None = None
) -> bytes:
    """One page's content-stream bytes (shared by both writer
    layouts). ``codes`` (r13) switches to CID mode: show operands are
    hex strings of 2-byte codes under the document's ToUnicode CMap
    instead of latin-1 literals."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    def op(s: str) -> bytes:
        if codes is None:
            return b"(" + esc(s) + b")"
        return (
            b"<" + "".join(f"{codes[ch]:04x}" for ch in s).encode() + b">"
        )

    shows = []
    for ln in lines:
        if use_tj_array:
            # split into kerned halves: [(ab) -120 (cd)] TJ
            half = len(ln) // 2
            shows.append(
                b"[" + op(ln[:half]) + b" -120 "
                + op(ln[half:]) + b"] TJ T*"
            )
        else:
            shows.append(op(ln) + b" Tj T*")
    return b"BT /F1 12 Tf 72 720 Td 14 TL\n" + b"\n".join(shows) + b"\nET"


def pdf_build(
    pages: list[list[str]], *, flate: bool = True,
    use_tj_array: bool = False, lzw: bool = False,
    xref_stream: bool = False, encrypt: str | None = None,
    image: tuple[int, int, int, bytes] | None = None,
    image_filter: str = "dct",
    cid_font: bool = False,
    user_pwd: bytes = b"",
) -> bytes:
    """Minimal valid PDF writer (tests + fixtures): one content stream
    per page, each inner list one text line (``Td``-positioned ``Tj``
    shows — or a kerned ``TJ`` array per line with ``use_tj_array``),
    a Type1 /Helvetica font, FlateDecode (default), raw, or
    ``lzw=True`` LZWDecode content. The extractor's roundtrip pin.

    ``xref_stream=True`` (r13) emits the PDF-1.5 layout real-world
    files use: the document dicts (catalog/pages/font/page) AND the
    content-stream length integers live in a Flate-compressed ``/Type
    /ObjStm`` object stream, content streams carry INDIRECT ``/Length
    N 0 R`` references into it, and the cross-reference is a binary
    ``/Type /XRef`` stream (``/W [1 2 1]``, type-1 and type-2 rows) —
    so the reader's xref walk, ObjStm expansion, and indirect-length
    resolution are all on the extraction path.

    ``encrypt`` (r13): ``"rc4-40"`` (/V 1 /R 2), ``"rc4-128"``
    (/V 2 /R 3) or ``"aesv2"`` (/V 4 /R 4, AES-128-CBC crypt filter)
    emits the file under the Standard security handler with an EMPTY
    user password and owner password ``owner`` — the owner-locked,
    world-readable shape encrypted crawl PDFs actually have. /O and
    /U are computed with the real Algorithms 3/5 so the reader's
    Algorithm-6 authentication is exercised, streams are encrypted
    with per-object keys (Algorithm 1) AFTER filter encoding, and
    /Length reflects the encrypted byte count (AES grows streams by
    IV + PKCS#7 padding). The AES IV is a deterministic digest of
    (/ID, object number) — fixtures must be reproducible.

    ``image`` (r13): ``(width, height, channels, pixels)`` embeds one
    image XObject on page 1 — ``image_filter`` ``"dct"`` routes the
    pixels through :func:`multimodal.jpeg_encode` (per-block-constant
    pixels decode exactly under the all-ones quant, the closed-form
    trick the video legs use), ``"flate"`` deflates raw samples,
    ``"raw"`` stores them — referenced from the page's /XObject
    resources and painted by a ``Do`` after the text object."""

    def enc(content: bytes) -> tuple[bytes, str]:
        if lzw:
            from timeseries_db_spark.operators.multimodal import (
                _tiff_lzw_encode,
            )

            return _tiff_lzw_encode(content), " /Filter /LZWDecode"
        if flate:
            return zlib.compress(content), " /Filter /FlateDecode"
        return content, ""

    crypt = None
    enc_body = b""
    id_frag = ""
    if encrypt is not None:
        import hashlib

        from timeseries_db_spark.functions.crypto import (
            aes128_cbc_encrypt,
            rc4,
        )

        modes = {
            "rc4-40": (1, 2, 5, False),
            "rc4-128": (2, 3, 16, False),
            "aesv2": (4, 4, 16, True),
        }
        if encrypt == "aes256":
            # r14: ISO 32000-2 rev 6 — /U carries hash+salts, /UE the
            # CBC-wrapped file key, /O//OE the owner twins (udata =
            # /U), /Perms the ECB-sealed permission block. All salts
            # and the file key are digests of /ID — deterministic.
            from timeseries_db_spark.functions.crypto import (
                aes_cbc_encrypt_nopad,
                aes_encrypt_block,
            )

            id0 = hashlib.md5(repr(pages).encode()).digest()
            vsalt = hashlib.md5(id0 + b"v").digest()[:8]
            ksalt = hashlib.md5(id0 + b"k").digest()[:8]
            file_key = hashlib.sha256(id0 + b"filekey").digest()
            u_ent = _hash_2b(user_pwd, vsalt) + vsalt + ksalt
            ue = aes_cbc_encrypt_nopad(
                _hash_2b(user_pwd, ksalt), bytes(16), file_key
            )
            ovs = hashlib.md5(id0 + b"ov").digest()[:8]
            oks = hashlib.md5(id0 + b"ok").digest()[:8]
            o_ent = _hash_2b(b"owner", ovs, u_ent) + ovs + oks
            oe = aes_cbc_encrypt_nopad(
                _hash_2b(b"owner", oks, u_ent), bytes(16), file_key
            )
            perms = aes_encrypt_block(
                file_key,
                (-4 & 0xFFFFFFFF).to_bytes(4, "little")
                + b"\xff\xff\xff\xffTadb"
                + id0[:4],
            )
            enc_body = (
                "<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4"
                " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                " /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                f" /O <{o_ent.hex()}> /U <{u_ent.hex()}>"
                f" /OE <{oe.hex()}> /UE <{ue.hex()}>"
                f" /Perms <{perms.hex()}> >>"
            ).encode()
            id_frag = f" /ID [<{id0.hex()}> <{id0.hex()}>]"

            def crypt(data: bytes, num: int) -> bytes:
                from timeseries_db_spark.functions.crypto import (
                    aes128_cbc_encrypt,
                )

                iv = hashlib.md5(id0 + num.to_bytes(4, "big")).digest()[:16]
                return aes128_cbc_encrypt(file_key, iv, data)

        elif encrypt not in modes:
            raise ValueError(f"pdf_build encrypt mode {encrypt!r}")
        else:
            v, r, klen, aes = modes[encrypt]
            id0 = hashlib.md5(repr(pages).encode()).digest()
            p_flags = -4
            o_ent = _compute_o(b"owner", user_pwd, r, klen)
            key = _std_key(user_pwd, o_ent, p_flags, id0, r, klen)
            u_ent = _compute_u(key, id0, r)[:32]
            cf = (
                " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                " /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                if aes
                else ""
            )
            enc_body = (
                f"<< /Filter /Standard /V {v} /R {r} /Length {klen * 8} "
                f"/P {p_flags} /O <{o_ent.hex()}> /U <{u_ent.hex()}>{cf} >>"
            ).encode()
            id_frag = f" /ID [<{id0.hex()}> <{id0.hex()}>]"

            def crypt(data: bytes, num: int) -> bytes:
                ok = _obj_key(key, num, 0, aes)
                if aes:
                    iv = hashlib.md5(
                        id0 + num.to_bytes(4, "big")
                    ).digest()[:16]
                    return aes128_cbc_encrypt(ok, iv, data)
                return rc4(ok, data)

    codes = None
    cmap_stream = b""
    if cid_font:
        # r13: a Type0/Identity-H font — show strings become 2-byte
        # codes (offset 0x0100, so NO code equals its character and
        # extraction must genuinely run the CMap), mapped back by a
        # /ToUnicode stream in the standard CMap wrapper
        chars = sorted({ch for page in pages for ln in page for ch in ln})
        codes = {ch: 0x0100 + k for k, ch in enumerate(chars)}
        bf = "".join(
            f"<{c:04x}> <{ord(ch):04x}>\n" for ch, c in codes.items()
        )
        cmap_stream = (
            "/CIDInit /ProcSet findresource begin\n"
            "12 dict begin\nbegincmap\n"
            "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            f"{len(codes)} beginbfchar\n{bf}endbfchar\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\n"
            "end\nend\n"
        ).encode()

    def font_body(cmap_num: int | None) -> bytes:
        if not cid_font:
            return b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        return (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /TSDB "
            f"/Encoding /Identity-H /ToUnicode {cmap_num} 0 R >>"
        ).encode()

    def cmap_body(num: int) -> bytes:
        data = cmap_stream
        if crypt is not None:
            data = crypt(data, num)
        return (
            f"<< /Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )

    def img_body(num: int) -> bytes:
        w, h, ch, px = image
        if image_filter == "dct":
            from timeseries_db_spark.operators.multimodal import jpeg_encode

            data, filt = jpeg_encode(px, w, h, ch), " /Filter /DCTDecode"
        elif image_filter == "flate":
            data, filt = zlib.compress(px), " /Filter /FlateDecode"
        elif image_filter == "raw":
            data, filt = px, ""
        else:
            raise ValueError(f"pdf_build image_filter {image_filter!r}")
        if crypt is not None:
            data = crypt(data, num)
        cs = "/DeviceGray" if ch == 1 else "/DeviceRGB"
        return (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace {cs} /BitsPerComponent 8{filt} "
            f"/Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )

    n_p = len(pages)
    if not xref_stream:
        objs: list[bytes] = []
        page_ids = [4 + 2 * i for i in range(n_p)]
        kids = " ".join(f"{p} 0 R" for p in page_ids)
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {n_p} >>".encode()
        )
        nxt = 4 + 2 * n_p
        cmap_num = None
        if cid_font:
            cmap_num = nxt
            nxt += 1
        img_num = None
        if image is not None:
            img_num = nxt
            nxt += 1
        objs.append(font_body(cmap_num))
        for i, lines in enumerate(pages):
            shows = _pdf_shows(lines, use_tj_array, codes)
            xobj = ""
            if i == 0 and image is not None:
                shows += b"\nq 64 0 0 64 100 100 cm /Im1 Do Q"
                xobj = f" /XObject << /Im1 {img_num} 0 R >>"
            content, filt = enc(shows)
            if crypt is not None:
                content = crypt(content, page_ids[i] + 1)
            objs.append(
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >>{xobj} >> "
                f"/Contents {page_ids[i] + 1} 0 R >>".encode()
            )
            objs.append(
                f"<< /Length {len(content)}{filt} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
        if cmap_num is not None:
            objs.append(cmap_body(cmap_num))
        if image is not None:
            objs.append(img_body(img_num))
        enc_frag = ""
        if encrypt is not None:
            objs.append(enc_body)
            enc_frag = f" /Encrypt {len(objs)} 0 R{id_frag}"
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for num, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{enc_frag} >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    # --- PDF-1.5 layout: ObjStm + xref stream ---
    # numbering: 1 catalog, 2 pages, 3 font (ObjStm members);
    # page i: 4+3i page dict (member), 5+3i content stream (regular),
    # 6+3i length integer (member); then ObjStm, then XRef stream.
    nxt = 4 + 3 * n_p
    objstm_num = nxt
    nxt += 1
    cmap_num = None
    if cid_font:
        cmap_num = nxt
        nxt += 1
    img_num = None
    if image is not None:
        img_num = nxt
        nxt += 1
    enc_num = None
    if encrypt is not None:
        enc_num = nxt
        nxt += 1
    xref_num = nxt
    contents: list[bytes] = []
    members: list[tuple[int, bytes]] = [
        (1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()),
        (
            2,
            (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{4 + 3 * i} 0 R" for i in range(n_p))
                + f"] /Count {n_p} >>"
            ).encode(),
        ),
        (3, font_body(cmap_num)),
    ]
    for i, lines in enumerate(pages):
        shows = _pdf_shows(lines, use_tj_array, codes)
        xobj = ""
        if i == 0 and image is not None:
            shows += b"\nq 64 0 0 64 100 100 cm /Im1 Do Q"
            xobj = f" /XObject << /Im1 {img_num} 0 R >>"
        content, filt = enc(shows)
        if crypt is not None:
            content = crypt(content, 5 + 3 * i)
        contents.append(
            f"<< /Length {6 + 3 * i} 0 R{filt} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
        members.append(
            (
                4 + 3 * i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox "
                    f"[0 0 612 792] /Resources << /Font << /F1 3 0 R >>"
                    f"{xobj} "
                    f">> /Contents {5 + 3 * i} 0 R >>"
                ).encode(),
            )
        )
        members.append((6 + 3 * i, str(len(content)).encode()))
    bodies = bytearray()
    pairs = []
    for mnum, mbody in members:
        pairs.append(f"{mnum} {len(bodies)}")
        bodies += mbody + b" "
    header = (" ".join(pairs) + " ").encode()
    stm_data = zlib.compress(header + bytes(bodies))
    if crypt is not None:
        stm_data = crypt(stm_data, objstm_num)
    objstm_body = (
        f"<< /Type /ObjStm /N {len(members)} /First {len(header)} "
        f"/Length {len(stm_data)} /Filter /FlateDecode >>\nstream\n".encode()
        + stm_data
        + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n")
    at_of: dict[int, int] = {}
    for i, cbody in enumerate(contents):
        num = 5 + 3 * i
        at_of[num] = len(out)
        out += f"{num} 0 obj\n".encode() + cbody + b"\nendobj\n"
    at_of[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode() + objstm_body + b"\nendobj\n"
    if cmap_num is not None:
        at_of[cmap_num] = len(out)
        out += (
            f"{cmap_num} 0 obj\n".encode() + cmap_body(cmap_num)
            + b"\nendobj\n"
        )
    if img_num is not None:
        at_of[img_num] = len(out)
        out += f"{img_num} 0 obj\n".encode() + img_body(img_num) + b"\nendobj\n"
    if enc_num is not None:
        at_of[enc_num] = len(out)
        out += f"{enc_num} 0 obj\n".encode() + enc_body + b"\nendobj\n"
    # xref stream rows, /W [1 4 1]: object 0 free, members type 2,
    # regular objects type 1
    size = xref_num + 1
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([255])  # obj 0
    for num in range(1, size):
        if num in at_of:
            rows += bytes([1]) + at_of[num].to_bytes(4, "big")
            rows += bytes([0])
        elif num == xref_num:
            pass  # appended below once its offset is known
        else:
            idx = next(
                i for i, (mnum, _) in enumerate(members) if mnum == num
            )
            rows += bytes([2]) + objstm_num.to_bytes(4, "big")
            rows += bytes([idx])
    xref_at = len(out)
    rows += bytes([1]) + xref_at.to_bytes(4, "big") + bytes([0])
    xrow = zlib.compress(bytes(rows))  # the XRef stream is NEVER encrypted
    enc_frag = (
        f" /Encrypt {enc_num} 0 R{id_frag}" if enc_num is not None else ""
    )
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /Root 1 0 R"
        f"{enc_frag} "
        f"/W [1 4 1] /Length {len(xrow)} /Filter /FlateDecode >>"
        f"\nstream\n".encode()
        + xrow
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def pdf_extract_text(
    assets: DataFrame, with_images: bool = False, password: bytes = b"",
    quarantine: bool = False,
) -> DataFrame:
    """(asset_id, n_shows, n_streams, text) — :func:`pdf_text` over
    PDF assets, Arrow-batched, map-only (the standard payload-kernel
    posture). ``with_images=True`` (r13) also runs :func:`pdf_images`
    in the same kernel pass and appends ``n_images`` and ``img_px``
    (the summed pixel sums) — one payload parse serving both scans,
    so a multimodal corpus pass stays single-read."""

    cols = ["asset_id", "n_shows", "n_streams", "text"]
    schema = "asset_id long, n_shows long, n_streams long, text string"
    if with_images:
        cols += ["n_images", "img_px"]
        schema += ", n_images long, img_px long"
    if quarantine:
        # r14: per-asset error isolation (the WARC-chain posture) — a
        # corrupt/locked/unsupported PDF costs one zeroed row with the
        # message in err, never the Arrow batch; off by default so the
        # pinned gate schema is unchanged. Consumers keep err IS NULL.
        cols += ["err"]
        schema += ", err string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            if not len(pdf_batch):
                continue
            rows = []
            for asset_id, payload in zip(
                pdf_batch["asset_id"], pdf_batch["payload"]
            ):
                try:
                    text, n_shows, n_streams = pdf_text(
                        bytes(payload), password
                    )
                    row = (int(asset_id), n_shows, n_streams, text)
                    if with_images:
                        imgs = pdf_images(bytes(payload), password)
                        row += (len(imgs), sum(s for *_d, s in imgs))
                except Exception as e:
                    if not quarantine:
                        raise
                    row = (int(asset_id), 0, 0, "")
                    if with_images:
                        row += (0, 0)
                    row += (str(e) or type(e).__name__,)
                else:
                    if quarantine:
                        row += (None,)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return (
        assets.filter(F.col("kind") == "pdf")
        .select("asset_id", "payload")
        .mapInPandas(gen, schema=schema)
    )
