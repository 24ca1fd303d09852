"""Archive ingestion (r13): TAR and ZIP containers parsed from spec —
the packaging real datasets actually arrive in (a Common Crawl dump, a
LAION shard, a code corpus: tarballs and zips of mixed-modality files).
Members are enumerated, decompressed (ZIP deflate via stdlib ``zlib``
raw-inflate, CRC-verified) and routed by MAGIC to the repo's existing
decode surfaces (image/audio/video/PDF/WARC/text), so one ingest
operator turns an archive column into the same asset rows every other
kernel consumes.

* **TAR** (POSIX ustar): 512-byte headers — name(100), size as octal
  at offset 124, typeflag at 156 (regular files only; directories and
  link entries are enumerated but carry no payload), data padded to
  512, two zero blocks end the stream. Header checksum verified
  (unsigned sum with the checksum field blanked). GNU long-name 'L'
  entries apply their payload as the next member's name (r13 late).
* **ZIP** (APPNOTE): EOCD scan from the tail (comment-tolerant),
  central-directory walk (the AUTHORITATIVE member list — local
  headers are only trusted for their variable-length field sizes),
  stored (0) and deflate (8) methods, CRC-32 verified per member;
  ZIP64 via the EOCD64 locator/record chain + 0x0001 extra fields
  (r13 late). Encryption stays the documented seam.

Scale posture: the standard Arrow-batched ``mapInPandas`` payload
kernel — archives expand executor-side, one row per member, and the
member payloads feed the downstream decode stages without touching the
driver. At 100 TB the archive files are the arrival unit exactly like
WARC segments.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tar_size(field: bytes) -> int:
    """A tar numeric field — octal, or (r15) GNU base-256: when the
    first byte's high bit is set the remaining bits are a big-endian
    binary number (how members over the 8 GiB octal ceiling are
    framed; GNU tar writes it routinely on large shards)."""
    if field and field[0] & 0x80:
        n = field[0] & 0x7F
        for x in field[1:]:
            n = (n << 8) | x
        return n
    return int(field.split(b"\x00")[0].strip() or b"0", 8)


def _pax_records(data: bytes) -> dict[str, str]:
    """The records of one pax extended header (POSIX.1-2001): a series
    of ``"<len> <key>=<value>\\n"`` lines where ``<len>`` counts the
    WHOLE record including its own digits — the mechanism modern tar
    uses for long names, big sizes and high-resolution mtimes."""
    out: dict[str, str] = {}
    at = 0
    while at < len(data):
        sp = data.find(b" ", at)
        if sp < 0:
            break
        try:
            ln = int(data[at:sp])
        except ValueError:
            break
        if ln <= sp - at + 1 or at + ln > len(data):
            break
        body = data[sp + 1 : at + ln]
        if body.endswith(b"\n"):
            body = body[:-1]
        k, eq, v = body.partition(b"=")
        if eq:
            out[k.decode("utf-8", "replace")] = v.decode(
                "utf-8", "replace"
            )
        at += ln
    return out


def _tar_checksum(hdr: bytes) -> tuple[int, int]:
    """(stored, computed) header checksum — stored parses to -1 when
    the field itself is not octal (that alone fails validation)."""
    try:
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
    except ValueError:
        stored = -1
    return stored, sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])


def _tar_resync(b: bytes, at: int) -> int:
    """First 512-aligned offset >= ``at`` holding either the
    end-of-archive zero block or a SELF-VALIDATING header — checksum
    correct AND the ``ustar`` magic at 257 (stricter than the normal
    walk, which tolerates pre-POSIX headers: a resync candidate sits
    inside unknown damage, so both signals are required before any
    member is emitted from it). tar's global 512 alignment is what
    makes this sound: every real header is on a block boundary
    regardless of what the damaged member's size field claimed."""
    while at + 512 <= len(b):
        hdr = b[at : at + 512]
        if hdr == b"\x00" * 512:
            return at
        if hdr[257:262] == b"ustar":
            stored, calc = _tar_checksum(hdr)
            if stored == calc:
                return at
        at += 512
    return len(b)


def tar_scan(
    payload: bytes, strict: bool = True
) -> tuple[list[tuple[str, bytes]], list[str]]:
    """(members, errors) of a ustar/tar stream — GNU long-name (``L``)
    entries apply their payload as the NEXT member's name (r13 late;
    names >100 bytes are how deep dataset trees actually tar up), and
    (r15) pax extended headers (typeflag ``x`` per-file / ``g``
    global — what POSIX.1-2001-mode tar, the modern default, actually
    writes): ``path`` and ``size`` records override the bounded ustar
    fields, precedence pax > GNU L > header. Numeric fields accept
    the GNU base-256 form (>8 GiB members).

    ``strict=True`` raises ``ValueError`` on a bad header checksum or
    truncation; ``strict=False`` (r14 — the quarantine posture of the
    WARC chain, ``warc.py:warc_scan``) records the error and RESYNCS
    (r15 — VERDICT item 4): tar headers are self-validating (checksum
    over the 512-byte block + ``ustar`` magic), so the walk scans
    forward 512-aligned for the next validating header and keeps the
    TRAILING members too — the Avro sync-marker recovery applied to
    tar framing. At 100 TB a mid-shard flip costs one member, not half
    the shard. Genuine truncation (data running off the buffer) still
    ends the walk — there is nothing after it to recover."""
    b = payload
    out: list[tuple[str, bytes]] = []
    errs: list[str] = []

    def fail(msg: str) -> None:
        if strict:
            raise ValueError(msg)
        errs.append(msg)

    at = 0
    pending_name: str | None = None
    pending_pax: dict[str, str] = {}
    global_pax: dict[str, str] = {}
    marker_seen = False
    while at + 512 <= len(b):
        hdr = b[at : at + 512]
        if hdr == b"\x00" * 512:
            marker_seen = True
            break  # end-of-archive marker
        stored, calc = _tar_checksum(hdr)
        if stored != calc:
            fail(
                "tar header checksum unparseable"
                if stored < 0
                else f"tar header checksum mismatch at offset {at}"
            )
            # pending long-name/pax state can't be trusted across damage
            pending_name = None
            pending_pax = {}
            at = _tar_resync(b, at + 512)
            continue
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        size = _tar_size(hdr[124:136])
        typeflag = hdr[156:157]
        # pax 'size' overrides the (octal-bounded) header field for the
        # NEXT regular member — POSIX.1-2001 precedence
        if typeflag in (b"0", b"\x00") and "size" in pending_pax:
            try:
                size = int(pending_pax["size"])
            except ValueError:
                fail("tar pax size record unparseable")
                pending_pax = {}
        data_at = at + 512
        if data_at + size > len(b):
            fail("tar member data truncated")
            break
        data = b[data_at : data_at + size]
        if typeflag == b"L":
            pending_name = (
                data.split(b"\x00")[0].decode("utf-8", "replace")
            )
        elif typeflag == b"x":  # r15: pax per-file extended header
            pending_pax.update(_pax_records(data))
        elif typeflag == b"g":  # r15: pax global defaults
            global_pax.update(_pax_records(data))
        elif typeflag in (b"0", b"\x00"):
            out.append(
                (
                    pending_pax.get("path")
                    or pending_name
                    or global_pax.get("path")
                    or name,
                    data,
                )
            )
            pending_name = None
            pending_pax = {}
        else:
            pending_name = None
            pending_pax = {}
        at = data_at + ((size + 511) // 512) * 512
    if not strict and not marker_seen and not errs:
        # r15: a tar that ends without its end-of-archive zero block
        # was TRUNCATED — at a member boundary the cut would OTHERWISE
        # BE SILENT (there is no central index to disagree), which is
        # exactly when this diagnostic fires; damage that was already
        # reported isn't double-counted. Strict mode keeps accepting
        # marker-less streams (pre-existing contract; some writers
        # genuinely omit the blocks).
        errs.append("tar stream ends without end-of-archive marker")
    return out, errs


def tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Strict form of :func:`tar_scan` — (name, data) for every
    REGULAR file, raising on any structural damage."""
    return tar_scan(payload, strict=True)[0]


# --- ZipCrypto (APPNOTE 6.0 §6.1, "traditional PKWARE encryption") ---
# Three 32-bit key registers driven by the CRC-32 table; fully public.
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _zc_update(keys: list[int], ch: int) -> None:
    keys[0] = (keys[0] >> 8) ^ _CRC_TABLE[(keys[0] ^ ch) & 0xFF]
    keys[1] = ((keys[1] + (keys[0] & 0xFF)) * 134775813 + 1) & 0xFFFFFFFF
    keys[2] = (keys[2] >> 8) ^ _CRC_TABLE[(keys[2] ^ (keys[1] >> 24)) & 0xFF]


def _zc_keys(password: bytes) -> list[int]:
    keys = [0x12345678, 0x23456789, 0x34567890]
    for ch in password:
        _zc_update(keys, ch)
    return keys


def _zc_stream_byte(keys: list[int]) -> int:
    t = (keys[2] | 2) & 0xFFFF
    return ((t * (t ^ 1)) >> 8) & 0xFF


def zipcrypto_decrypt(
    data: bytes, password: bytes, check_byte: int
) -> bytes:
    """Decrypt one ZipCrypto member (r14): the 12-byte encryption
    header is stripped after its last byte is verified against
    ``check_byte`` (the high byte of the member's CRC-32 — the
    password check APPNOTE specifies). Raises ``ValueError`` on a
    wrong password."""
    keys = _zc_keys(password)
    out = bytearray()
    for i, cb in enumerate(data):
        p = cb ^ _zc_stream_byte(keys)
        _zc_update(keys, p)
        if i == 11 and p != check_byte:
            raise ValueError("ZipCrypto password check failed")
        out.append(p)
    if len(out) < 12:
        raise ValueError("ZipCrypto member shorter than its header")
    return bytes(out[12:])


def zipcrypto_encrypt(
    data: bytes, password: bytes, crc: int, check_byte: int | None = None
) -> bytes:
    """The writer half (the reader's pin): a DETERMINISTIC 12-byte
    header derived from the member CRC (fixtures must reproduce),
    last header byte = crc >> 24 per APPNOTE — or ``check_byte`` when
    given (r15: bit-3 members substitute the mod-time high byte, the
    CRC being unknown when a streaming writer encrypts)."""
    hdr = bytes((crc >> (8 * (k % 4))) & 0xFF for k in range(11))
    hdr += bytes(
        [(crc >> 24) & 0xFF if check_byte is None else check_byte & 0xFF]
    )
    keys = _zc_keys(password)
    out = bytearray()
    for p in hdr + data:
        out.append(p ^ _zc_stream_byte(keys))
        _zc_update(keys, p)
    return bytes(out)


#: deterministic DOS mod-time of bit-3 fixture members (the check byte
#: is its high byte 0xA5 — nonzero, so the pin can't pass by accident)
_ZC_BIT3_TIME = 0xA55A


def _winzip_aes_decrypt(
    name: str, raw: bytes, password: bytes, strength: int
) -> bytes:
    """One WinZip-AES member payload → the (still-compressed) member
    bytes: salt ∥ 2-byte password verifier ∥ ciphertext ∥ 10-byte
    HMAC-SHA1 auth code. Key material is PBKDF2-HMAC-SHA1 (1000
    iterations, the published WinZip AE parameter); the verifier
    catches a wrong password, the HMAC catches tampering BEFORE any
    inflate touches attacker bytes."""
    import hashlib
    import hmac as _hmac

    if strength not in (1, 2, 3):
        raise ValueError(f"ZIP member {name!r} AES strength {strength}")
    salt_len = 4 + 4 * strength
    klen = 8 + 8 * strength
    if len(raw) < salt_len + 12:
        raise ValueError(f"ZIP member {name!r} AES payload truncated")
    salt = raw[:salt_len]
    verify = raw[salt_len : salt_len + 2]
    ct = raw[salt_len + 2 : -10]
    auth = raw[-10:]
    km = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, 2 * klen + 2)
    if km[-2:] != verify:
        raise ValueError(f"ZIP member {name!r} AES password check failed")
    mac = _hmac.new(km[klen : 2 * klen], ct, hashlib.sha1).digest()[:10]
    if mac != auth:
        raise ValueError(
            f"ZIP member {name!r} AES authentication failed (tampered)"
        )
    from timeseries_db_spark.functions.crypto import aes_ctr_le

    return aes_ctr_le(km[:klen], ct)


def _winzip_aes_encrypt(
    name: str, raw: bytes, password: bytes, strength: int
) -> bytes:
    """Writer half (the reader's pin) — deterministic salt derived
    from the member name + bytes (fixtures must reproduce)."""
    import hashlib
    import hmac as _hmac

    salt_len = 4 + 4 * strength
    klen = 8 + 8 * strength
    salt = hashlib.md5(name.encode() + raw).digest()[:salt_len]
    km = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, 2 * klen + 2)
    from timeseries_db_spark.functions.crypto import aes_ctr_le

    ct = aes_ctr_le(km[:klen], raw)
    mac = _hmac.new(km[klen : 2 * klen], ct, hashlib.sha1).digest()[:10]
    return salt + km[-2:] + ct + mac


def _zip_aes_extra(extra: bytes) -> tuple[int, int, int] | None:
    """(vendor_version, strength, real_method) from a 0x9901 WinZip
    AES extra field, if present."""
    j = 0
    while j + 4 <= len(extra):
        fid = int.from_bytes(extra[j : j + 2], "little")
        flen = int.from_bytes(extra[j + 2 : j + 4], "little")
        if fid == 0x9901 and flen >= 7:
            return (
                int.from_bytes(extra[j + 4 : j + 6], "little"),
                extra[j + 8],
                int.from_bytes(extra[j + 9 : j + 11], "little"),
            )
        j += 4 + flen
    return None


def _zip_decode_member(
    name: str, raw: bytes, flags: int, method: int, crc: int,
    usize: int, aes_info: tuple | None, password: bytes | None,
    check_byte: int,
) -> bytes:
    """Decrypt + inflate + CRC/size-verify ONE member's raw bytes —
    shared by the central-directory walk and the r15 truncated-zip
    local-header recovery walk. Raises ``ValueError`` with the member
    name on any failure."""
    skip_crc = False
    if flags & 0x01:
        if method == 99:
            if aes_info is None:
                raise ValueError(
                    f"ZIP member {name!r} method 99 without a "
                    "0x9901 AES extra field"
                )
            if password is None:
                raise ValueError(
                    f"ZIP member {name!r} is AES-encrypted "
                    "(no password given)"
                )
            ver, strength, real_method = aes_info
            raw, method = _winzip_aes_decrypt(
                name, raw, password, strength
            ), real_method
            skip_crc = ver == 2  # AE-2 stores CRC 0 by spec
        else:
            if password is None:
                raise ValueError(
                    f"ZIP member {name!r} is ZipCrypto-encrypted "
                    "(no password given)"
                )
            raw = zipcrypto_decrypt(raw, password, check_byte)
    if method == 0:
        data = raw
    elif method == 8:
        try:
            data = zlib.decompressobj(-15).decompress(raw)
        except zlib.error as e:
            raise ValueError(f"ZIP member {name!r} inflate: {e}") from e
    else:
        raise ValueError(
            f"ZIP compression method {method} unsupported "
            "(stored/deflate only; seam)"
        )
    if len(data) != usize or (
        not skip_crc and zlib.crc32(data) != crc
    ):
        raise ValueError(f"ZIP member {name!r} CRC/size mismatch")
    return data


def _zip_local_walk(
    b: bytes, errs: list[str], password: bytes | None
) -> list[tuple[str, bytes]]:
    """Truncated-download recovery (r15): when the central directory /
    EOCD never arrived (the END of the file is what a cut connection
    loses), the LOCAL headers that did arrive still frame their
    members — walk them from offset 0, resolving bit-3 members through
    their ``PK\\x07\\x08`` data descriptors (the descriptor's own
    csize must equal the scanned span, so a signature coincidence
    inside member data can't misframe the walk). Each member is
    decrypted/inflated/CRC-verified exactly like the CD path; the walk
    stops at the truncation point, keeping everything before it — the
    zip analog of the tar resync."""
    members: list[tuple[str, bytes]] = []
    at = 0
    while b[at : at + 4] == b"PK\x03\x04":
        hdr_at = at
        if at + 30 > len(b):
            errs.append("ZIP local header truncated")
            break
        flags = int.from_bytes(b[at + 6 : at + 8], "little")
        method = int.from_bytes(b[at + 8 : at + 10], "little")
        crc = int.from_bytes(b[at + 14 : at + 18], "little")
        csize = int.from_bytes(b[at + 18 : at + 22], "little")
        usize = int.from_bytes(b[at + 22 : at + 26], "little")
        nlen = int.from_bytes(b[at + 26 : at + 28], "little")
        elen = int.from_bytes(b[at + 28 : at + 30], "little")
        if at + 30 + nlen + elen > len(b):
            errs.append("ZIP local header name/extra truncated")
            break
        raw_name = b[at + 30 : at + 30 + nlen]
        name = raw_name.decode(
            "utf-8" if flags & 0x800 else "cp437", "replace"
        )
        extra = b[at + 30 + nlen : at + 30 + nlen + elen]
        aes_info = _zip_aes_extra(extra)
        data_at = at + 30 + nlen + elen
        if flags & 0x08 and csize == 0:
            sig = b.find(b"PK\x07\x08", data_at)
            while sig >= 0:
                cs = int.from_bytes(b[sig + 8 : sig + 12], "little")
                if sig - data_at == cs:
                    break
                sig = b.find(b"PK\x07\x08", sig + 1)
            if sig < 0:
                errs.append(
                    f"ZIP member {name!r} data descriptor not found "
                    "(truncated)"
                )
                break
            crc = int.from_bytes(b[sig + 4 : sig + 8], "little")
            csize = sig - data_at
            usize = int.from_bytes(b[sig + 12 : sig + 16], "little")
            raw = b[data_at:sig]
            at = sig + 16
        else:
            raw = b[data_at : data_at + csize]
            if len(raw) != csize:
                errs.append(f"ZIP member {name!r} data truncated")
                break
            at = data_at + csize
            if flags & 0x08:
                # a descriptor follows even when the header carried
                # real sizes; the signature is optional per APPNOTE
                at += 16 if b[at : at + 4] == b"PK\x07\x08" else 12
        try:
            check = b[hdr_at + 11] if flags & 0x08 else (crc >> 24) & 0xFF
            data = _zip_decode_member(
                name, raw, flags, method, crc, usize, aes_info,
                password, check,
            )
        except ValueError as e:
            errs.append(str(e))
            continue
        if not name.endswith("/"):
            members.append((name, data))
    return members


def zip_scan(
    payload: bytes, strict: bool = True, password: bytes | None = None,
) -> tuple[list[tuple[str, bytes]], list[str]]:
    """(members, errors) of a ZIP archive, via the central directory;
    stored + deflate methods, member CRC-32 verified. ZIP64 (r13
    late): the EOCD64 locator/record chain and the 0x0001 extra field
    resolve the 0xFFFF/0xFFFFFFFF markers — the layout large dataset
    zips actually use.

    ``strict=False`` (r14): central-directory entries are independent,
    so a corrupt MEMBER (bad CRC, truncation, bad local header,
    unsupported method) costs only itself — the error is recorded and
    the walk continues with its siblings, the quarantine posture of
    the WARC chain. A missing/desynced central directory is still
    whole-archive damage (recorded as one error, empty result).

    ``password`` (r14): ZipCrypto (APPNOTE traditional encryption)
    members decrypt when flag bit 0 is set; the 12-byte header's check
    byte authenticates the password against the member CRC. WinZip
    AES (method 99 + the 0x9901 extra field — AE-1/AE-2) decrypts too
    (r14 late): PBKDF2-HMAC-SHA1(1000) key material, 2-byte password
    verifier, AES-CTR with a little-endian counter from 1, and the
    10-byte HMAC-SHA1 authentication code VERIFIED before inflate
    (AE-2 stores CRC 0, so the HMAC is the integrity check)."""
    b = payload
    members: list[tuple[str, bytes]] = []
    errs: list[str] = []

    def fail(msg: str) -> bool:
        if strict:
            raise ValueError(msg)
        errs.append(msg)
        return False

    eocd = b.rfind(b"PK\x05\x06", max(0, len(b) - 65_557))
    if eocd >= 0 and eocd + 22 > len(b):
        # r15: a cut INSIDE the EOCD record leaves the signature but
        # not its fields — int-of-empty-slice would read entry count 0
        # and "succeed" with an empty archive
        eocd = -1
    if eocd < 0:
        fail("ZIP end-of-central-directory not found")
        if b[:4] == b"PK\x03\x04":
            # r15: a TRUNCATED DOWNLOAD loses the END of the file (the
            # central directory + EOCD live there) — recover the
            # members whose local headers + data did arrive
            return _zip_local_walk(b, errs, password), errs
        return members, errs
    n = int.from_bytes(b[eocd + 10 : eocd + 12], "little")
    cd_at = int.from_bytes(b[eocd + 16 : eocd + 20], "little")
    if n == 0xFFFF or cd_at == 0xFFFFFFFF:
        loc = b.rfind(b"PK\x06\x07", max(0, eocd - 20), eocd)
        if loc < 0:
            fail("ZIP64 EOCD locator missing")
            return members, errs
        r64 = int.from_bytes(b[loc + 8 : loc + 16], "little")
        if b[r64 : r64 + 4] != b"PK\x06\x06":
            fail("ZIP64 EOCD record missing")
            return members, errs
        n = int.from_bytes(b[r64 + 32 : r64 + 40], "little")
        cd_at = int.from_bytes(b[r64 + 48 : r64 + 56], "little")
    at = cd_at
    for _ in range(n):
        if at + 46 > len(b) or b[at : at + 4] != b"PK\x01\x02":
            fail("ZIP central-directory entry desynced")
            break
        flags = int.from_bytes(b[at + 8 : at + 10], "little")
        method = int.from_bytes(b[at + 10 : at + 12], "little")
        crc = int.from_bytes(b[at + 16 : at + 20], "little")
        csize = int.from_bytes(b[at + 20 : at + 24], "little")
        usize = int.from_bytes(b[at + 24 : at + 28], "little")
        nlen = int.from_bytes(b[at + 28 : at + 30], "little")
        elen = int.from_bytes(b[at + 30 : at + 32], "little")
        clen = int.from_bytes(b[at + 32 : at + 34], "little")
        lho = int.from_bytes(b[at + 42 : at + 46], "little")
        if at + 46 + nlen + elen > len(b):
            fail("ZIP central-directory entry name/extra truncated")
            break
        raw_name = b[at + 46 : at + 46 + nlen]
        # r15 (name-encoding fidelity): APPNOTE appendix D — names are
        # CP437 unless general-purpose bit 11 declares UTF-8; the
        # Info-ZIP 0x7075 Unicode Path extra field (parsed below)
        # overrides both when its CRC over the standard name matches
        name = raw_name.decode(
            "utf-8" if flags & 0x800 else "cp437", "replace"
        )
        extra = b[at + 46 + nlen : at + 46 + nlen + elen]
        # ZIP64 extra field 0x0001: 8-byte values, present ONLY for
        # the fields the fixed entry marked 0xFFFFFFFF, in spec order
        # usize, csize, lho. 0x9901 (r14 late) is the WinZip AES
        # header: vendor version (1/2 = AE-1/AE-2), 'AE', key strength
        # (1/2/3 = 128/192/256), and the REAL compression method.
        aes_info = None
        j = 0
        while j + 4 <= len(extra):
            fid = int.from_bytes(extra[j : j + 2], "little")
            flen = int.from_bytes(extra[j + 2 : j + 4], "little")
            if fid == 0x0001:
                p = j + 4
                if usize == 0xFFFFFFFF:
                    usize = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
                if csize == 0xFFFFFFFF:
                    csize = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
                if lho == 0xFFFFFFFF:
                    lho = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
            elif fid == 0x9901 and flen >= 7:
                aes_info = (
                    int.from_bytes(extra[j + 4 : j + 6], "little"),
                    extra[j + 8],
                    int.from_bytes(extra[j + 9 : j + 11], "little"),
                )
            elif fid == 0x7075 and flen >= 6 and extra[j + 4] == 1:
                # Info-ZIP Unicode Path: version 1, CRC-32 of the
                # STANDARD name field (stale entries must be ignored
                # when the name was edited without the field), UTF-8
                if (
                    int.from_bytes(extra[j + 5 : j + 9], "little")
                    == zlib.crc32(raw_name)
                ):
                    name = extra[j + 9 : j + 4 + flen].decode(
                        "utf-8", "replace"
                    )
            j += 4 + flen
        at += 46 + nlen + elen + clen
        # per-member extraction: under strict=False an error here
        # costs only this member (r14)
        try:
            if b[lho : lho + 4] != b"PK\x03\x04":
                raise ValueError(f"ZIP member {name!r} local header desynced")
            lnlen = int.from_bytes(b[lho + 26 : lho + 28], "little")
            lelen = int.from_bytes(b[lho + 28 : lho + 30], "little")
            data_at = lho + 30 + lnlen + lelen
            raw = b[data_at : data_at + csize]
            if len(raw) != csize:
                raise ValueError(f"ZIP member {name!r} data truncated")
            # r15 (ADVICE): with flag bit 3 (data descriptor) the CRC
            # was unknown at encrypt time, so APPNOTE 6.1.6
            # substitutes the high byte of the local header's DOS
            # mod-time as the ZipCrypto password check byte
            if flags & 0x08:
                check = b[lho + 11] if lho + 12 <= len(b) else 0
            else:
                check = (crc >> 24) & 0xFF
            data = _zip_decode_member(
                name, raw, flags, method, crc, usize, aes_info,
                password, check,
            )
        except ValueError as e:
            if strict:
                raise
            errs.append(str(e))
            continue
        if not name.endswith("/"):
            members.append((name, data))
    return members, errs


def zip_members(
    payload: bytes, password: bytes | None = None
) -> list[tuple[str, bytes]]:
    """Strict form of :func:`zip_scan` — raises ``ValueError`` for
    unsupported methods/encryption/corruption."""
    return zip_scan(payload, strict=True, password=password)[0]


def archive_scan(
    payload: bytes, strict: bool = True, password: bytes | None = None,
) -> tuple[list[tuple[str, bytes]], list[str]]:
    """Magic-dispatching (members, errors) enumeration: ZIP (``PK``),
    tar (ustar magic at 257, or a checksum-valid first header), or
    either inside a gzip / xz / bzip2 / zstd / lz4-frame wrapper
    (``.tar.{gz,xz,bz2,zst,lz4}`` — the shapes tarballs actually ship
    in; zstd/lz4 decode through pyarrow's bundled codecs, r15 — the
    former "no zstd on this interpreter" seam was a false
    constraint).

    ``strict=False`` (r14): structural damage is QUARANTINED, not
    raised — a corrupt wrapper or unrecognized container records one
    error (empty member list); per-member damage inside ZIP costs only
    that member; a bad tar header keeps the members before it. One
    corrupt archive in an Arrow batch costs one error row, never the
    batch — the posture ``warc.py:warc_scan`` set."""
    b = payload
    try:
        if b[:2] == b"\x1f\x8b":
            # r14 late: MULTI-MEMBER gzip — pigz and block-parallel
            # compressors emit concatenated members, and a single
            # zlib.decompress silently stops at the first one,
            # truncating the tar stream mid-archive
            out = bytearray()
            rest = b
            while rest[:2] == b"\x1f\x8b":
                d = zlib.decompressobj(31)
                out += d.decompress(rest)
                out += d.flush()
                rest = d.unused_data
            b = bytes(out)
        elif b[:6] == b"\xfd7zXZ\x00":
            import lzma

            b = lzma.decompress(b)
        elif b[:3] == b"BZh":
            import bz2

            b = bz2.decompress(b)
        elif b[:4] in (b"\x28\xb5\x2f\xfd", b"\x04\x22\x4d\x18"):
            # r15: .tar.zst / .tar.lz4 — the zstd seam closes through
            # pyarrow's BUNDLED codecs (a baked dependency; the real
            # libraries, not a from-recall reimplementation). The
            # stream API handles concatenated frames like pigz gzip.
            import pyarrow as _pa

            b = _pa.input_stream(
                _pa.py_buffer(b),
                compression="zstd" if b[0] == 0x28 else "lz4",
            ).read()
    except Exception as e:  # zlib.error / LZMAError / OSError
        if strict:
            raise ValueError(f"archive wrapper corrupt: {e}") from e
        return [], [f"archive wrapper corrupt: {e}"]
    if b[:2] == b"PK":
        return zip_scan(b, strict=strict, password=password)
    if len(b) >= 512 and (
        b[257:262] == b"ustar" or b[148:156].strip(b"\x00 ")
    ):
        return tar_scan(b, strict=strict)
    if strict:
        raise ValueError("unrecognized archive container")
    return [], ["unrecognized archive container"]


def archive_members(
    payload: bytes, password: bytes | None = None
) -> list[tuple[str, bytes]]:
    """Strict form of :func:`archive_scan` — raises ``ValueError`` on
    any structural damage."""
    return archive_scan(payload, strict=True, password=password)[0]


def tar_build(
    members: list[tuple[str, bytes]], pax: bool = False
) -> bytes:
    """Minimal ustar writer (the reader's roundtrip pin) — names over
    100 bytes emit a GNU ``L`` long-name entry first (r13 late), or a
    pax ``x`` extended header with a ``path`` record when ``pax=True``
    (r15 — the POSIX.1-2001 layout modern tar defaults to)."""

    def pax_record(key: str, value: str) -> bytes:
        body = f" {key}={value}\n".encode("utf-8")
        n = len(body) + 1
        while len(str(n)) + len(body) != n:
            n = len(str(n)) + len(body)
        return str(n).encode() + body

    def one(name_b: bytes, data: bytes, typeflag: bytes) -> bytes:
        hdr = bytearray(512)
        hdr[: len(name_b)] = name_b
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[156:157] = typeflag
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[148:156] = b" " * 8
        hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
        return bytes(hdr) + data + bytes((-len(data)) % 512)

    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100 and pax:
            out += one(
                b"./PaxHeaders/m", pax_record("path", name), b"x"
            )
            nb = nb[:100]
        elif len(nb) > 100:
            out += one(b"././@LongLink", nb + b"\x00", b"L")
            nb = nb[:100]
        out += one(nb, data, b"0")
    out += bytes(1024)
    return bytes(out)


def zip_build(
    members: list[tuple[str, bytes]], deflate: bool = True,
    zip64: bool = False, password: bytes | None = None,
    aes_strength: int | None = None, zc_bit3: bool = False,
) -> bytes:
    """Minimal ZIP writer (stored or deflate; the reader's pin).
    ``zip64=True`` (r13 late) forces the ZIP64 layout — 0xFFFFFFFF
    markers resolved through 0x0001 extra fields, EOCD64 record +
    locator — so the reader's large-archive path is pinned without a
    4 GB fixture. ``password`` (r14) emits ZipCrypto members (flag
    bit 0, deterministic 12-byte header); with ``aes_strength``
    (1/2/3 = AES-128/192/256) it emits WinZip AE-2 members instead —
    method 99, the 0x9901 extra field in local AND central headers,
    CRC stored 0 per spec. ``zc_bit3`` (r15 — ADVICE) emits ZipCrypto
    members with general-purpose flag bit 3 set the way streaming
    writers do: zeroed local crc/sizes, a ``PK\\x07\\x08`` data
    descriptor after the data, a deterministic nonzero DOS mod-time,
    and the encryption header's check byte taken from the MOD-TIME
    high byte instead of the (then-unknown) CRC, per APPNOTE 6.1.6."""
    if aes_strength is not None and password is None:
        raise ValueError("aes_strength needs a password")
    if zc_bit3 and (password is None or aes_strength is not None or zip64):
        raise ValueError("zc_bit3 is a ZipCrypto (non-zip64) writer mode")
    if password is not None and zip64:
        # the ZIP64 central-directory branch writes literal zero flags,
        # so an encrypted zip64 build would desync reader and CD
        raise ValueError("zip_build: encrypted + zip64 unsupported")
    out = bytearray()
    cd = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data)
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(data) + co.flush()
            method = 8
        else:
            raw = data
            method = 0
        # r15: APPNOTE appendix D — non-ASCII names declare UTF-8 via
        # general-purpose bit 11 (without it a reader must decode CP437)
        fl = 0x800 if any(c > 0x7F for c in nb) else 0
        extra_local = b""
        if aes_strength is not None:
            raw = _winzip_aes_encrypt(name, raw, password, aes_strength)
            extra_local = (
                (0x9901).to_bytes(2, "little")
                + (7).to_bytes(2, "little")
                + (2).to_bytes(2, "little")  # AE-2
                + b"AE"
                + bytes([aes_strength])
                + method.to_bytes(2, "little")
            )
            method = 99
            crc = 0  # AE-2: the HMAC is the integrity check
            fl |= 0x01
        elif password is not None:
            if zc_bit3:
                raw = zipcrypto_encrypt(
                    raw, password, crc, check_byte=_ZC_BIT3_TIME >> 8
                )
                fl |= 0x09
            else:
                raw = zipcrypto_encrypt(raw, password, crc)
                fl |= 0x01
        flags = fl.to_bytes(2, "little")
        lho = len(out)
        dostime = (
            _ZC_BIT3_TIME.to_bytes(2, "little") + b"\x00\x00"
            if zc_bit3
            else b"\x00\x00\x00\x00"
        )
        common = (
            (45 if zip64 else 20).to_bytes(2, "little")  # version needed
            + flags
            + method.to_bytes(2, "little")
            + dostime
            + crc.to_bytes(4, "little")
            + len(raw).to_bytes(4, "little")
            + len(data).to_bytes(4, "little")
            + len(nb).to_bytes(2, "little")
            + len(extra_local).to_bytes(2, "little")
        )
        if zc_bit3:
            # bit-3 local headers carry ZEROED crc/sizes (the streaming
            # writer didn't know them yet); the real values follow the
            # data in a PK\x07\x08 descriptor and live in the CD
            local = common[:10] + bytes(12) + common[22:]
            out += b"PK\x03\x04" + local + nb + extra_local + raw
            out += (
                b"PK\x07\x08"
                + crc.to_bytes(4, "little")
                + len(raw).to_bytes(4, "little")
                + len(data).to_bytes(4, "little")
            )
        else:
            out += b"PK\x03\x04" + common + nb + extra_local + raw
        if zip64:
            extra = (
                (0x0001).to_bytes(2, "little")
                + (24).to_bytes(2, "little")
                + len(data).to_bytes(8, "little")
                + len(raw).to_bytes(8, "little")
                + lho.to_bytes(8, "little")
            )
            cd_common = (
                (45).to_bytes(2, "little")
                + b"\x00\x00"
                + method.to_bytes(2, "little")
                + b"\x00\x00\x00\x00"
                + crc.to_bytes(4, "little")
                + b"\xff\xff\xff\xff" * 2  # csize/usize deferred
                + len(nb).to_bytes(2, "little")
                + len(extra).to_bytes(2, "little")
            )
            cd += (
                b"PK\x01\x02" + (45).to_bytes(2, "little") + cd_common
                + b"\x00\x00" + b"\x00\x00"
                + b"\x00\x00" + b"\x00\x00\x00\x00"
                + b"\xff\xff\xff\xff"  # lho deferred
                + nb + extra
            )
        else:
            cd += (
                b"PK\x01\x02" + (20).to_bytes(2, "little") + common
                + b"\x00\x00"  # comment len
                + b"\x00\x00"  # disk start
                + b"\x00\x00" + b"\x00\x00\x00\x00"  # int/ext attrs
                + lho.to_bytes(4, "little")
                + nb
                + extra_local  # 0x9901 rides in the CD too (r14)
            )
    cd_at = len(out)
    out += cd
    if zip64:
        r64_at = len(out)
        out += (
            b"PK\x06\x06" + (44).to_bytes(8, "little")
            + (45).to_bytes(2, "little") + (45).to_bytes(2, "little")
            + b"\x00\x00\x00\x00" * 2  # disk numbers
            + len(members).to_bytes(8, "little") * 2
            + len(cd).to_bytes(8, "little")
            + cd_at.to_bytes(8, "little")
        )
        out += (
            b"PK\x06\x07" + b"\x00\x00\x00\x00"
            + r64_at.to_bytes(8, "little")
            + (1).to_bytes(4, "little")
        )
        out += (
            b"PK\x05\x06" + b"\x00\x00" * 2
            + b"\xff\xff" * 2
            + b"\xff\xff\xff\xff" * 2
            + b"\x00\x00"
        )
    else:
        out += (
            b"PK\x05\x06" + b"\x00\x00" * 2
            + len(members).to_bytes(2, "little") * 2
            + len(cd).to_bytes(4, "little")
            + cd_at.to_bytes(4, "little")
            + b"\x00\x00"
        )
    return bytes(out)


#: magic → asset kind for member routing (the repo's decode surfaces)
_MAGIC_KINDS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image"),
    (b"\xff\xd8", "image"),
    (b"BM", "image"),
    (b"GIF8", "image"),
    (b"II*\x00", "image"),
    (b"MM\x00*", "image"),
    (b"\x00\x00\x01\x00", "image"),
    (b"RIFF", "audio"),  # refined below (AVI → video)
    (b"FORM", "audio"),
    (b"fLaC", "audio"),
    (b"OggS", "audio"),
    (b"ID3", "audio"),
    (b"\x1aE\xdf\xa3", "video"),
    (b"%PDF-", "pdf"),
    (b"WARC/", "warc"),
    (b"Obj\x01", "avro"),  # r15: Avro containers route to avro_scan
]


def sniff_kind(data: bytes) -> str:
    """The asset kind a member's MAGIC routes it to — image / audio /
    video / pdf / warc / avro (r15: a tarball of Avro shards is a real
    arrival shape; the member payload feeds ``sources/avro.py``
    directly) / archive / text (valid UTF-8) / other."""
    for magic, kind in _MAGIC_KINDS:
        if data[: len(magic)] == magic:
            if magic == b"RIFF" and data[8:12] == b"AVI ":
                return "video"
            if magic[:2] == b"PK":
                return "archive"
            return kind
    if data[4:8] == b"ftyp":
        return "video"
    if data[:2] == b"PK":
        return "archive"
    head = data[:4096]
    if len(data) > 4096:
        # r14 (ADVICE): the 4096-byte window may split a multibyte
        # sequence — trim up to 3 trailing continuation bytes (plus the
        # lead byte they belong to) so a valid UTF-8 member isn't
        # misclassified as 'other' on a window artifact
        cut = len(head)
        while cut > 0 and cut > len(head) - 4 and head[cut - 1] & 0xC0 == 0x80:
            cut -= 1
        if cut > 0 and head[cut - 1] & 0xC0 == 0xC0:
            cut -= 1
        head = head[:cut]
    try:
        head.decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        return "other"


def _walk_archive(
    payload: bytes, depth: int, password: bytes | None
) -> tuple[list[tuple[str, str, bytes]], list[str]]:
    """Tolerant (name, kind, data) walk with optional one-or-more
    levels of NESTED expansion (r14 late — a tar of zips is how
    sharded corpora actually nest): a member sniffed ``archive`` is
    emitted as its own row AND, with ``depth > 0``, its members
    follow with ``outer!inner`` names; nested damage is quarantined
    with the same prefix."""
    members, errs = archive_scan(payload, strict=False, password=password)
    out: list[tuple[str, str, bytes]] = []
    for name, data in members:
        kind = sniff_kind(data)
        out.append((name, kind, data))
        if kind == "archive" and depth > 0:
            sub, serrs = _walk_archive(data, depth - 1, password)
            errs += [f"{name}!{e}" for e in serrs]
            out += [(f"{name}!{n}", k, d) for n, k, d in sub]
    return out, errs


def expand_archive_assets(
    assets: DataFrame, id_stride: int = 1000,
    password: bytes | None = None, recurse: int = 0,
) -> DataFrame:
    """(asset_id, member_idx, name, kind, payload, err) — one row per
    archive member, ``kind`` sniffed by magic so the rows feed the
    existing decode operators directly (``member asset_id =
    archive_id * id_stride + member_idx`` when a consumer needs a
    flat id space). Arrow-batched, map-only.

    r14 (VERDICT item 1): structural damage is QUARANTINED like the
    WARC chain (``warc.py:warc_extract_text``) — a corrupt archive or
    member surfaces as a ``kind='error'`` row (``member_idx=-1``, the
    message in ``err``) and its good siblings still expand; one dirty
    tarball costs one row, never the Arrow batch. Consumers keep
    ``err IS NULL``. ``recurse=N`` (r14 late) expands archive members
    N levels deep with ``outer!inner`` names — nested rows keep
    sequential ``member_idx`` after their container."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                aid = int(asset_id)
                members, errs = _walk_archive(
                    bytes(payload), recurse, password
                )
                for msg in errs:
                    rows.append((aid, -1, "", "error", None, msg))
                for k, (name, kind, data) in enumerate(members):
                    rows.append((aid, k, name, kind, data, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "member_idx", "name", "kind", "payload",
                    "err",
                ],
            )

    return (
        assets.filter(F.col("kind") == "archive")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, member_idx long, name string, "
            "kind string, payload binary, err string",
        )
    )


def synth_archive(doc_id: int) -> bytes:
    """Deterministic archive for the gate fixture (r13): the container
    cycles tar / zip-deflate / zip-stored by ``(doc_id // 3) % 3``;
    members are one 4×4 PNG of constant ``(3·id + 11) % 256`` (a
    second of ``(5·id + 7) % 256`` on odd ids) plus a text member
    ``Doc {id} text`` — member count, image count, decoded pixel sums
    and text length are all closed forms. r15: the TAR cycle also
    carries a pax-long-named text member ``Pax {id}`` (the ``x``
    extended-header ``path`` record resolves the 130-char name), so
    the POSIX.1-2001 layout runs under the value oracle."""
    from timeseries_db_spark.operators.multimodal import png_encode

    members = [
        (
            "img/a.png",
            png_encode(bytes([(3 * doc_id + 11) % 256]) * 16, 4, 4, 1),
        ),
        ("doc.txt", f"Doc {doc_id} text".encode()),
    ]
    if doc_id % 2:
        members.append(
            (
                "img/b.png",
                png_encode(bytes([(5 * doc_id + 7) % 256]) * 16, 4, 4, 1),
            )
        )
    sel = (doc_id // 3) % 3
    if sel == 0:
        members.append(
            (
                "pax/" + "p" * 120 + f"/d{doc_id}.txt",
                f"Pax {doc_id}".encode(),
            )
        )
        # r15: the tar cycle ships ZSTD-WRAPPED (.tar.zst — the shape
        # modern shard drops actually use); the wrapper is transparent
        # to every closed form, so the arcx oracle pins it for free.
        # r16: written WITH the frame content checksum (functions/xxh)
        # so wrapper-level flips error in the codec
        from timeseries_db_spark.functions.xxh import (
            zstd_compress_checksummed,
        )

        return zstd_compress_checksummed(tar_build(members, pax=True))
    return zip_build(members, deflate=(sel == 1))


def documents_as_archive_assets(docs: DataFrame) -> DataFrame:
    """Archive-asset fixture (the ``doc_id % 3 == 0`` image subset —
    archives here carry images)."""
    schema = "asset_id long, kind string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "kind": "archive",
                    "payload": [
                        synth_archive(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .mapInPandas(gen, schema=schema)
    )


#: the ZipCrypto password of the dirty-archive gate fixture (r14)
DIRTY_ARCHIVE_PASSWORD = b"tsdb"


def synth_archive_dirty(doc_id: int) -> bytes:
    """Deterministic DIRTY archive for the r14 quarantine gate leg —
    every archive carries exactly one quarantinable defect, the defect
    KIND cycling by ``(doc_id // 3) % 6`` so all six isolation paths
    are value-checked:

    * mode 0 — tar: a good PNG member, then a bad-checksum header
      MID-ARCHIVE, then two good text members (``'Doc {id} text'`` +
      ``'Tail {id}'``) — r15 (VERDICT item 4): the 512-aligned resync
      recovers the TRAILING members, so all three survive, 1 error.
    * mode 1 — zip-stored: good PNG, a middle text member whose bytes
      are flipped in place (CRC mismatch → that member quarantines),
      then ``'Extra {id}'`` which survives.
    * mode 2 — not an archive at all (junk container) → 0 members,
      1 error.
    * mode 3 — zip-deflate ENCRYPTED with ZipCrypto (password
      :data:`DIRTY_ARCHIVE_PASSWORD` — the decryption path under the
      value oracle) whose PNG member is garbage after the magic →
      both members decrypt, the image decode quarantines.
    * mode 4 (r14 late) — zip-deflate encrypted with WinZip AES-256
      (AE-2) whose THIRD member's ciphertext is flipped in place →
      the good members decrypt + HMAC-verify, the tampered one fails
      AUTHENTICATION (never reaching inflate) and quarantines.
    * mode 5 (r15) — TRUNCATED zip download: the file is cut exactly
      at the central directory, so the EOCD/CD never arrived — the
      local-header recovery walk keeps all three members (PNG +
      ``'Doc {id} text'`` + ``'End {id}'``), 1 structural error.
    """
    from timeseries_db_spark.operators.multimodal import png_encode

    png = png_encode(bytes([(3 * doc_id + 11) % 256]) * 16, 4, 4, 1)
    txt = f"Doc {doc_id} text".encode()
    mode = (doc_id // 3) % 6
    if mode == 5:
        z = zip_build(
            [
                ("img/a.png", png),
                ("doc.txt", txt),
                ("end.txt", f"End {doc_id}".encode()),
            ],
            deflate=True,
        )
        return z[: z.find(b"PK\x01\x02")]
    if mode == 4:
        arc = bytearray(
            zip_build(
                [
                    ("img/a.png", png),
                    ("doc.txt", txt),
                    ("bad.bin", b"POISONBYTES"),
                ],
                deflate=True,
                password=DIRTY_ARCHIVE_PASSWORD,
                aes_strength=3,
            )
        )
        # flip one ciphertext byte of bad.bin: local name + 0x9901
        # extra (11) + salt (16) + verifier (2), then inside the ct
        at = bytes(arc).find(b"bad.bin") + 7 + 11 + 16 + 2 + 1
        arc[at] ^= 0xFF
        return bytes(arc)
    if mode == 0:
        head = tar_build([("img/a.png", png)])[:-1024]
        bad = bytearray(512)
        bad[:7] = b"bad.bin"
        bad[124:136] = b"00000000000\x00"
        bad[148:156] = b"0000000\x00"  # parses as 0, never matches
        tail = tar_build(
            [("doc.txt", txt), ("tail.txt", f"Tail {doc_id}".encode())]
        )
        return head + bytes(bad) + tail
    if mode == 1:
        mid = f"Doc {doc_id} mid".encode()
        arc = bytearray(
            zip_build(
                [
                    ("img/a.png", png),
                    ("mid.txt", mid),
                    ("extra.txt", f"Extra {doc_id}".encode()),
                ],
                deflate=False,
            )
        )
        at = bytes(arc).find(mid)
        arc[at] ^= 0xFF  # stored bytes flip → CRC mismatch
        return bytes(arc)
    if mode == 2:
        return b"JUNK" * 200
    bad_png = b"\x89PNG\r\n\x1a\n" + b"NOTAPNGBODY" * 3
    return zip_build(
        [("img/bad.png", bad_png), ("doc.txt", txt)],
        deflate=True,
        password=DIRTY_ARCHIVE_PASSWORD,
    )


def documents_as_dirty_archive_assets(docs: DataFrame) -> DataFrame:
    """Dirty-archive fixture (the ``doc_id % 3 == 1`` subset — disjoint
    from the clean arcx fixture)."""
    schema = "asset_id long, kind string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "kind": "archive",
                    "payload": [
                        synth_archive_dirty(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return (
        docs.filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
        .mapInPandas(gen, schema=schema)
    )


def decode_archive_features(
    assets: DataFrame, password: bytes | None = None
) -> DataFrame:
    """(asset_id, n_members, n_images, img_px, text_len, n_errors) —
    the per-archive summary a gate oracle can restate: member count,
    image count, summed decoded pixel values of the image members
    (through :func:`multimodal.image_decode` — the composition point),
    and the summed byte length of text members.

    r14 (VERDICT item 1): the tolerant :func:`archive_scan` walks each
    archive and a failing IMAGE DECODE is caught per member — every
    quarantined error (corrupt container, bad member CRC, undecodable
    image) increments ``n_errors`` while the good siblings keep
    contributing. ``password`` decrypts ZipCrypto members."""
    import numpy as np

    from timeseries_db_spark.operators.multimodal import image_decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                members, errs = archive_scan(
                    bytes(payload), strict=False, password=password
                )
                n_err = len(errs)
                n_img = 0
                img_px = 0
                text_len = 0
                for _name, data in members:
                    kind = sniff_kind(data)
                    if kind == "image":
                        try:
                            _w, _h, _c, px = image_decode(data)
                        except Exception:
                            n_err += 1
                            continue
                        n_img += 1
                        img_px += int(
                            np.frombuffer(px, np.uint8).sum(dtype=np.int64)
                        )
                    elif kind == "text":
                        text_len += len(data)
                rows.append(
                    (
                        int(asset_id), len(members), n_img, img_px,
                        text_len, n_err,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_members", "n_images", "img_px",
                    "text_len", "n_errors",
                ],
            )

    return (
        assets.filter(F.col("kind") == "archive")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, n_members long, n_images long, "
            "img_px long, text_len long, n_errors long",
        )
    )
