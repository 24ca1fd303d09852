"""XXH64 from the published xxHash specification, and the zstd
content-checksum writer posture built on it (r16 — VERDICT item 3).

pyarrow's bundled libzstd COMPRESSES without the optional frame
content checksum (frame header descriptor bit 2 clear), so a bit flip
in a stored ``.zst`` artifact can decompress SILENTLY into garbage —
the r15 caveat pinned in SCALE.md relied on the next layer's framing
(Avro record decode, ``from_json`` quarantine) to catch it. The zstd
frame format (RFC 8878 §3.1.1) makes the checksum a pure envelope
feature: set Content_Checksum_flag in the descriptor byte and append
the low 32 bits of ``XXH64(content, seed=0)`` after the last block.
Every conforming decoder — including the same bundled libzstd on the
read path — then VERIFIES content integrity, so first-party shards
error in the codec instead of flipping silently.

XXH64 itself is implemented from the public algorithm description
(github.com/Cyan4973/xxHash, xxhash_spec.md) — no third-party module
on this interpreter ships it for raw bytes. Spark's ``xxhash64``
expression is the same algorithm at seed 42 over UTF-8 bytes, which
the tests use as an independent cross-implementation pin alongside
libzstd accepting (and enforcing) the checksums we emit.

Scale posture: checksumming is one linear pass over the uncompressed
bytes at WRITE time (writers are executor-side, per shard). Measured
honestly: the pure-Python pass runs ~12 MB/s vs ~2.7 GB/s for the
zstd compression it protects, so on multi-hundred-MB shards it would
DOMINATE write cost. :func:`xxh64` therefore dispatches to the C
``xxhash`` module when the deployment image ships it (the common
case — one `pip install xxhash` makes the pass ~5 GB/s) and falls
back to the from-spec implementation here, which doubles as the
cross-check that any C module the image ships computes the same
function. The read path is unchanged — libzstd verifies natively.
"""

from __future__ import annotations

try:  # deployment fast path; the pure-Python form below is the spec pin
    import xxhash as _xxhash_c
except ImportError:  # this container: from-spec implementation serves
    _xxhash_c = None

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the C ``xxhash`` module when available
    (see module docstring for the measured why), else the spec's
    stripe/merge/avalanche pipeline verbatim in Python."""
    if _xxhash_c is not None:
        return _xxhash_c.xxh64_intdigest(data, seed)
    return _xxh64_py(data, seed)


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    at = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        end = n - 32
        while at <= end:
            v1 = _round(v1, int.from_bytes(data[at : at + 8], "little"))
            v2 = _round(
                v2, int.from_bytes(data[at + 8 : at + 16], "little")
            )
            v3 = _round(
                v3, int.from_bytes(data[at + 16 : at + 24], "little")
            )
            v4 = _round(
                v4, int.from_bytes(data[at + 24 : at + 32], "little")
            )
            at += 32
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        acc = _merge_round(acc, v1)
        acc = _merge_round(acc, v2)
        acc = _merge_round(acc, v3)
        acc = _merge_round(acc, v4)
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while at + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[at : at + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M64
        at += 8
    if at + 4 <= n:
        acc ^= (int.from_bytes(data[at : at + 4], "little") * _P1) & _M64
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M64
        at += 4
    while at < n:
        acc ^= (data[at] * _P5) & _M64
        acc = (_rotl(acc, 11) * _P1) & _M64
        at += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


# --- XXH32 (r17): the 32-bit sibling, from the same published spec.
# Needed by the LZ4 FRAME format (`functions/lz4.py`): the frame
# header checksum, optional per-block checksums and the optional
# content checksum are all XXH32(seed 0). Pinned by the published
# empty-input vector (0x02CC5D05) and cross-implementation by
# lz4-java accepting/producing the same frame checksums
# (tests/test_codec_java_interop.py).

_Q1 = 0x9E3779B1
_Q2 = 0x85EBCA77
_Q3 = 0xC2B2AE3D
_Q4 = 0x27D4EB2F
_Q5 = 0x165667B1
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round32(acc: int, lane: int) -> int:
    acc = (acc + lane * _Q2) & _M32
    return (_rotl32(acc, 13) * _Q1) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 of ``data`` — the C ``xxhash`` module when available,
    else the spec's stripe/avalanche pipeline verbatim."""
    if _xxhash_c is not None:
        return _xxhash_c.xxh32_intdigest(data, seed)
    n = len(data)
    at = 0
    if n >= 16:
        v1 = (seed + _Q1 + _Q2) & _M32
        v2 = (seed + _Q2) & _M32
        v3 = seed & _M32
        v4 = (seed - _Q1) & _M32
        end = n - 16
        while at <= end:
            v1 = _round32(v1, int.from_bytes(data[at : at + 4], "little"))
            v2 = _round32(
                v2, int.from_bytes(data[at + 4 : at + 8], "little")
            )
            v3 = _round32(
                v3, int.from_bytes(data[at + 8 : at + 12], "little")
            )
            v4 = _round32(
                v4, int.from_bytes(data[at + 12 : at + 16], "little")
            )
            at += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7)
            + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _Q5) & _M32
    acc = (acc + n) & _M32
    while at + 4 <= n:
        acc = (
            acc + int.from_bytes(data[at : at + 4], "little") * _Q3
        ) & _M32
        acc = (_rotl32(acc, 17) * _Q4) & _M32
        at += 4
    while at < n:
        acc = (acc + data[at] * _Q5) & _M32
        acc = (_rotl32(acc, 11) * _Q1) & _M32
        at += 1
    acc ^= acc >> 15
    acc = (acc * _Q2) & _M32
    acc ^= acc >> 13
    acc = (acc * _Q3) & _M32
    acc ^= acc >> 16
    return acc


#: zstd frame magic (RFC 8878 §3.1.1)
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
#: Content_Checksum_flag in the Frame_Header_Descriptor
_FHD_CHECKSUM = 0x04


def zstd_compress_checksummed(data: bytes) -> bytes:
    """One zstd frame of ``data`` WITH its content checksum: pyarrow's
    bundled libzstd compresses, then the envelope is upgraded — the
    descriptor's Content_Checksum_flag set and ``XXH64(data) & 2³²−1``
    appended (RFC 8878 §3.1.1: the checksum field is the low 32 bits
    of the seed-0 XXH64 of the ORIGINAL content, little-endian, after
    the last block). Any conforming decoder verifies it; a flipped
    payload byte now errors in the codec instead of decoding silently
    into garbage."""
    import pyarrow as _pa

    frame = bytes(_pa.Codec("zstd").compress(data))
    if frame[:4] != _ZSTD_MAGIC:
        raise ValueError("libzstd emitted an unexpected frame prefix")
    fhd = frame[4]
    if fhd & _FHD_CHECKSUM:  # already checksummed — future-proof
        return frame
    return (
        frame[:4]
        + bytes([fhd | _FHD_CHECKSUM])
        + frame[5:]
        + (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    )
