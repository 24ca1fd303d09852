"""LZ4 from the published specification (r17): block format +
frame format, decode-first.

Why here: LZ4 is one of the four compression types a Kafka record
batch can carry (attributes bits: none/gzip/snappy/lz4/zstd —
``sources/kafka_log.py``), and the only one of the four this repo
could not decode. The implementation is from the public format
specifications (github.com/lz4/lz4: ``lz4_Block_format.md`` and
``lz4_Frame_format.md``); the container ships a REAL
cross-implementation oracle — ``lz4-java-1.8.0.jar`` on Spark's own
classpath (``net.jpountz.lz4``) — and
``tests/test_codec_java_interop.py`` pins both directions against it
(the r17 house rule: verify the classpath before claiming no oracle
exists).

Integrity posture: the frame header carries an XXH32 header checksum
(verified before the descriptor is trusted), blocks may carry XXH32
block checksums (verified BEFORE bytes are trusted), and the frame
may carry an XXH32 content checksum (verified after the last block) —
all from ``functions/xxh.py:xxh32``. First-party frames emit the
content checksum, so a flipped byte errors in the codec.

Scale posture: same story as the other from-spec kernels (SCALE.md,
"Pure-Python codec throughput") — this is the spec pin and the
low-volume tail path; the decode runs inside the existing
Arrow-batched per-file kernels, and a deployment that ingests LZ4 at
volume ships the C ``lz4`` module (same dispatch-with-cross-check
pattern as ``snappy``/``xxhash``/``crc32c``; the module is absent in
this container, so dispatch is left to a deployment follow-up rather
than dead code here).
"""

from __future__ import annotations

from timeseries_db_spark.functions.xxh import xxh32

#: LZ4 frame magic number (little-endian on the wire)
LZ4F_MAGIC = b"\x04\x22\x4d\x18"

_FLG_VERSION_MASK = 0xC0
_FLG_VERSION_01 = 0x40
_FLG_B_INDEP = 0x20
_FLG_B_CHECKSUM = 0x10
_FLG_C_SIZE = 0x08
_FLG_C_CHECKSUM = 0x04
_FLG_DICT_ID = 0x01


def lz4_block_decompress(
    src: bytes, prefix: bytes = b"", max_out: int | None = None
) -> bytes:
    """One LZ4 BLOCK (the raw sequence stream, no framing) decoded
    per ``lz4_Block_format.md``: token (literal-length nibble /
    match-length nibble), 255-continued length extensions, 2-byte
    little-endian match offsets, overlap-capable match copy. Matches
    may reach back into ``prefix`` (the previous blocks' tail — the
    frame format's block-DEPENDENT mode). Raises ``ValueError`` on
    any malformed shape: truncated literals, zero/overreaching
    offsets, a match in the final sequence position, or output beyond
    ``max_out`` (the frame's declared block maximum — the
    decompression-bomb guard)."""
    out = bytearray(prefix)
    plen = len(prefix)
    at = 0
    n = len(src)
    if n == 0:
        raise ValueError("lz4 block: empty input")
    while at < n:
        token = src[at]
        at += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if at >= n:
                    raise ValueError("lz4 block: truncated literal length")
                b = src[at]
                at += 1
                lit += b
                if b != 255:
                    break
        if at + lit > n:
            raise ValueError("lz4 block: literals overrun input")
        out += src[at : at + lit]
        at += lit
        if max_out is not None and len(out) - plen > max_out:
            raise ValueError("lz4 block: output exceeds declared maximum")
        if at == n:
            break  # last sequence carries literals only (spec EndMark)
        if at + 2 > n:
            raise ValueError("lz4 block: truncated match offset")
        offset = src[at] | (src[at + 1] << 8)
        at += 2
        if offset == 0:
            raise ValueError("lz4 block: zero match offset")
        ml = token & 0x0F
        if ml == 15:
            while True:
                if at >= n:
                    raise ValueError("lz4 block: truncated match length")
                b = src[at]
                at += 1
                ml += b
                if b != 255:
                    break
        ml += 4  # minmatch
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4 block: match offset before window")
        if offset >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: byte-wise copy semantics
            for i in range(ml):
                out.append(out[start + i])
        if max_out is not None and len(out) - plen > max_out:
            raise ValueError("lz4 block: output exceeds declared maximum")
    return bytes(out[plen:])


#: BD-byte block-maximum table (indices 4..7 are defined)
_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_decompress(data: bytes) -> bytes:
    """One LZ4 FRAME decoded per ``lz4_Frame_format.md``: magic,
    descriptor (version 01; block-independence, block-checksum,
    content-size, content-checksum, dict-id flags), XXH32 header
    checksum VERIFIED before the descriptor is trusted, data blocks
    (high-bit size = stored uncompressed; optional per-block XXH32
    verified before bytes are trusted; block-dependent matches reach
    the previous 64 KiB of output), EndMark, optional content XXH32.
    Skippable frames (magic 0x184D2A5x) are skipped. Concatenated
    frames decode in sequence. Raises ``ValueError`` on any
    corruption."""
    out = bytearray()
    at = 0
    n = len(data)
    while at < n:
        if at + 4 > n:
            raise ValueError("lz4 frame: truncated magic")
        magic = data[at : at + 4]
        if magic[1:4] == b"\x2a\x4d\x18" and 0x50 <= magic[0] <= 0x5F:
            # skippable frame: 4-byte LE size + payload, skipped
            if at + 8 > n:
                raise ValueError("lz4 frame: truncated skippable header")
            sz = int.from_bytes(data[at + 4 : at + 8], "little")
            at += 8 + sz
            if at > n:
                raise ValueError("lz4 frame: skippable frame overruns")
            continue
        if magic != LZ4F_MAGIC:
            raise ValueError("lz4 frame: bad magic")
        at += 4
        desc_start = at
        if at >= n:
            raise ValueError("lz4 frame: truncated descriptor")
        flg = data[at]
        at += 1
        if flg & _FLG_VERSION_MASK != _FLG_VERSION_01:
            raise ValueError("lz4 frame: unsupported version")
        if flg & 0x02:
            raise ValueError("lz4 frame: reserved FLG bit set")
        if at >= n:
            raise ValueError("lz4 frame: truncated BD byte")
        bd = data[at]
        at += 1
        if bd & 0x8F:
            raise ValueError("lz4 frame: reserved BD bits set")
        bmax_code = (bd >> 4) & 0x07
        if bmax_code not in _BLOCK_MAX:
            raise ValueError("lz4 frame: invalid block maximum")
        bmax = _BLOCK_MAX[bmax_code]
        if flg & _FLG_C_SIZE:
            at += 8
        if flg & _FLG_DICT_ID:
            at += 4
        if at >= n:
            raise ValueError("lz4 frame: truncated descriptor")
        hc = data[at]
        want = (xxh32(data[desc_start:at]) >> 8) & 0xFF
        if hc != want:
            raise ValueError("lz4 frame: header checksum mismatch")
        at += 1
        frame_out_start = len(out)
        while True:
            if at + 4 > n:
                raise ValueError("lz4 frame: truncated block size")
            bsize = int.from_bytes(data[at : at + 4], "little")
            at += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > bmax:
                raise ValueError("lz4 frame: block exceeds declared max")
            if at + bsize > n:
                raise ValueError("lz4 frame: truncated block")
            block = data[at : at + bsize]
            at += bsize
            if flg & _FLG_B_CHECKSUM:
                if at + 4 > n:
                    raise ValueError("lz4 frame: truncated block checksum")
                if xxh32(block) != int.from_bytes(
                    data[at : at + 4], "little"
                ):
                    raise ValueError("lz4 frame: block checksum mismatch")
                at += 4
            if stored:
                out += block
            else:
                prefix = b""
                if not flg & _FLG_B_INDEP:
                    # dependent blocks see the previous 64 KiB
                    prefix = bytes(
                        out[max(frame_out_start, len(out) - 65536):]
                    )
                out += lz4_block_decompress(
                    block, prefix=prefix, max_out=bmax
                )
        if flg & _FLG_C_CHECKSUM:
            if at + 4 > n:
                raise ValueError("lz4 frame: truncated content checksum")
            if xxh32(bytes(out[frame_out_start:])) != int.from_bytes(
                data[at : at + 4], "little"
            ):
                raise ValueError("lz4 frame: content checksum mismatch")
            at += 4
    return bytes(out)


def lz4_frame_compress(data: bytes, block_max_code: int = 4) -> bytes:
    """One spec-valid LZ4 frame of ``data`` — first-party writer.
    Blocks are emitted as literal-only sequences (a degenerate but
    fully conforming compressed stream: any decoder, including
    lz4-java and the C library, reads it; ratio ~1.0 — first-party
    shards that need real compression use gzip/zstd, this writer
    exists for fixtures and interop). Block-independent, with the
    content checksum SET (the house integrity posture: flips error in
    the codec)."""
    if block_max_code not in _BLOCK_MAX:
        raise ValueError("lz4 frame: invalid block maximum code")
    bmax = _BLOCK_MAX[block_max_code]
    flg = _FLG_VERSION_01 | _FLG_B_INDEP | _FLG_C_CHECKSUM
    bd = block_max_code << 4
    desc = bytes([flg, bd])
    out = bytearray(LZ4F_MAGIC + desc)
    out.append((xxh32(desc) >> 8) & 0xFF)
    # a literal-only COMPRESSED block carries token+extension overhead
    # (~1 byte per 255 literals), and Block_Size may never exceed the
    # declared maximum — chunk under it so the overhead always fits
    step = bmax - bmax // 255 - 24
    for at in range(0, len(data), step) or [0]:
        chunk = data[at : at + step]
        if not chunk:
            break
        # literal-only sequence(s): token 15 + 255-continued extension
        block = bytearray()
        lit = len(chunk)
        if lit < 15:
            block.append(lit << 4)
        else:
            block.append(0xF0)
            rem = lit - 15
            while rem >= 255:
                block.append(255)
                rem -= 255
            block.append(rem)
        block += chunk
        if len(block) < len(chunk):  # impossible, defensive
            raise ValueError("lz4 frame: writer invariant")
        out += len(block).to_bytes(4, "little")
        out += block
    out += (0).to_bytes(4, "little")  # EndMark
    out += (xxh32(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
