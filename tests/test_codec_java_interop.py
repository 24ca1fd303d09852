"""Cross-implementation codec oracles on the Spark classpath (r17 —
the VERDICT item-2 pattern extended beyond Avro).

The container's JVM ships three independent implementations of the
codecs the repo wrote from spec: ``java.util.zip.CRC32C`` (JDK),
snappy-java (``org.xerial.snappy``) and zstd-jni
(``com.github.luben.zstd``). Pinning against them turns the
"self-consistent structural pin" posture into true
cross-implementation coverage — the same upgrade that caught the r16
Rabin-fingerprint drift."""

from __future__ import annotations

import pytest


def _jclass(spark, name: str):
    try:
        spark._jvm.java.lang.Class.forName(name)
    except Exception:  # pragma: no cover - only off-container
        pytest.skip(f"{name} not on the Spark classpath")
    return spark._jvm


_VECTORS = [
    b"",
    b"a",
    b'"int"',
    b"123456789",
    bytes(range(256)),
    b"the quick brown fox jumps over the lazy dog" * 40,
    b"\x00" * 1000,
]


def test_crc32c_matches_jdk(spark):
    """The from-spec Castagnoli CRC (``functions/snappy.py:crc32c``)
    equals ``java.util.zip.CRC32C`` on every vector."""
    from timeseries_db_spark.functions.snappy import crc32c

    jvm = _jclass(spark, "java.util.zip.CRC32C")
    for v in _VECTORS:
        j = jvm.java.util.zip.CRC32C()
        j.update(v, 0, len(v))
        assert crc32c(v) == j.getValue() & 0xFFFFFFFF, v[:16]


def test_snappy_raw_blocks_match_snappy_java(spark):
    """Raw snappy blocks interop with snappy-java in BOTH directions:
    repo-compressed blocks uncompress byte-identically in Java, and
    Java-compressed blocks decode through the from-spec walker."""
    from timeseries_db_spark.functions.snappy import (
        snappy_compress,
        snappy_decompress,
    )

    jvm = _jclass(spark, "org.xerial.snappy.Snappy")
    S = jvm.org.xerial.snappy.Snappy
    payloads = [
        b"",
        b"snappy interop body " * 200,  # compressible (copies)
        bytes((i * 131) % 256 for i in range(5000)),  # literal-heavy
    ]
    for p in payloads:
        assert bytes(S.uncompress(snappy_compress(p))) == p
        assert snappy_decompress(bytes(S.compress(p))) == p


def test_zstd_checksummed_frames_match_zstd_jni(spark):
    """First-party checksummed zstd frames (r16: RFC 8878 envelope +
    from-spec XXH64 low-32) decompress through zstd-jni — which
    verifies the content checksum natively — and a flipped payload
    byte makes the SAME Java call fail instead of returning data."""
    from timeseries_db_spark.functions.xxh import (
        zstd_compress_checksummed,
    )

    jvm = _jclass(spark, "com.github.luben.zstd.Zstd")
    Z = jvm.com.github.luben.zstd.Zstd
    body = b"zstd interop body, checksummed " * 300
    frame = zstd_compress_checksummed(body)
    got = bytes(Z.decompress(frame, len(body)))
    assert got == body
    # Java must also SEE the checksum flag — round-trip a Java frame
    # through libzstd here is already covered; flip a byte and the
    # jni call must raise (loud, not wrong bytes)
    bad = bytearray(frame)
    bad[len(bad) // 2] ^= 0x01
    with pytest.raises(Exception):
        Z.decompress(bytes(bad), len(body))


def _drain(jvm, in_stream) -> bytes:
    """All bytes of a Java InputStream (py4j copies arrays by value,
    so the read(byte[]) idiom can't work — commons-io drains
    JVM-side)."""
    return bytes(
        jvm.org.apache.commons.io.IOUtils.toByteArray(in_stream)
    )


def test_lz4_frames_match_lz4_java(spark):
    """r17: the from-spec LZ4 frame codec (`functions/lz4.py`)
    interops with lz4-java in BOTH directions — Java-compressed
    frames (real match sequences) decode here, and the first-party
    literal-only frames decode there — and the XXH32 frame checksums
    agree implicitly (either side rejects a drifted checksum)."""
    from timeseries_db_spark.functions.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    jvm = _jclass(spark, "net.jpountz.lz4.LZ4FrameOutputStream")
    for body in (
        b"",
        b"lz4 interop body " * 3000,  # compressible: real sequences
        bytes((i * 131) % 256 for i in range(100_000)),  # literal-heavy
    ):
        bos = jvm.java.io.ByteArrayOutputStream()
        fos = jvm.net.jpountz.lz4.LZ4FrameOutputStream(bos)
        fos.write(body)
        fos.close()
        assert lz4_frame_decompress(bytes(bos.toByteArray())) == body
        fis = jvm.net.jpountz.lz4.LZ4FrameInputStream(
            jvm.java.io.ByteArrayInputStream(lz4_frame_compress(body))
        )
        assert _drain(jvm, fis) == body


def test_snappy_java_stream_matches_snappy_java(spark):
    """r17: the snappy-java STREAM format (what Kafka snappy batches
    carry — `sources/kafka_log.py`) round-trips against
    SnappyOutputStream/SnappyInputStream in both directions,
    multi-chunk included."""
    from timeseries_db_spark.sources.kafka_log import (
        snappy_java_stream_compress,
        snappy_java_stream_decompress,
    )

    jvm = _jclass(spark, "org.xerial.snappy.SnappyOutputStream")
    body = b"kafka snappy-java stream interop " * 4000  # multi-chunk
    bos = jvm.java.io.ByteArrayOutputStream()
    sos = jvm.org.xerial.snappy.SnappyOutputStream(bos)
    sos.write(body)
    sos.close()
    assert snappy_java_stream_decompress(bytes(bos.toByteArray())) == body
    sis = jvm.org.xerial.snappy.SnappyInputStream(
        jvm.java.io.ByteArrayInputStream(
            snappy_java_stream_compress(body)
        )
    )
    assert _drain(jvm, sis) == body


def test_xxh64_matches_zstd_jni_checksum_path(spark):
    """XXH64 (``functions/xxh.py``) agrees with the checksum zstd-jni
    embeds: a zstd-jni-COMPRESSED frame with checksum enabled carries
    the low-32 of XXH64(seed 0) of the payload — decode the frame
    header here and compare against the from-spec hash."""
    from timeseries_db_spark.functions.xxh import xxh64

    jvm = _jclass(spark, "com.github.luben.zstd.ZstdCompressCtx")
    ctx = jvm.com.github.luben.zstd.ZstdCompressCtx()
    ctx.setChecksum(True)
    body = b"xxh64 checksum agreement " * 137
    frame = bytes(ctx.compress(body))
    # RFC 8878: the content checksum is the LAST 4 bytes of the frame
    # (little-endian low-32 of XXH64-seed-0 of the original content)
    tail = int.from_bytes(frame[-4:], "little")
    assert tail == xxh64(body) & 0xFFFFFFFF
