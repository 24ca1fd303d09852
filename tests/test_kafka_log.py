"""Kafka log-segment decode (r17) — ``sources/kafka_log.py``.

Layout pins are structural + first-party roundtrip (no kafka-clients
jar on this container's classpath — verified, and stated in the module
docstring); the CRC-32C covering every batch is itself cross-pinned
against the JDK, so foreign-segment layout drift quarantines loudly
rather than decoding wrongly. The compression layer IS
cross-implementation-pinned (snappy-java stream / LZ4 frame tests in
test_codec_java_interop.py)."""

from __future__ import annotations

import pytest

from timeseries_db_spark.sources import avro as AV
from timeseries_db_spark.sources import kafka_log as K

_CODECS = ["none", "gzip", "snappy", "lz4", "zstd"]


@pytest.mark.parametrize("codec", _CODECS)
def test_segment_roundtrip_all_codecs(codec):
    """Build → scan roundtrip under every protocol codec, with null
    values (tombstones) and null keys preserved."""
    msgs = [
        (
            None if i % 7 == 0 else f"k{i}".encode(),
            None if i % 5 == 0 else f"value {i}".encode(),
        )
        for i in range(120)
    ]
    seg = K.kafka_log_build(msgs, compression=codec, batch_records=37)
    recs, errs = K.kafka_log_scan(seg)
    assert not errs
    assert [r["offset"] for r in recs] == list(range(120))
    assert recs[3]["key"] == b"k3" and recs[7]["value"] == b"value 7"
    assert recs[0]["key"] is None and recs[5]["value"] is None


def test_segment_crc_quarantine_and_resync():
    """A flipped byte fails the batch CRC; under strict=False exactly
    that batch is lost (one error) and the later batches decode via
    the CRC-verified resync. A junk prefix prices one error too."""
    msgs = [(b"k", f"v{i}".encode()) for i in range(100)]
    seg = bytearray(K.kafka_log_build(msgs, batch_records=50))
    seg[70] ^= 0x01  # inside batch 0's records
    recs, errs = K.kafka_log_scan(bytes(seg), strict=False)
    assert len(errs) == 1 and "CRC-32C mismatch" in errs[0]
    assert [r["offset"] for r in recs] == list(range(50, 100))
    with pytest.raises(ValueError, match="CRC-32C mismatch"):
        K.kafka_log_scan(bytes(seg))
    recs, errs = K.kafka_log_scan(
        b"\x02garbage\x02" + K.kafka_log_build(msgs[:50]), strict=False
    )
    assert len(errs) == 1 and len(recs) == 50


def test_control_batch_skipped():
    """A batch with the control bit set (transaction markers) is
    skipped whole, as consumers do — its records are not data."""
    seg = bytearray(K.kafka_log_build([(b"k", b"marker")]))
    # set attributes bit 5 (control); CRC must be recomputed
    from timeseries_db_spark.functions.snappy import crc32c

    attrs_at = 21
    attrs = int.from_bytes(seg[attrs_at : attrs_at + 2], "big") | 0x20
    seg[attrs_at : attrs_at + 2] = attrs.to_bytes(2, "big")
    end = 12 + int.from_bytes(seg[8:12], "big")
    seg[17:21] = crc32c(bytes(seg[21:end])).to_bytes(4, "big")
    recs, errs = K.kafka_log_scan(bytes(seg))
    assert recs == [] and errs == []


def test_read_kafka_segments_spark_kernel(spark, tmp_path):
    """The binaryFile kernel: per-file decode, one quarantine row per
    damaged batch, siblings publish."""
    d = tmp_path / "logs"
    d.mkdir()
    msgs = [(str(i).encode(), f"v {i}".encode()) for i in range(60)]
    (d / "00000000.log").write_bytes(
        K.kafka_log_build(msgs[:30], compression="gzip")
    )
    bad = bytearray(
        K.kafka_log_build(msgs[30:], base_offset=30, compression="none",
                          batch_records=15)
    )
    bad[70] ^= 0x01
    (d / "00000030.log").write_bytes(bytes(bad))
    got = K.read_kafka_segments(spark, str(d)).collect()
    clean = sorted(
        r["offset"] for r in got if r["_corrupt"] is None
    )
    assert clean == list(range(30)) + list(range(45, 60))
    assert sum(1 for r in got if r["_corrupt"] is not None) == 1


def test_read_kafka_avro_corpus_confluent_chain(spark, tmp_path):
    """The full chain: lz4-compressed segments whose values are
    Confluent-framed under two producer schema versions, decoded to
    evolved rows under the pinned v2 reader; a damaged batch and an
    unknown-id value each price one quarantine row; tombstones are
    skipped."""
    reg = {7: AV.CORPUS_V1_AVRO_SCHEMA, 9: AV.CORPUS_V2_READER_SCHEMA}

    def val(i: int) -> bytes:
        if i % 2 == 0:
            return AV.confluent_encode(
                [{"doc_id": i, "body": f"kb {i}", "score": 2 * i,
                  "legacy_blob": b""}],
                AV.CORPUS_V1_AVRO_SCHEMA, 7,
            )
        return AV.confluent_encode(
            [{"doc_id": i, "text": f"kn {i}", "score": 3 * i,
              "lang": "en"}],
            AV.CORPUS_V2_READER_SCHEMA, 9,
        )

    msgs = [(str(i).encode(), val(i)) for i in range(40)]
    msgs.append((b"tomb", None))
    msgs.append(
        (b"alien", AV.confluent_encode(
            [{"doc_id": 99, "text": "x", "score": 1, "lang": "a"}],
            AV.CORPUS_V2_READER_SCHEMA, 999,
        ))
    )
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_bytes(
        K.kafka_log_build(msgs, compression="lz4", batch_records=20)
    )
    (d / "junk.log").write_bytes(b"not a segment at all")
    got = K.read_kafka_avro_corpus(
        spark, str(d), registry=reg,
        reader_schema=AV.CORPUS_V2_READER_SCHEMA,
    ).collect()
    rows = {
        r["doc_id"]: (r["text"], r["score"], r["lang"])
        for r in got
        if r["_corrupt"] is None
    }
    assert len(rows) == 40
    assert rows[4] == ("kb 4", 8, "und")  # v1: alias + promote + default
    assert rows[7] == ("kn 7", 21, "en")
    bad = [r["_corrupt"] for r in got if r["_corrupt"] is not None]
    assert len(bad) == 2  # junk segment + unknown-id value
    assert any("999 not in registry" in b for b in bad)

    # single-object framing variant through the same chain
    so_msgs = [
        (None, AV.single_object_encode(
            [{"doc_id": i, "text": f"so {i}"}], AV.CORPUS_AVRO_SCHEMA
        ))
        for i in range(10)
    ]
    d2 = tmp_path / "so_logs"
    d2.mkdir()
    (d2 / "a.log").write_bytes(
        K.kafka_log_build(so_msgs, compression="snappy")
    )
    got = K.read_kafka_avro_corpus(
        spark, str(d2), schemas=[AV.CORPUS_AVRO_SCHEMA]
    ).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(10))
    with pytest.raises(ValueError, match="exactly one"):
        K.read_kafka_avro_corpus(spark, str(d2))
