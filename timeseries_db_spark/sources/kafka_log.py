"""Kafka log-segment decode (r17): the ``.log`` files a Kafka-archive
bucket ACTUALLY contains.

The r16/r17 Kafka-adjacent surface decoded the per-message framings —
Avro single-object (``C3 01`` + fingerprint) and Confluent wire
(``0x00`` + schema id) — but a topic archived straight from the
broker's data directory arrives as SEGMENT files: a sequence of
RecordBatch structures (message format v2, magic=2), each carrying a
CRC-32C, an optionally-compressed records section, and varint-packed
records with key/value/headers. This module completes the chain:

    .log segment → RecordBatch v2 walk (CRC-verified) → records →
    value bytes → Confluent / single-object framing → schema registry
    → evolved rows

Provenance (house discipline, stated honestly): the batch LAYOUT is
from the public Kafka protocol documentation (kafka.apache.org,
"Record Batch" / KIP-98); **no kafka-clients jar ships on this
container's classpath** (verified by listing ``pyspark/jars`` — the
r17 rule is to CHECK, not assume), so the layout pin is structural +
first-party roundtrip. The failure mode of any layout drift is LOUD,
not silent: every batch is covered by its CRC-32C (itself
cross-pinned against ``java.util.zip.CRC32C``), so a misparsed
foreign segment quarantines with a CRC mismatch — it cannot decode
into wrong records. The COMPRESSION layer, by contrast, is fully
cross-implementation-pinned: gzip (zlib), snappy-java stream format
(oracle: ``org.xerial.snappy.SnappyOutputStream`` on the classpath),
LZ4 frame (oracle: lz4-java), zstd (oracle: zstd-jni/libzstd).

Scale posture: segments decode per file inside the standard
Arrow-batched ``binaryFile`` kernel (map-only, plan-asserted like the
other arrival readers); damage is priced per BATCH (resync scans for
the next CRC-verifying batch header — false positives are defeated by
the CRC itself), and the quarantine contract matches the other
arrival units: one ``_corrupt`` row per damaged batch, siblings
publish.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from timeseries_db_spark.functions.snappy import (
    crc32c,
    snappy_compress,
    snappy_decompress,
)
from timeseries_db_spark.sources.avro import _zigzag_decode, _zigzag_encode

#: RecordBatch v2 magic byte and its offset inside a batch
_MAGIC_V2 = 2
_MAGIC_AT = 16  # baseOffset(8) + batchLength(4) + partitionLeaderEpoch(4)
#: header bytes from baseOffset through recordCount (fixed-width part)
_HEADER_LEN = 61
#: attributes bits 0-2: compression codec ids (Kafka protocol)
_CODECS = {0: "none", 1: "gzip", 2: "snappy", 3: "lz4", 4: "zstd"}

#: snappy-java STREAM format header (what Kafka's snappy batches use —
#: NOT the ".sz" framing format): magic + version + compat-version
_SNAPPY_JAVA_MAGIC = b"\x82SNAPPY\x00"


def snappy_java_stream_compress(data: bytes, chunk: int = 32768) -> bytes:
    """The snappy-java stream format: 8-byte magic, two int32-BE
    version fields, then [int32-BE block length + raw snappy block]
    per chunk — the shape ``SnappyOutputStream`` writes and Kafka's
    snappy-compressed batches carry. Cross-pinned against snappy-java
    itself (tests/test_codec_java_interop.py)."""
    out = bytearray(_SNAPPY_JAVA_MAGIC)
    out += (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    for at in range(0, len(data), chunk):
        block = snappy_compress(data[at : at + chunk])
        out += len(block).to_bytes(4, "big") + block
    return bytes(out)


def snappy_java_stream_decompress(data: bytes) -> bytes:
    """Inverse of :func:`snappy_java_stream_compress` — raw snappy
    blocks verified by their own format walk (the r16 from-spec
    decoder); truncation or garbage raises ``ValueError``."""
    if data[:8] != _SNAPPY_JAVA_MAGIC:
        raise ValueError("snappy-java stream: bad magic")
    at = 16  # magic + version + minCompatibleVersion
    if len(data) < at:
        raise ValueError("snappy-java stream: truncated header")
    out = bytearray()
    n = len(data)
    while at < n:
        if at + 4 > n:
            raise ValueError("snappy-java stream: truncated block length")
        blen = int.from_bytes(data[at : at + 4], "big")
        at += 4
        if at + blen > n:
            raise ValueError("snappy-java stream: truncated block")
        out += snappy_decompress(data[at : at + blen])
        at += blen
    return bytes(out)


def _decompress_records(codec: str, payload: bytes) -> bytes:
    if codec == "none":
        return payload
    if codec == "gzip":
        import zlib

        return zlib.decompress(payload, 16 + 15)
    if codec == "snappy":
        return snappy_java_stream_decompress(payload)
    if codec == "lz4":
        from timeseries_db_spark.functions.lz4 import lz4_frame_decompress

        return lz4_frame_decompress(payload)
    if codec == "zstd":
        import pyarrow as _pa

        try:
            return _pa.input_stream(
                _pa.py_buffer(payload), compression="zstd"
            ).read()
        except OSError as e:
            raise ValueError(f"kafka zstd records: {e}") from e
    raise ValueError(f"kafka batch: unsupported codec id ({codec})")


def _compress_records(codec: str, payload: bytes) -> bytes:
    if codec == "none":
        return payload
    if codec == "gzip":
        import zlib

        co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
        return co.compress(payload) + co.flush()
    if codec == "snappy":
        return snappy_java_stream_compress(payload)
    if codec == "lz4":
        from timeseries_db_spark.functions.lz4 import lz4_frame_compress

        return lz4_frame_compress(payload)
    if codec == "zstd":
        from timeseries_db_spark.functions.xxh import (
            zstd_compress_checksummed,
        )

        return zstd_compress_checksummed(payload)
    raise ValueError(f"kafka batch: unsupported codec {codec!r}")


def _decode_bytes_field(b: bytes, at: int) -> tuple[bytes | None, int]:
    ln, at = _zigzag_decode(b, at)
    if ln == -1:
        return None, at
    if ln < 0 or at + ln > len(b):
        raise ValueError("kafka record: bytes field overruns")
    return b[at : at + ln], at + ln


def kafka_log_build(
    messages: list[tuple[bytes | None, bytes | None]],
    base_offset: int = 0,
    base_timestamp: int = 1_700_000_000_000,
    compression: str = "none",
    batch_records: int = 50,
) -> bytes:
    """A first-party ``.log`` segment: RecordBatch v2 structures of up
    to ``batch_records`` (key, value) messages each, records section
    compressed per ``compression`` (none/gzip/snappy/lz4/zstd — the
    protocol's full codec set), CRC-32C computed over
    attributes..end exactly as the broker does."""
    codec_id = {v: k for k, v in _CODECS.items()}[compression]
    out = bytearray()
    off = base_offset
    for at0 in range(0, len(messages), batch_records):
        chunk = messages[at0 : at0 + batch_records]
        body = bytearray()
        for i, (key, value) in enumerate(chunk):
            rec = bytearray()
            rec += b"\x00"  # record attributes (unused by the protocol)
            rec += _zigzag_encode(i)  # timestampDelta
            rec += _zigzag_encode(i)  # offsetDelta
            for field in (key, value):
                if field is None:
                    rec += _zigzag_encode(-1)
                else:
                    rec += _zigzag_encode(len(field)) + field
            rec += _zigzag_encode(0)  # headers
            body += _zigzag_encode(len(rec)) + rec
        records = _compress_records(compression, bytes(body))
        tail = bytearray()
        tail += codec_id.to_bytes(2, "big")  # attributes
        tail += (len(chunk) - 1).to_bytes(4, "big")  # lastOffsetDelta
        tail += (base_timestamp + at0).to_bytes(8, "big")  # baseTimestamp
        tail += (base_timestamp + at0 + len(chunk) - 1).to_bytes(8, "big")
        tail += (-1 & ((1 << 64) - 1)).to_bytes(8, "big")  # producerId -1
        tail += (-1 & 0xFFFF).to_bytes(2, "big")  # producerEpoch -1
        tail += (-1 & 0xFFFFFFFF).to_bytes(4, "big")  # baseSequence -1
        tail += len(chunk).to_bytes(4, "big")  # recordCount
        tail += records
        crc = crc32c(bytes(tail))
        batch = bytearray()
        batch += off.to_bytes(8, "big")  # baseOffset
        # batchLength counts everything after itself:
        # partitionLeaderEpoch(4) + magic(1) + crc(4) + tail
        batch += (4 + 1 + 4 + len(tail)).to_bytes(4, "big")
        batch += (-1 & 0xFFFFFFFF).to_bytes(4, "big")  # leaderEpoch -1
        batch += bytes([_MAGIC_V2])
        batch += crc.to_bytes(4, "big")
        batch += tail
        out += batch
        off += len(chunk)
    return bytes(out)


def kafka_log_scan(
    payload: bytes, strict: bool = True
) -> tuple[list[dict], list[str]]:
    """(records, errors) of one segment. Each record is
    ``{"offset", "timestamp", "key", "value"}`` (key/value bytes or
    None). A batch whose CRC-32C fails, whose codec is unknown, or
    whose records section is malformed prices ONE error and the walk
    RESYNCS at the next position whose batch header both carries
    magic=2 AND CRC-verifies — the CRC is the real framing here, so a
    coincidental magic byte cannot fork the walk into garbage.
    ``strict=True`` raises instead. Control batches (attributes bit 5)
    are skipped whole, as consumers do."""
    records: list[dict] = []
    errs: list[str] = []
    at = 0
    n = len(payload)

    def parse_batch(at: int) -> tuple[list[dict], int]:
        if at + _HEADER_LEN > n:
            raise ValueError("kafka batch: truncated header")
        base_offset = int.from_bytes(payload[at : at + 8], "big")
        batch_len = int.from_bytes(payload[at + 8 : at + 12], "big")
        end = at + 12 + batch_len
        if batch_len < _HEADER_LEN - 12 or end > n:
            raise ValueError("kafka batch: length field out of bounds")
        if payload[at + _MAGIC_AT] != _MAGIC_V2:
            raise ValueError(
                f"kafka batch: magic {payload[at + _MAGIC_AT]}"
                " unsupported (v2 only)"
            )
        crc = int.from_bytes(payload[at + 17 : at + 21], "big")
        if crc32c(payload[at + 21 : end]) != crc:
            raise ValueError("kafka batch: CRC-32C mismatch")
        attrs = int.from_bytes(payload[at + 21 : at + 23], "big")
        base_ts = int.from_bytes(payload[at + 27 : at + 35], "big")
        count = int.from_bytes(payload[at + 57 : at + 61], "big")
        if attrs & 0x20:  # control batch: markers, not data
            return [], end
        codec = _CODECS.get(attrs & 0x07)
        if codec is None:
            raise ValueError(
                f"kafka batch: unsupported codec id ({attrs & 0x07})"
            )
        body = _decompress_records(codec, payload[at + 61 : end])
        out = []
        p = 0
        for _ in range(count):
            rlen, p = _zigzag_decode(body, p)
            rend = p + rlen
            if rlen < 0 or rend > len(body):
                raise ValueError("kafka record: length overruns batch")
            p += 1  # record attributes byte
            ts_delta, p = _zigzag_decode(body, p)
            off_delta, p = _zigzag_decode(body, p)
            key, p = _decode_bytes_field(body, p)
            value, p = _decode_bytes_field(body, p)
            n_headers, p = _zigzag_decode(body, p)
            if n_headers < 0:
                raise ValueError("kafka record: negative header count")
            for _h in range(n_headers):
                _hk, p = _decode_bytes_field(body, p)
                _hv, p = _decode_bytes_field(body, p)
            if p != rend:
                raise ValueError("kafka record: trailing bytes in record")
            out.append(
                {
                    "offset": base_offset + off_delta,
                    "timestamp": base_ts + ts_delta,
                    "key": key,
                    "value": value,
                }
            )
        if p != len(body):
            raise ValueError("kafka batch: trailing bytes after records")
        return out, end

    def resync(frm: int) -> int:
        """Next position whose batch parses with a VERIFIED CRC."""
        c = frm
        while True:
            c = payload.find(bytes([_MAGIC_V2]), c)
            if c == -1 or c < _MAGIC_AT:
                if c == -1:
                    return -1
                c += 1
                continue
            cand = c - _MAGIC_AT
            try:
                parse_batch(cand)
                return cand
            except (ValueError, KeyError, IndexError, OverflowError):
                c += 1

    while at < n:
        try:
            batch_recs, at = parse_batch(at)
            records.extend(batch_recs)
        except (
            ValueError, KeyError, IndexError, OverflowError, TypeError,
        ) as e:
            if strict:
                raise ValueError(str(e)) from e
            errs.append(str(e))
            nxt = resync(at + 1)
            if nxt == -1:
                break
            at = nxt
    return records, errs


def read_kafka_segments(
    spark: SparkSession, path: str, glob: str = "*.log"
) -> DataFrame:
    """(offset, timestamp, key, value, _corrupt) from a directory of
    Kafka segment files — the standard per-file Arrow kernel, one
    quarantine row per damaged batch (CRC / codec / record shape),
    siblings decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for content in pdf["content"]:
                recs, errs = kafka_log_scan(bytes(content), strict=False)
                for msg in errs:
                    rows.append((None, None, None, None, msg))
                for r in recs:
                    rows.append(
                        (r["offset"], r["timestamp"], r["key"],
                         r["value"], None)
                    )
            yield pd.DataFrame(
                rows,
                columns=["offset", "timestamp", "key", "value",
                         "_corrupt"],
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
        .mapInPandas(
            gen,
            schema="offset long, timestamp long, key binary,"
            " value binary, _corrupt string",
        )
    )


def read_kafka_avro_corpus(
    spark: SparkSession,
    path: str,
    schemas: list[dict] | None = None,
    registry: dict[int, dict] | None = None,
    reader_schema: dict | None = None,
    glob: str = "*.log",
) -> DataFrame:
    """The full chain: segment files → CRC-verified batches → record
    VALUES → per-message Avro framing → evolved rows. Framing is
    chosen by which registry is given: ``registry`` (id → schema)
    decodes Confluent-framed values, ``schemas`` (list) decodes
    single-object-framed values — exactly one must be provided. Each
    value must hold ONE framed message (the Kafka contract: one
    message per record); trailing bytes price that record as corrupt.
    Damage at every layer lands in ``_corrupt``: batch-level rows from
    the segment walk, message-level rows from the framing decode."""
    from timeseries_db_spark.sources import avro as AV

    if (schemas is None) == (registry is None):
        raise ValueError(
            "exactly one of schemas/registry selects the framing"
        )
    rs = reader_schema
    if rs is None:
        rs = schemas[-1] if schemas else registry[max(registry)]
    rres = AV._resolve_named_types(rs, {})
    names = [f["name"] for f in rres["fields"]]

    def decode_value(v: bytes) -> tuple[dict | None, str | None]:
        if registry is not None:
            recs, errs = AV.confluent_scan(
                v, registry, reader_schema=reader_schema, strict=False
            )
        else:
            recs, errs = AV.single_object_scan(
                v, schemas, reader_schema=reader_schema, strict=False
            )
        if errs:
            return None, errs[0]
        if len(recs) != 1:
            return None, (
                f"kafka value holds {len(recs)} framed messages"
                " (expected exactly 1)"
            )
        return recs[0], None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for content in pdf["content"]:
                recs, errs = kafka_log_scan(bytes(content), strict=False)
                for msg in errs:
                    rows.append(tuple([None] * len(names)) + (msg,))
                for r in recs:
                    if r["value"] is None:  # tombstone: not a document
                        continue
                    rec, err = decode_value(bytes(r["value"]))
                    if err is not None:
                        rows.append(
                            tuple([None] * len(names)) + (err,)
                        )
                    else:
                        rows.append(
                            tuple(rec.get(c) for c in names) + (None,)
                        )
            yield pd.DataFrame(rows, columns=names + ["_corrupt"])

    schema_str = ", ".join(
        f"{f['name']} {AV._spark_sql_type(f['type'])}"
        for f in rres["fields"]
    ) + ", _corrupt string"
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
        .mapInPandas(gen, schema=schema_str)
    )
