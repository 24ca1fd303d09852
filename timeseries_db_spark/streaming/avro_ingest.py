"""Streaming AVRO→corpus ingest (r15, VERDICT item 5): ``.avro``
container files arrive as a binary file-source stream and flow through
the tolerant from-spec decoder (``sources/avro.py:avro_scan``) →
near-duplicate suppression, as ONE Structured Streaming query — the
Kafka-archive-dump-to-training-corpus pipeline with no intermediate
landing table, completing the arrival-unit set (parquet docs, WARC
segments, archives, and now Avro drops).

The decode is a stateless Arrow-batched map (each micro-batch decodes
only its own files executor-side), so composing it under
:func:`timeseries_db_spark.streaming.corpus_ingest.start_corpus_ingest`
costs nothing in state, and the near-dup decision reuses the persisted
band-bucketed signature index unchanged. Dirty blocks are the
WARC-chain quarantine story: ``avro_scan(strict=False)`` prices a
corrupt block (or a junk container) at its own records plus one error
row into the dead-letter channel — the sibling blocks of a poisoned
shard still publish in the same micro-batch.

Doc identity comes from the RECORDS (Avro rows carry their own
``doc_id``), so there is no stride contract here — unlike the archive
and WARC ingests, whose members are anonymous and get synthesized ids.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.sources.avro import avro_scan
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    start_corpus_ingest,
)

#: the binaryFile source schema — streaming file sources need it
#: explicit (no inference pass over a stream)
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_avro_file_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw ``.avro`` container files — one row
    per FILE (the arrival unit), decoded downstream executor-side."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.avro")
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.load(path)


def decode_avro_files(
    files: DataFrame, reader_schema: dict | None = None
) -> DataFrame:
    """(doc_id, text, _corrupt, path) — every record of every container
    in the batch, plus one all-NULL row per quarantined block/container
    carrying the message in ``_corrupt`` and the source file in
    ``path``. Stateless Arrow-batched map — composes under batch reads
    and streaming sinks alike.

    ``reader_schema`` (r16): decode each arriving shard under spec
    §Schema Resolution against this schema — a stream fed by YEARS of
    writer versions ingests uniformly; an unresolvable writer schema
    dead-letters at container granularity like any other damage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                _schema, recs, errs = avro_scan(
                    bytes(content), strict=False,
                    reader_schema=reader_schema,
                )
                for msg in errs:
                    rows.append((None, None, msg, path))
                for r in recs:
                    rows.append((r["doc_id"], r.get("text"), None, path))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "_corrupt", "path"]
            )

    return files.select("path", "content").mapInPandas(
        gen,
        schema="doc_id long, text string, _corrupt string, path string",
    )


def read_avro_rejects(spark, out_dir: str) -> DataFrame:
    """The dead-letter table written by a quarantining Avro ingest:
    (batch, path, err) — one row per quarantined block/container."""
    return spark.read.parquet(os.path.join(out_dir, "rejects"))


def start_avro_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = False,
    reader_schema: dict | None = None,
):
    """Start the avro-files→records→near-dup-suppressed-corpus query
    (one streaming job; output layout and exactly-once contract are
    :func:`start_corpus_ingest`'s).

    ``quarantine=True`` additionally lands every block/container error
    under ``out_dir/rejects/batch=<id>/`` with the same idempotent
    per-batch overwrite as the corpus writes — the dead-letter channel
    an Avro-drop deployment monitors."""
    if not quarantine:
        return start_corpus_ingest(
            decode_avro_files(stream, reader_schema)
            .filter(F.col("_corrupt").isNull())
            .select("doc_id", "text"),
            out_dir,
            checkpoint_dir,
            t_est,
        )

    from timeseries_db_spark.streaming.corpus_ingest import (
        process_corpus_batch,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        decoded = decode_avro_files(batch, reader_schema).persist()
        try:
            decoded.filter(F.col("_corrupt").isNotNull()).select(
                "path", F.col("_corrupt").alias("err")
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejects", f"batch={batch_id}")
            )
            docs = decoded.filter(F.col("_corrupt").isNull()).select(
                "doc_id", "text"
            )
            process_corpus_batch(docs, batch_id, out_dir, t_est)
        finally:
            decoded.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def decode_single_object_files(
    files: DataFrame,
    schemas: list[dict],
    reader_schema: dict | None = None,
) -> DataFrame:
    """(doc_id, text, _corrupt, path) — every message of every
    SINGLE-OBJECT-encoded segment (r16: the raw Kafka-archive shape,
    ``sources/avro.py:single_object_scan``) in the batch, registry-
    resolved per message and optionally evolved under a reader schema;
    unknown fingerprints / corrupt bodies price one error row and the
    scan resyncs at the next C3 01 marker. Same stateless Arrow-batched
    shape as :func:`decode_avro_files`; r17: clean decodes verify
    against the shard's sidecar manifest when one exists (the format's
    between-message truncation is otherwise silent)."""
    from timeseries_db_spark.sources.avro import single_object_scan
    from timeseries_db_spark.sources.manifest import manifest_error

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                recs, errs = single_object_scan(
                    data,
                    schemas,
                    reader_schema=reader_schema,
                    strict=False,
                )
                if not errs:
                    merr = manifest_error(path, len(data), len(recs))
                    if merr is not None:
                        errs = [merr]
                for msg in errs:
                    rows.append((None, None, msg, path))
                for r in recs:
                    rows.append((r["doc_id"], r.get("text"), None, path))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "_corrupt", "path"]
            )

    return files.select("path", "content").mapInPandas(
        gen,
        schema="doc_id long, text string, _corrupt string, path string",
    )


def decode_confluent_files(
    files: DataFrame,
    registry: dict[int, dict],
    reader_schema: dict | None = None,
) -> DataFrame:
    """(doc_id, text, _corrupt, path) — every message of every
    CONFLUENT-wire-format segment (r17: magic 0x00 + 4-byte BE schema
    id + Avro body, ``sources/avro.py:confluent_scan``) in the batch,
    id-resolved per message against the vendored registry snapshot and
    optionally evolved under a reader schema; unknown ids / corrupt
    bodies price one error row with resync to the next KNOWN header.
    Clean decodes verify against the shard's sidecar manifest when one
    exists. Same stateless Arrow-batched shape as
    :func:`decode_single_object_files`."""
    from timeseries_db_spark.sources.avro import confluent_scan
    from timeseries_db_spark.sources.manifest import manifest_error

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                recs, errs = confluent_scan(
                    data,
                    registry,
                    reader_schema=reader_schema,
                    strict=False,
                )
                if not errs:
                    merr = manifest_error(path, len(data), len(recs))
                    if merr is not None:
                        errs = [merr]
                for msg in errs:
                    rows.append((None, None, msg, path))
                for r in recs:
                    rows.append((r["doc_id"], r.get("text"), None, path))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "_corrupt", "path"]
            )

    return files.select("path", "content").mapInPandas(
        gen,
        schema="doc_id long, text string, _corrupt string, path string",
    )
