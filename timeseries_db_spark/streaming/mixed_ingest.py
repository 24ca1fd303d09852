"""Streaming MIXED-arrival ingest (r16 — VERDICT item 2): one
landing directory, many arrival formats. Real drop zones are not
format-pure — a single bucket receives ``.avro`` container files from
the Kafka archiver, ``.csv`` exports from the warehouse, and
``.jsonl`` shards from the labeling vendor, all at once. Running one
streaming query PER format triples the fixed costs (source listing,
checkpoint, query startup, micro-batch scheduling); this module runs
ONE binaryFile file-source stream over the shared directory and
routes each micro-batch by extension inside a single ``foreachBatch``
to per-format corpus-ingest states.

Per-format isolation is load-bearing, not cosmetic: each format
publishes into its OWN ``out_root/<fmt>/`` corpus-ingest layout
(sigs + docs + rejects), so the near-dup suppression never crosses
formats — an Avro record can only be dominated by an earlier Avro
record, exactly as if the formats ran as separate queries. The
published set per format is therefore the same batch-boundary-free
closed form (``corpus_ingest_kept_sql``) the single-format ingests
pin: domination is by doc_id order both within a batch
(``id_e < id_d``) and across batches (the seen index), so
consolidating shards into fewer, larger micro-batches cannot change
the result — only make it cheaper (fewer seen-index reads, fewer
per-batch write rounds).

Dead-letter channels stay per-format too (``avro/rejects``,
``csv/rejects``, ``jsonl/rejects``) with the same idempotent
per-batch overwrite, so a monitoring consumer of any single-format
ingest can point at the mixed layout unchanged.

At 100 TB: the stream stays a file-listing source feeding stateless
Arrow-batched / JVM-side decode maps (no Exchange before the corpus
publish joins); per-batch work scales with the batch's own shard
bytes, and the per-format seen reads partition-prune to the batch's
band buckets exactly as in ``corpus_ingest.process_corpus_batch``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.sources.tables import (
    csv_lines_to_corpus,
    jsonl_lines_to_corpus,
)
from timeseries_db_spark.streaming.avro_ingest import (
    _BINARY_FILE_SCHEMA,
    decode_avro_files,
    decode_confluent_files,
    decode_single_object_files,
)
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    process_corpus_batch,
)


def _sz_content_lines(files: DataFrame) -> DataFrame:
    """(value) — the text lines of snappy-FRAMED (.sz) shards in the
    batch, decoded chunk-by-chunk with per-chunk masked CRC-32C
    verification (r16); a damaged shard keeps its verified prefix and
    contributes one unparseable sentinel line, which the downstream
    line projection lands in ``_corrupt`` — identical pricing to the
    batch reader (``sources/tables.py:sz_lines``); r17: clean decodes
    verify against the shard's sidecar manifest when one exists,
    pricing boundary truncation (silent by format) as one sentinel."""
    import pandas as pd

    from timeseries_db_spark.functions.snappy import snappy_framed_chunks
    from timeseries_db_spark.sources.manifest import manifest_error

    def file_lines(fpath: str, data: bytes) -> list[str]:
        values: list[str] = []
        tail = b""
        try:
            for piece in snappy_framed_chunks(data):
                tail += piece
                *lines, tail = tail.split(b"\n")
                values.extend(
                    ln.decode("utf-8", "replace") for ln in lines if ln
                )
        except ValueError as e:
            return values + [f"\x00sz corrupt: {e}"]
        if tail:
            values.append(tail.decode("utf-8", "replace"))
        err = manifest_error(fpath, len(data), len(values))
        if err is not None:
            values.append(f"\x00sz {err}")
        return values

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            values = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                values.extend(file_lines(fpath, bytes(content)))
            yield pd.DataFrame({"value": values})

    return files.select("path", "content").mapInPandas(
        gen, schema="value string"
    )


def _gz_content_lines(files: DataFrame) -> DataFrame:
    """(value) — the text lines of ``.gz`` shards in the batch (r16
    late). Spark's native codec handles .gz on the TEXT source, but
    the mixed landing dir arrives through binaryFile — so gunzip runs
    in the same Arrow kernel as the other Python routes. Multi-member
    streams (the pigz shape) continue; COMPLETE earlier members keep
    their lines when a later member is damaged. A truncated member's
    partial output is DISCARDED, not published: gzip's only integrity
    check is the CRC-32 trailer, so partial inflate output is
    unverified bytes (unlike .sz, whose per-chunk CRC lets the
    verified prefix publish) — the shard prices one sentinel."""
    import zlib

    import pandas as pd

    def file_lines(data: bytes) -> list[str]:
        values: list[str] = []
        tail = b""
        try:
            while data:
                dec = zlib.decompressobj(16 + 15)
                tail += dec.decompress(data)
                while not dec.eof:
                    if dec.unconsumed_tail:
                        tail += dec.decompress(dec.unconsumed_tail)
                    else:
                        raise ValueError("gzip stream truncated")
                *lines, tail = tail.split(b"\n")
                values.extend(
                    ln.decode("utf-8", "replace") for ln in lines if ln
                )
                data = dec.unused_data.lstrip(b"\x00")
        except (ValueError, zlib.error) as e:
            return values + [f"\x00gz corrupt: {e}"]
        if tail:
            values.append(tail.decode("utf-8", "replace"))
        return values

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            values = []
            for content in pdf["content"]:
                values.extend(file_lines(bytes(content)))
            yield pd.DataFrame({"value": values})

    return files.select("content").mapInPandas(gen, schema="value string")


def read_mixed_file_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw arrival files of ANY format — one row
    per file (path + bytes), format dispatch downstream. No glob
    filter: the landing directory's whole contents are the contract,
    and an extension nobody routes is itself a signal (it stays
    untouched for the operator to inspect)."""
    reader = spark.readStream.format("binaryFile").schema(
        _BINARY_FILE_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.load(path)


def _content_lines(files: DataFrame) -> DataFrame:
    """(value) — the text lines of every file in the batch, decoded
    and split JVM-side (one projection, no Python)."""
    return files.select(
        F.explode(
            F.split(F.decode(F.col("content"), "UTF-8"), "\n")
        ).alias("value")
    )


def start_mixed_corpus_ingest(
    stream: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = True,
    sobj_schemas: list[dict] | None = None,
    sobj_reader_schema: dict | None = None,
    cwire_registry: dict[int, dict] | None = None,
    cwire_reader_schema: dict | None = None,
):
    """Start the one-query mixed ingest. Layout under ``out_root``:
    ``avro/``, ``csv/``, ``jsonl/``, ``sobj/``, ``sz/``, ``gz/``
    (plus ``csv_gz/`` / ``csv_sz/`` when compound-suffixed shards
    arrive) — each a full
    corpus-ingest state (``sigs`` + ``docs`` + ``rejects``) identical
    to what a single-format ingest would have produced over that
    format's shards alone. ``.sobj`` segments (single-object-encoded
    Kafka-archive shape) resolve against ``sobj_schemas`` (default:
    the corpus schema) and optionally a reader schema; ``.cwire``
    segments (Confluent wire format, r17) route into a ``cwire/``
    channel when ``cwire_registry`` (id → schema snapshot) is
    configured, and stay untouched otherwise. Wrapper
    routing (r17): ``.csv.gz`` / ``.csv.sz`` shards decompress with
    the wrapper's kernel and parse through the CSV closed form into
    their own channel; ``.jsonl.gz`` / ``.jsonl.sz`` and bare
    ``.gz`` / ``.sz`` shards carry JSONL on the legacy wrapper
    channels."""
    if sobj_schemas is None:
        from timeseries_db_spark.sources.avro import CORPUS_AVRO_SCHEMA

        sobj_schemas = [CORPUS_AVRO_SCHEMA]

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # r17 (VERDICT item 5): routing reads the COMPOUND suffix,
            # not just the last extension — a real landing dir mixes
            # compressions per format, and `.csv.gz` / `.csv.sz`
            # previously routed to the gz/sz channel and were parsed
            # as JSONL (every line dead-lettered). The probe collects
            # (penultimate, last) extension pairs; a wrapper suffix
            # (gz/sz) dispatches on the format UNDER it. Channels stay
            # format-isolated: `.csv.gz` publishes into its own
            # `csv_gz/` state through the csv parser, while
            # `.jsonl.gz` and bare `.gz` keep the legacy `gz/`
            # channel (documented: bare wrappers carry JSONL).
            pairs = {
                (r[0], r[1])
                for r in batch.select(
                    F.regexp_extract(
                        "path", r"\.([A-Za-z0-9]+)\.[A-Za-z0-9]+$", 1
                    ),
                    F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1),
                )
                .distinct()
                .collect()
            }
            exts = {ext for _pen, ext in pairs}
            container_routes = [
                ("avro", decode_avro_files),
                (
                    "sobj",
                    lambda files: decode_single_object_files(
                        files, sobj_schemas, sobj_reader_schema
                    ),
                ),
            ]
            # r17: Confluent-framed segments route only when a
            # registry snapshot is configured — without one the ids
            # are undecodable, so .cwire files stay untouched for the
            # operator (the unrouted-extension posture, not a guess)
            if cwire_registry is not None:
                container_routes.append(
                    (
                        "cwire",
                        lambda files: decode_confluent_files(
                            files, cwire_registry, cwire_reader_schema
                        ),
                    )
                )
            for ext, decode in container_routes:
                if ext not in exts:
                    continue
                decoded = decode(
                    batch.filter(F.col("path").endswith(f".{ext}"))
                ).persist()
                try:
                    if quarantine:
                        decoded.filter(
                            F.col("_corrupt").isNotNull()
                        ).select(
                            "path", F.col("_corrupt").alias("err")
                        ).write.mode("overwrite").parquet(
                            os.path.join(
                                out_root,
                                ext,
                                "rejects",
                                f"batch={batch_id}",
                            )
                        )
                    process_corpus_batch(
                        decoded.filter(F.col("_corrupt").isNull()).select(
                            "doc_id", "text"
                        ),
                        batch_id,
                        os.path.join(out_root, ext),
                        t_est,
                    )
                finally:
                    decoded.unpersist()
            line_routes: list[tuple] = []
            for wrapper, decoder in (
                ("gz", _gz_content_lines),
                ("sz", _sz_content_lines),
            ):
                if wrapper not in exts:
                    continue
                if any(
                    ext == wrapper and pen == "csv"
                    for pen, ext in pairs
                ):
                    line_routes.append(
                        (
                            f"csv_{wrapper}",
                            F.col("path").endswith(f".csv.{wrapper}"),
                            decoder,
                            csv_lines_to_corpus,
                        )
                    )
                # bare `.gz`/`.sz` and `.jsonl.gz`/`.jsonl.sz` share
                # the legacy wrapper channel (JSONL inside)
                line_routes.append(
                    (
                        wrapper,
                        F.col("path").endswith(f".{wrapper}")
                        & ~F.col("path").endswith(f".csv.{wrapper}"),
                        decoder,
                        jsonl_lines_to_corpus,
                    )
                )
            for ext, parser in (
                ("csv", csv_lines_to_corpus),
                ("jsonl", jsonl_lines_to_corpus),
            ):
                if ext in exts:
                    line_routes.append(
                        (
                            ext,
                            F.col("path").endswith(f".{ext}"),
                            _content_lines,
                            parser,
                        )
                    )
            for channel, flt, lines, parser in line_routes:
                parsed = parser(lines(batch.filter(flt))).persist()
                try:
                    if quarantine:
                        parsed.filter(
                            F.col("_corrupt").isNotNull()
                        ).select(
                            F.col("_corrupt").alias("line")
                        ).write.mode("overwrite").parquet(
                            os.path.join(
                                out_root,
                                channel,
                                "rejects",
                                f"batch={batch_id}",
                            )
                        )
                    process_corpus_batch(
                        parsed.filter(F.col("_corrupt").isNull()).select(
                            "doc_id", "text"
                        ),
                        batch_id,
                        os.path.join(out_root, channel),
                        t_est,
                    )
                finally:
                    parsed.unpersist()
        finally:
            batch.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
