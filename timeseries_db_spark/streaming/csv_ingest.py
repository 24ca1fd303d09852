"""Streaming CSV→corpus ingest (r15, VERDICT item 5's other half):
headered ``.csv`` shards arrive as a text file-source stream, parse
through the SAME line-record quarantine projection as the batch reader
(``sources/tables.py:csv_lines_to_corpus`` — one ``from_csv`` pass,
JVM-side, no Python in the hot path), and flow into the
near-dup-suppressed corpus ingest as ONE query. This completes the
streaming arrival-unit set: parquet docs, WARC segments, archives,
Avro drops, and now CSV exports.

Unlike the archive/Avro ingests there is no payload kernel at all —
the whole decode is Catalyst expressions, so the stage stays inside
whole-stage codegen and the only Python anywhere is the foreachBatch
driver callback. Broken lines (type mismatches, truncated rows) cost
one dead-letter row each carrying the RAW LINE — auditable, never a
batch."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.sources.tables import csv_lines_to_corpus
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    start_corpus_ingest,
)


def read_csv_line_stream(
    spark, path: str, max_files_per_trigger: int | None = None,
    glob: str = "*.csv",
) -> DataFrame:
    """File-source stream of raw CSV lines (``value`` string) — the
    text source's schema is fixed, so streaming needs no inference."""
    reader = spark.readStream.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.text(path)


def read_csv_rejects(spark, out_dir: str) -> DataFrame:
    """The dead-letter table written by a quarantining CSV ingest:
    (batch, line) — the raw text of every malformed line."""
    return spark.read.parquet(os.path.join(out_dir, "rejects"))


def start_csv_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = False,
    sep: str = ",",
):
    """Start the csv-lines→records→near-dup-suppressed-corpus query
    (one streaming job; output layout and exactly-once contract are
    :func:`start_corpus_ingest`'s). ``quarantine=True`` lands every
    malformed line under ``out_dir/rejects/batch=<id>/`` with the same
    idempotent per-batch overwrite as the corpus writes."""
    if not quarantine:
        return start_corpus_ingest(
            csv_lines_to_corpus(stream, sep=sep)
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
        parsed = csv_lines_to_corpus(batch, sep=sep).persist()
        try:
            parsed.filter(F.col("_corrupt").isNotNull()).select(
                F.col("_corrupt").alias("line")
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejects", f"batch={batch_id}")
            )
            docs = parsed.filter(F.col("_corrupt").isNull()).select(
                "doc_id", "text"
            )
            process_corpus_batch(docs, batch_id, out_dir, t_est)
        finally:
            parsed.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
