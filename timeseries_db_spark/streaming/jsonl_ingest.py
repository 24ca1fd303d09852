"""Streaming JSONL→corpus ingest (r15): ``.jsonl`` shards — THE
exchange format of LLM training data — arrive as a text file-source
stream, parse through the same line-record quarantine projection as
the batch reader (``sources/tables.py:jsonl_lines_to_corpus``, one JVM
``from_json`` pass), and flow into the near-dup-suppressed corpus
ingest as one query. Broken lines dead-letter with their raw text.

Identical architecture to ``streaming/csv_ingest.py`` (text stream →
Catalyst-only projection → ``foreachBatch`` with per-batch idempotent
rejects + corpus writes); pinned by pytest rather than a driver gate
leg — ``stream_ingest_dedup`` already runs five streaming sub-ingests
(~75 s on a vanilla 8-core session) and a sixth would strain the
driver's per-entry budget for no new decode surface (the projection
itself IS the batch reader's, already under the csvfmt value oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.sources.tables import jsonl_lines_to_corpus
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    start_corpus_ingest,
)


def read_jsonl_line_stream(
    spark, path: str, max_files_per_trigger: int | None = None,
    glob: str = "*.jsonl",
) -> DataFrame:
    """File-source stream of raw JSONL lines (``value`` string)."""
    reader = spark.readStream.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.text(path)


def read_jsonl_rejects(spark, out_dir: str) -> DataFrame:
    """The dead-letter table: (batch, line) raw malformed lines."""
    return spark.read.parquet(os.path.join(out_dir, "rejects"))


def start_jsonl_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = False,
):
    """Start the jsonl-lines→records→near-dup-suppressed-corpus query
    (output layout and exactly-once contract are
    :func:`start_corpus_ingest`'s)."""
    if not quarantine:
        return start_corpus_ingest(
            jsonl_lines_to_corpus(stream)
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
        parsed = jsonl_lines_to_corpus(batch).persist()
        try:
            parsed.filter(F.col("_corrupt").isNotNull()).select(
                F.col("_corrupt").alias("line")
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejects", f"batch={batch_id}")
            )
            process_corpus_batch(
                parsed.filter(F.col("_corrupt").isNull()).select(
                    "doc_id", "text"
                ),
                batch_id,
                out_dir,
                t_est,
            )
        finally:
            parsed.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
