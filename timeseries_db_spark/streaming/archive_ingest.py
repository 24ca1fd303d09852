"""Streaming ARCHIVE→corpus ingest (r14, VERDICT item 4): tarballs /
zips arrive as a file-source stream and flow through tolerant archive
expansion (``operators/archive.py:archive_scan``) → member routing →
near-duplicate suppression, as ONE Structured Streaming query — the
tar-shard-to-training-corpus pipeline with no intermediate landing
table, mirroring the WARC ingest (``streaming/warc_ingest.py``) for
the other arrival unit real datasets ship in (code dumps, LAION
shards, document collections: tarballs and zips).

The expansion is a stateless Arrow-batched map, so composing it under
:func:`timeseries_db_spark.streaming.corpus_ingest.start_corpus_ingest`
costs nothing in state: each micro-batch expands only its own archives
executor-side, and the near-dup decision reuses the persisted
band-bucketed signature index unchanged. Dirty archives are the
WARC-chain quarantine story (r14): a corrupt member/container costs a
``kind='error'`` row into the dead-letter channel, never the
micro-batch — a poisoned tarball's good members still publish.

Published doc identity: ``doc_id = asset_id * MEMBERS_PER_ASSET +
member_idx`` — same stride contract as the WARC ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.operators.archive import expand_archive_assets
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    start_corpus_ingest,
)

#: doc_id stride: members per archive the id scheme can absorb
MEMBERS_PER_ASSET = 1000


def read_archive_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of (asset_id, kind, payload) parquet — one
    row per archive file."""
    reader = spark.readStream.schema(
        "asset_id long, kind string, payload binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(path)


def archive_docs(
    stream: DataFrame, password: bytes | None = None
) -> DataFrame:
    """(doc_id, text) — the corpus-ingest input expanded from an
    archive asset stream: one row per CLEAN text member (binary→string
    cast is the UTF-8 decode; members sniffed non-text — images, PDFs,
    nested archives — never enter the corpus). Stateless, so it
    composes under any streaming sink."""
    return (
        expand_archive_assets(stream, password=password)
        .filter((F.col("kind") == "text") & F.col("err").isNull())
        .select(
            (
                F.col("asset_id") * MEMBERS_PER_ASSET
                + F.col("member_idx")
            ).alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
        )
    )


def archive_rejects(expanded: DataFrame) -> DataFrame:
    """(asset_id, member_idx, name, err) — the quarantine rows of one
    expanded batch, for the dead-letter channel: corrupt members, bad
    wrappers, junk containers."""
    return expanded.filter(F.col("kind") == "error").select(
        "asset_id", "member_idx", "name", "err"
    )


def read_archive_rejects(spark, out_dir: str) -> DataFrame:
    """The dead-letter table written by a quarantining archive ingest:
    (batch, asset_id, member_idx, name, err)."""
    import os

    return spark.read.parquet(os.path.join(out_dir, "rejects"))


def start_archive_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = False,
    password: bytes | None = None,
):
    """Start the archive→members→near-dup-suppressed-corpus query (one
    streaming job; output layout and exactly-once contract are
    :func:`start_corpus_ingest`'s).

    ``quarantine=True`` additionally lands every error row under
    ``out_dir/rejects/batch=<id>/`` with the same idempotent per-batch
    overwrite as the corpus writes — the dead-letter channel a real
    archive-drop deployment monitors."""
    if not quarantine:
        return start_corpus_ingest(
            archive_docs(stream, password=password),
            out_dir,
            checkpoint_dir,
            t_est,
        )
    import os

    from timeseries_db_spark.streaming.corpus_ingest import (
        process_corpus_batch,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        ex = expand_archive_assets(batch, password=password).persist()
        try:
            archive_rejects(ex).write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejects", f"batch={batch_id}")
            )
            docs = ex.filter(
                (F.col("kind") == "text") & F.col("err").isNull()
            ).select(
                (
                    F.col("asset_id") * MEMBERS_PER_ASSET
                    + F.col("member_idx")
                ).alias("doc_id"),
                F.col("payload").cast("string").alias("text"),
            )
            process_corpus_batch(docs, batch_id, out_dir, t_est)
        finally:
            ex.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
