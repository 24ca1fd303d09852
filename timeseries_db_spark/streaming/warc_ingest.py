"""Streaming WARC→corpus ingest (r12, VERDICT r11 item 8): crawl
container files arrive as a file-source stream and flow through
WARC parse (gzip members) → HTTP decode (dechunk, inflate, charset) →
HTML→text extraction → near-duplicate suppression, all as ONE
Structured Streaming query — the full Common-Crawl-to-training-corpus
pipeline with no intermediate landing table.

The extraction half (:func:`timeseries_db_spark.operators.warc
.warc_extract_text`) is a stateless Arrow-batched map, so composing it
under the existing :func:`timeseries_db_spark.streaming.corpus_ingest
.start_corpus_ingest` ``foreachBatch`` costs nothing extra in state:
each micro-batch parses only its own files executor-side, and the
near-dup decision reuses the persisted band-bucketed signature index
unchanged. At 100 TB the WARC files ARE the natural arrival unit
(Common Crawl ships ~1 GB segments), and the per-file parse
parallelism is the file-source's partitioning — no shuffle before the
band join.

Published doc identity: ``doc_id = asset_id * RECS_PER_ASSET +
rec_idx`` — stable, order-preserving (arrival order stays consistent
with doc_id order when files arrive by ascending asset_id, which is
what the batch-boundary-invariance of the kept rule needs). A real
deployment with unbounded records per file would widen the stride or
switch to (warc offset)-derived ids; the rule is a parameter, not a
structural assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.operators.warc import (
    EXTRACT_MIMES as _EXTRACT_MIMES_L,
    warc_extract_text,
)
from timeseries_db_spark.streaming.corpus_ingest import (
    T_EST_DEFAULT,
    start_corpus_ingest,
)

#: doc_id stride: response records per asset the id scheme can absorb
RECS_PER_ASSET = 1000


def read_warc_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of (asset_id, kind, payload) parquet — one
    row per WARC file."""
    reader = spark.readStream.schema(
        "asset_id long, kind string, payload binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def warc_docs(stream: DataFrame) -> DataFrame:
    """(doc_id, text) — the corpus-ingest input extracted from a WARC
    asset stream: one row per CLEAN 200-class ``response`` record,
    full transport decode included. Stateless, so it composes under
    any streaming sink.

    r13: the extraction is tolerant, status-aware, and MIME-aware —
    corrupt records surface as ``rec_type='error'`` rows, non-200 and
    non-text (image/PDF/…) bodies as empty ``response`` rows, ALL
    filtered here, so a poisoned crawl segment costs its damaged
    records only (the streaming query survives) and error/redirect/
    binary bodies never enter the corpus."""
    from timeseries_db_spark.operators.warc import EXTRACT_MIMES

    return (
        warc_extract_text(stream)
        .filter(
            (F.col("rec_type") == "response")
            & F.col("err").isNull()
            & F.col("status").between(200, 299)
            & F.col("mime").isin(*EXTRACT_MIMES)
        )
        .select(
            (F.col("asset_id") * RECS_PER_ASSET + F.col("rec_idx")).alias(
                "doc_id"
            ),
            "text",
        )
    )


def warc_rejects(extracted: DataFrame) -> DataFrame:
    """(asset_id, rec_idx, uri, rec_type, status, mime, err) — the
    rows :func:`warc_docs` excludes from the corpus, for the
    dead-letter channel (r13): parse-damage quarantine rows plus
    filtered responses (non-200 or non-text mime). ``revisit`` rows
    are NOT rejects — they are dedup signals a consumer reads off the
    extraction surface directly."""
    return extracted.filter(
        (F.col("rec_type") == "error")
        | (
            (F.col("rec_type") == "response")
            & (
                ~F.col("status").between(200, 299)
                | ~F.col("mime").isin(*_EXTRACT_MIMES_L)
            )
        )
    ).select("asset_id", "rec_idx", "uri", "rec_type", "status", "mime",
             "err")


def read_rejects(spark, out_dir: str) -> DataFrame:
    """The dead-letter table written by a quarantining ingest:
    (batch, asset_id, rec_idx, uri, rec_type, status, mime, err)."""
    import os

    return spark.read.parquet(os.path.join(out_dir, "rejects"))


def quality_gate(
    docs: DataFrame, thresholds: dict | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split (doc_id, text) into (kept, lowq) by the Gopher/
    MassiveText rules (r13): ``kept`` is the corpus-bound stream,
    ``lowq`` carries the doc_id + every metric for the dead-letter
    channel. Map-only both ways (``gopher_quality(with_text=True)``
    keeps the text in the same projection — no join, no state), so
    composing it under the streaming ingest costs one more codegen
    stage per micro-batch."""
    from timeseries_db_spark.operators import text as _text

    q = _text.gopher_quality(docs, with_text=True, **(thresholds or {}))
    kept = q.filter(F.col("keep")).select("doc_id", "text")
    lowq = q.filter(~F.col("keep")).drop("text", "keep")
    return kept, lowq


def start_warc_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
    quarantine: bool = False,
    quality: dict | None = None,
):
    """Start the WARC→text→near-dup-suppressed-corpus query (one
    streaming job; output layout and exactly-once contract are
    :func:`start_corpus_ingest`'s).

    ``quarantine=True`` (r13) additionally lands every excluded record
    (parse damage, non-200, non-text mime) under
    ``out_dir/rejects/batch=<id>/`` — the dead-letter channel a real
    crawl deployment monitors. One streaming query still: the batch
    function extracts ONCE (persisted), writes rejects with the same
    idempotent per-batch-partition overwrite as the corpus writes,
    then runs the standard dedup-publish step on the clean docs.

    ``quality`` (r13, a Gopher-threshold dict — ``{}`` for the
    published defaults) inserts the :func:`quality_gate` between
    extraction and dedup: low-quality pages never reach the signature
    index, and with ``quarantine`` they land under
    ``out_dir/lowq/batch=<id>/`` with their full metric row — the
    extract → clean → QUALITY-FILTER → dedup → publish shape a real
    pretraining ingest runs as one job."""
    if not quarantine:
        docs = warc_docs(stream)
        if quality is not None:
            docs, _ = quality_gate(docs, quality)
        return start_corpus_ingest(docs, out_dir, checkpoint_dir, t_est)
    import os

    from timeseries_db_spark.streaming.corpus_ingest import (
        process_corpus_batch,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        ex = warc_extract_text(batch).persist()
        try:
            warc_rejects(ex).write.mode("overwrite").parquet(
                os.path.join(out_dir, "rejects", f"batch={batch_id}")
            )
            docs = (
                ex.filter(
                    (F.col("rec_type") == "response")
                    & F.col("err").isNull()
                    & F.col("status").between(200, 299)
                    & F.col("mime").isin(*_EXTRACT_MIMES_L)
                )
                .select(
                    (
                        F.col("asset_id") * RECS_PER_ASSET
                        + F.col("rec_idx")
                    ).alias("doc_id"),
                    "text",
                )
            )
            if quality is not None:
                docs, lowq = quality_gate(docs, quality)
                lowq.write.mode("overwrite").parquet(
                    os.path.join(out_dir, "lowq", f"batch={batch_id}")
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


def read_lowq(spark, out_dir: str) -> DataFrame:
    """The low-quality dead-letter table written by a quality-gated
    ingest: (batch, doc_id, n_words, the 8 Gopher metrics)."""
    import os

    return spark.read.parquet(os.path.join(out_dir, "lowq"))
