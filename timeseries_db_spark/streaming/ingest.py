"""Structured Streaming ingest — the scale-path replacement for the
reference's HTTP-POST ingest (``Api.hs:33-38`` + acid-state write lock).

Pipeline: ``readStream`` → event-time watermark → keyed dedup →
``foreachBatch`` insert-if-absent into a :class:`TsTable` (exactly-once
per micro-batch via the table's atomic manifest swap + the sink's
checkpointed batch ids).

Semantic gap vs the reference, documented deliberately (SURVEY.md §7.4):
the reference rejects duplicate ``(timestamp, tag)`` keys *forever*; a
stream can only do that within its watermark horizon state. We therefore
dedup in two layers — ``dropDuplicates`` bounded by the watermark for
in-flight duplicates, plus the per-batch anti-join against the table for
late duplicates — which together give the reference's semantics as long
as duplicates arrive within the retention of the table scan used by the
anti-join (full parity; the anti-join prunes to the batch's date
partitions, so it stays cheap at 100 TB).

Windowed rollup: tumbling event-time windows + the same five aggregates —
the streaming generalization of the reference's group-by-timestamp
(``Queries/TS.hs:31-49``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timeseries_db_spark.operators.dml import KEY, TsTable

#: Historical fixed file-source schema (ts as Int64 nanoseconds under
#: nanosAsLong). Kept for producers that pin the long-ns layout;
#: ``read_events_stream`` now derives the schema from the files instead,
#: because the physical timestamp type of events.parquet is the
#: PRODUCER'S choice (the driver testdata has shipped both
#: TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds) and a
#: hard-coded LONG silently reinterprets micros as nanos.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of events parquet, normalized to the tsdb shape
    plus an ``event_time`` timestamp column for watermarking.

    A file stream requires an explicit schema; it is probed from a batch
    read of the same files so the stream sees exactly the type the batch
    path sees, and the ts→millis normalization is the SAME
    ``ts_to_millis`` the batch views use (long-ns vs timestamp vs
    timestamp_ntz all handled in one place — ``sources/tables.py``)."""
    from pyspark.errors import AnalysisException

    from timeseries_db_spark.sources.tables import ts_to_millis

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException:
        # normal file-stream pattern: the stream starts BEFORE producers
        # write the first file, so the probe read finds an empty dir
        # ("unable to infer schema"). Fall back to the pinned long-ns
        # layout rather than failing the start (ADVICE r6).
        schema = EVENTS_STREAM_SCHEMA
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # file source needs a directory; narrow with a glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.load(path)
    ts_ms = ts_to_millis(raw, "ts")
    return raw.select(
        ts_ms.alias("timestamp"),
        F.col("event_type").alias("tag"),
        F.col("value"),
        F.timestamp_millis(ts_ms).alias("event_time"),
    )


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Keyed dedup bounded by the event-time watermark — the streaming
    analog of ``validInsert`` (``Queries.hs:76-77``).

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``): with
    the watermark column absent from the dedup key subset, plain
    dropDuplicates never evicts its state and grows O(all keys ever seen);
    the WithinWatermark variant evicts each key once the watermark passes
    it — state is O(keys within the horizon), which is the documented
    contract. Redeliveries older than the horizon pass through here and
    are dropped by the ingest upsert's table anti-join (layer two)."""
    return stream.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        KEY
    )


def start_ingest(
    stream: DataFrame,
    table: TsTable,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Start the ingest query: dedup → per-batch insert-if-absent merge.

    The batch upsert inserts only keys absent from the table (late
    duplicates are silently dropped rather than failing the stream —
    a stream can't bounce a batch back to the client like HTTP 400).
    """
    deduped = dedup_stream(stream, watermark)

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.select("timestamp", "tag", "value")
        # drop keys that already landed (late duplicates / replays)
        # bound the snapshot to the batch's time range: the manifest
        # prunes out-of-range date partitions, so the anti-join scans
        # O(batch dates), not O(table history)
        lohi = batch.agg(F.min("timestamp"), F.max("timestamp")).first()
        if lohi[0] is None:
            return
        current = table.read(lo_ms=int(lohi[0]), hi_ms=int(lohi[1])).select(*KEY)
        # persist: fresh feeds the emptiness probe AND insert's own
        # validation joins — without it each re-runs the anti-join and
        # re-scans the touched partitions
        fresh = (
            batch.dropDuplicates(KEY)
            .join(current, on=KEY, how="left_anti")
            .persist()
        )
        try:
            if fresh.limit(1).count() > 0:
                table.insert(fresh)
        finally:
            fresh.unpersist()

    return (
        deduped.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_rollup_stream(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Streaming window rollup per tag — tumbling by default, SLIDING
    when ``slide`` is given (append mode after the watermark closes each
    window; overlapping windows just mean a row updates window/slide
    aggregation states instead of one)."""
    # the aggregate body is SHARED with the batch twin (one definition →
    # structural bit-parity, not hand-synchronized copies)
    from timeseries_db_spark.operators.rollup import rollup_aggregate

    win = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return rollup_aggregate(
        stream.withWatermark("event_time", watermark).groupBy(win, F.col("tag"))
    )
