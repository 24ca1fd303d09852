"""Structured Streaming ingest + rollup: file-source streams driven to
completion with processAllAvailable, checked against batch ground truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timeseries_db_spark.operators.dml import TsTable
from timeseries_db_spark.sources.tables import events_as_tsdb
from timeseries_db_spark.streaming import ingest


def _events_glob(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def test_stream_ingest_into_table(spark, sf_dir, tmp_path):
    stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
    table = TsTable.create(spark, str(tmp_path / "tbl"))
    q = ingest.start_ingest(stream, table, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = table.read()
    expected = events_as_tsdb(spark, sf_dir).dropDuplicates(["timestamp", "tag"])
    assert got.count() == expected.count()
    # spot-check contents: aggregate equality
    g = got.agg(F.sum("value"), F.min("timestamp"), F.max("timestamp")).first()
    e = expected.agg(F.sum("value"), F.min("timestamp"), F.max("timestamp")).first()
    assert abs(g[0] - e[0]) < 1e-6 and g[1] == e[1] and g[2] == e[2]


def test_stream_ingest_is_idempotent_on_replay(spark, sf_dir, tmp_path):
    """Re-delivering the same files (fresh checkpoint, same table) must not
    duplicate rows — the per-batch anti-join drops late/replayed keys."""
    table = TsTable.create(spark, str(tmp_path / "tbl"))
    for ckpt in ("ckpt1", "ckpt2"):
        stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
        q = ingest.start_ingest(stream, table, str(tmp_path / ckpt))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    expected = (
        events_as_tsdb(spark, sf_dir).dropDuplicates(["timestamp", "tag"]).count()
    )
    assert table.read().count() == expected


def test_read_events_stream_empty_dir_falls_back_to_pinned_schema(
    spark, tmp_path
):
    """Starting the stream before producers write any file (the normal
    file-stream pattern) must not fail schema inference — the probe read
    falls back to EVENTS_STREAM_SCHEMA (ADVICE r6)."""
    empty = tmp_path / "empty_in"
    empty.mkdir()
    stream = ingest.read_events_stream(spark, str(empty))
    assert stream.isStreaming
    assert set(["timestamp", "tag", "value", "event_time"]) <= set(stream.columns)


def test_streaming_rollup_matches_batch_twin(spark, sf_dir, tmp_path):
    stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
    rolled = ingest.windowed_rollup_stream(stream)
    q = (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    from timeseries_db_spark.operators.rollup import window_rollup

    batch = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in window_rollup(events_as_tsdb(spark, sf_dir)).collect()
    }
    # append mode emits only watermark-closed windows; the final window may
    # be withheld. Everything emitted must match the batch result exactly.
    assert set(got) <= set(batch)
    assert len(got) >= 0.9 * len(batch)
    for k, v in got.items():
        assert v[0] == batch[k][0]
        assert abs(v[1] - batch[k][1]) < 1e-6
