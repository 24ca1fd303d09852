"""applyInPandasWithState running totals: time-ordered micro-batches must
reproduce the batch window-function twin exactly."""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from timeseries_db_spark.operators.analytics import (
    running_totals,
    running_totals_scalable,
)
from timeseries_db_spark.sources.fixture import timeseries_fixture
from timeseries_db_spark.streaming.stateful import running_totals_stream

N = 4_000


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["tag", "timestamp"]).reset_index(drop=True).round(4)
    )


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    pdf = timeseries_fixture(spark, N).toPandas().sort_values("timestamp")
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    half = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:half]), str(in_dir / "b0.parquet"))
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    pq.write_table(pa.Table.from_pandas(pdf.iloc[half:]), str(in_dir / "b1.parquet"))

    stream = (
        spark.readStream.schema("timestamp long, tag string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = (
        running_totals_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rt_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _norm(spark.sql("SELECT * FROM rt_out").toPandas())
    exp = _norm(running_totals(timeseries_fixture(spark, N)).toPandas())
    assert len(got) == N
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_scalable_plan_matches_plain_window(spark):
    fx = timeseries_fixture(spark, N)
    got = _norm(running_totals_scalable(fx, bucket_ms=500).toPandas())
    exp = _norm(running_totals(fx).toPandas())
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_watermark_drops_late_duplicates(spark, tmp_path):
    """dedup_stream: a key redelivered in a later batch, with event time
    older than the advanced watermark, must not re-emit (the streaming
    analog of validInsert within the horizon)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time as _time

    from timeseries_db_spark.streaming.ingest import dedup_stream

    in_dir = tmp_path / "late_in"
    in_dir.mkdir()
    base = 1704067200000

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["timestamp", "tag", "value"])
        # microsecond precision: pandas' default ns would write
        # TIMESTAMP(NANOS), which Spark won't read as TimestampType
        pdf["event_time"] = pd.to_datetime(pdf["timestamp"], unit="ms").astype(
            "datetime64[us]"
        )
        pq.write_table(pa.Table.from_pandas(pdf), str(in_dir / name))

    hour = 3_600_000
    # batch 0: two keys 30min apart — the watermark (1h delay) stays
    # BELOW the first key, so its dedup state is retained
    write("b0.parquet", [(base, "a", 1.0), (base + hour // 2, "b", 2.0)])
    _time.sleep(1.1)
    # batch 1: exact duplicate of the first key (still in-horizon)
    # plus one genuinely new key
    write("b1.parquet", [(base, "a", 1.0), (base + hour // 2 + 1, "c", 3.0)])

    stream = (
        spark.readStream.schema(
            "timestamp long, tag string, value double, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["timestamp"], r["tag"])
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    assert (base, "a") in got and (base + hour // 2, "b") in got
    assert (base + hour // 2 + 1, "c") in got
    # the duplicate emitted exactly once
    rows = spark.sql(
        f"SELECT count(*) c FROM late_out WHERE timestamp = {base} AND tag = 'a'"
    ).first()["c"]
    assert rows == 1


def test_sessionize_stream_matches_batch_twin(spark, tmp_path):
    """Two time-ordered micro-batches of gappy per-tag events: every
    emitted session must be watermark-final and identical to the batch
    twin; sessions the watermark has not yet finalized are withheld —
    never wrong."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time as _time

    from timeseries_db_spark.streaming.stateful import (
        sessionize_stream,
        sessionize_tsdb_batch,
    )

    base = 1704067200000
    minute = 60_000
    gap = 5 * minute
    rows = []
    # tag "x": three sessions (events 0-2min, 10-11min, 30min)
    for off in (0, 1, 2, 10, 11, 30):
        rows.append((base + off * minute, "x", 1.0))
    # tag "y": two sessions (0min, 20-22min)
    for off in (0, 20, 21, 22):
        rows.append((base + off * minute, "y", 2.0))
    rows.sort()

    pdf = pd.DataFrame(rows, columns=["timestamp", "tag", "value"])
    pdf["event_time"] = pd.to_datetime(pdf["timestamp"], unit="ms").astype(
        "datetime64[us]"
    )
    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    half = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:half]), str(in_dir / "b0.parquet"))
    _time.sleep(1.1)
    pq.write_table(pa.Table.from_pandas(pdf.iloc[half:]), str(in_dir / "b1.parquet"))

    stream = (
        spark.readStream.schema(
            "timestamp long, tag string, value double, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
        .withWatermark("event_time", "1 minute")
    )
    q = (
        sessionize_stream(stream, gap_ms=gap)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["tag"], r["session_start"]): (r["session_end"], r["n"], r["total"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch_df = spark.createDataFrame(
        pdf[["timestamp", "tag", "value"]], "timestamp long, tag string, value double"
    )
    exp = {
        (r["tag"], r["session_start"]): (r["session_end"], r["n"], r["total"])
        for r in sessionize_tsdb_batch(batch_df, gap_ms=gap).collect()
    }
    # everything emitted must be a correct, complete session
    for k, v in got.items():
        assert exp[k] == v, (k, v, exp.get(k))
    # sessions the watermark finalized during the run must have emitted:
    # during batch 2 the watermark sits at 10min (batch-1 max 11min − 1min
    # delay), which finalizes both tags' first sessions (end+gap ≤ 10min)
    assert {("x", base), ("y", base)} <= set(got)


def test_sessionize_stream_merges_in_horizon_out_of_order(spark, tmp_path):
    """An out-of-order (but in-watermark) event arriving in a later batch
    must merge into the session the batch twin would assign it to — the
    eager-finalization bug this pins: sessions may only close once the
    watermark passes end+gap."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time as _time

    from timeseries_db_spark.streaming.stateful import sessionize_stream

    base = 1704067200000
    minute = 60_000
    gap = 5 * minute

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["timestamp", "tag", "value"])
        pdf["event_time"] = pd.to_datetime(pdf["timestamp"], unit="ms").astype(
            "datetime64[us]"
        )
        pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "in" / name))

    (tmp_path / "in").mkdir()
    # batch 0: events at 0 and 10min → watermark after b0 = 9min
    write("b0.parquet", [(base, "x", 1.0), (base + 10 * minute, "x", 1.0)])
    _time.sleep(1.1)
    # batch 1: out-of-order 9.5min (ahead of the 9min watermark → must be
    # honored) + a far event at 30min
    write(
        "b1.parquet",
        [(base + 9 * minute + 30_000, "x", 1.0), (base + 30 * minute, "x", 1.0)],
    )
    _time.sleep(1.1)
    # batch 2: advances the watermark past the merged session's end+gap so
    # it finalizes (watermark during this batch = 29min from batch 1)
    write("b2.parquet", [(base + 100 * minute, "x", 1.0)])

    stream = (
        spark.readStream.schema(
            "timestamp long, tag string, value double, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in"))
        .withWatermark("event_time", "1 minute")
    )
    q = (
        sessionize_stream(stream, gap_ms=gap)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ooo_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["session_start"], r["session_end"]): r["n"]
        for r in spark.sql("SELECT * FROM ooo_out").collect()
    }
    # the 9.5min event merged into the 10min session (n=2), not its own
    assert got[(base + 9 * minute + 30_000, base + 10 * minute)] == 2
    # and the first session is the lone 0min event
    assert got[(base, base)] == 1


def test_running_totals_correct_across_arrow_chunks(spark, tmp_path):
    """Force each group's micro-batch to span multiple Arrow chunks
    (maxRecordsPerBatch << group size): the fold must sort the WHOLE
    batch, not each chunk, to keep cumulative order."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        pdf = timeseries_fixture(spark, 2_000).toPandas()
        # deliver DESCENDING by timestamp so chunk-local sorting would
        # fold later chunks (earlier event times) at the wrong positions
        pdf = pdf.sort_values("timestamp", ascending=False)
        in_dir = tmp_path / "chunks_in"
        in_dir.mkdir()
        pq.write_table(pa.Table.from_pandas(pdf), str(in_dir / "b0.parquet"))

        stream = spark.readStream.schema(
            "timestamp long, tag string, value double"
        ).parquet(str(in_dir))
        q = (
            running_totals_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("chunk_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _norm(spark.sql("SELECT * FROM chunk_out").toPandas())
        exp = _norm(running_totals(timeseries_fixture(spark, 2_000)).toPandas())
        assert len(got) == 2_000
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
