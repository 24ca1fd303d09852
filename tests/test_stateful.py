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
    # batch 0: two keys far apart in event time → watermark advances past
    # the first key once the batch closes
    write("b0.parquet", [(base, "a", 1.0), (base + 6 * hour, "b", 2.0)])
    _time.sleep(1.1)
    # batch 1: exact duplicate of the first key (late, behind watermark)
    # plus one genuinely new in-horizon key
    write("b1.parquet", [(base, "a", 1.0), (base + 6 * hour + 1, "c", 3.0)])

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
    assert (base, "a") in got and (base + 6 * hour, "b") in got
    assert (base + 6 * hour + 1, "c") in got
    # the duplicate emitted exactly once
    rows = spark.sql(
        f"SELECT count(*) c FROM late_out WHERE timestamp = {base} AND tag = 'a'"
    ).first()["c"]
    assert rows == 1
