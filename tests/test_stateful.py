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
