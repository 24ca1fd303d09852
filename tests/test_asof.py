"""asof_join semantics: most-recent-prior match, <= at equal times, NULL
before the first right row, per-key isolation."""

from __future__ import annotations

from timeseries_db_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(5, "a", 1.0), (10, "a", 2.0), (20, "a", 3.0), (10, "b", 4.0)],
        "timestamp long, tag string, value double",
    )
    right = spark.createDataFrame(
        [(10, "a", 100.0), (15, "a", 150.0), (99, "b", 900.0)],
        "hr long, tag string, hr_avg double",
    )
    out = {
        (r["timestamp"], r["tag"]): r["hr_avg"]
        for r in asof_join(
            left, right, on="tag", left_ts="timestamp", right_ts="hr",
            payload=["hr_avg"],
        ).collect()
    }
    assert out == {
        (5, "a"): None,      # before first right row
        (10, "a"): 100.0,    # equal time matches (<=)
        (20, "a"): 150.0,    # most recent prior, not first
        (10, "b"): None,     # right rows of other keys invisible
    }


def test_scalable_asof_matches_plain(spark):
    """Bucketed as-of must equal the plain union+window plan on data with
    empty buckets, multiple keys, and openings that carry across several
    bucket boundaries."""
    from timeseries_db_spark.operators.asof import asof_join_scalable
    from timeseries_db_spark.sources.fixture import timeseries_fixture

    from pyspark.sql import functions as F

    fx = timeseries_fixture(spark, 3_000)
    # left: every 7th row; right: sparse per-tag checkpoints every ~500ms,
    # so many left buckets have no in-bucket right row
    left = fx.filter(F.col("timestamp") % 7 == 0)
    right = (
        fx.filter(F.col("timestamp") % 500 == 0)
        .select("tag", F.col("timestamp").alias("rts"), F.col("value").alias("ckpt"))
    )
    kwargs = dict(on="tag", left_ts="timestamp", right_ts="rts", payload=["ckpt"])
    plain = {
        (r["timestamp"], r["tag"]): r["ckpt"]
        for r in asof_join(left, right, **kwargs).collect()
    }
    for bucket_ms in (100, 997, 10_000):
        scal = {
            (r["timestamp"], r["tag"]): r["ckpt"]
            for r in asof_join_scalable(
                left, right, bucket_ms=bucket_ms, **kwargs
            ).collect()
        }
        assert scal == plain, bucket_ms


def test_interpolate_linear_semantics(spark):
    """Closed-form check of the two-pass interpolation: interior grid
    instants interpolate between the bracketing points, instants outside
    a tag's observed range degrade to nearest-neighbor fill, and an
    exact-hit instant returns the observed value (nt == pt branch)."""
    from timeseries_db_spark.operators.asof import interpolate_linear

    t = spark.createDataFrame(
        [(10, "a", 1.0), (30, "a", 5.0), (20, "b", 7.0)],
        "timestamp long, tag string, value double",
    )
    out = {
        (r["tag"], r["timestamp"]): r["value"]
        for r in interpolate_linear(t, lo=0, hi=40, step_ms=10).collect()
    }
    assert out == {
        ("a", 0): 1.0,    # before first point → nearest (forward) fill
        ("a", 10): 1.0,   # exact hit (prev == next point)
        ("a", 20): 3.0,   # interior: 1 + (5-1) * (20-10)/(30-10)
        ("a", 30): 5.0,   # exact hit
        ("a", 40): 5.0,   # after last point → nearest (backward) fill
        ("b", 0): 7.0,
        ("b", 10): 7.0,
        ("b", 20): 7.0,
        ("b", 30): 7.0,
        ("b", 40): 7.0,
    }


def test_interpolate_linear_empty_grid(spark):
    """lo > hi must yield zero rows with the full (tag, timestamp, value)
    schema — matching the SQL twin's empty generate_series, not a Spark
    sequence() error."""
    from timeseries_db_spark.operators.asof import interpolate_linear

    t = spark.createDataFrame(
        [(10, "a", 1.0)], "timestamp long, tag string, value double"
    )
    out = interpolate_linear(t, lo=100, hi=0, step_ms=10)
    assert out.columns == ["tag", "timestamp", "value"]
    assert out.count() == 0


def test_interpolate_linear_matches_sql_twin(spark, sf_dir):
    """Engine-twin equivalence on real data (the gapfill_hourly interp
    leg's gate contract, pinned here at test scale)."""
    from tests.oracle import duck_connect, assert_same
    from timeseries_db_spark.operators.asof import (
        interpolate_linear,
        interpolate_linear_sql,
    )
    from timeseries_db_spark.registry import EVENTS_T, HI, LO
    from timeseries_db_spark.sources.tables import events_as_tsdb

    con = duck_connect(sf_dir)
    exp = con.execute(
        interpolate_linear_sql(EVENTS_T, lo=LO, hi=HI, step_ms=6 * 3_600_000)
    ).df()
    got = interpolate_linear(
        events_as_tsdb(spark, sf_dir), lo=LO, hi=HI, step_ms=6 * 3_600_000
    )
    assert_same(got, exp)


def test_gapfill_interp_fused_bit_equals_separate_ops(spark, sf_dir):
    """r18 fold: the gate entry computes ffill+interp from ONE
    union+window pass — both legs' values must be bit-identical to the
    separate operators (the ffill value is the interpolation's backward
    carry p_v), including the empty-grid guard."""
    import pandas as pd

    from timeseries_db_spark.operators import asof
    from timeseries_db_spark.sources.tables import events_as_tsdb

    t = events_as_tsdb(spark, sf_dir)
    lo, hi, step = 1_704_067_200_000, 1_704_153_600_000, 3_600_000
    fused = (
        asof.gapfill_interp_fused(t, lo=lo, hi=hi, step_ms=step)
        .toPandas()
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    ffill = (
        asof.gap_fill(t, lo=lo, hi=hi, step_ms=step)
        .toPandas()
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    interp = (
        asof.interpolate_linear(t, lo=lo, hi=hi, step_ms=step)
        .toPandas()
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fused[["tag", "timestamp", "ffill_value"]].rename(
            columns={"ffill_value": "value"}
        ),
        ffill[["tag", "timestamp", "value"]],
    )
    pd.testing.assert_frame_equal(
        fused[["tag", "timestamp", "interp_value"]].rename(
            columns={"interp_value": "value"}
        ),
        interp[["tag", "timestamp", "value"]],
    )
    empty = asof.gapfill_interp_fused(t, lo=10, hi=0, step_ms=step)
    assert empty.count() == 0
    assert empty.columns == ["tag", "timestamp", "ffill_value", "interp_value"]
