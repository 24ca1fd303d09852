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
