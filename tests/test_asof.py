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
