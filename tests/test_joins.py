"""Point-in-interval (range) join: bucketed equi-join equivalence vs the
naive theta join, pair uniqueness across bucket sizes, and the no-
nested-loop plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_db_spark.operators.joins import (
    interval_join,
    maintenance_window_stats,
    maintenance_window_stats_sql,
)


def _pairs(df):
    return {
        (r["tag"], r["timestamp"], r["lo_ms"], r["hi_ms"]) for r in df.collect()
    }


def test_interval_join_matches_theta_join(spark):
    """Bucketed plan == naive theta join for overlapping intervals,
    boundary timestamps (lo inclusive, hi exclusive), bucket-straddling
    spans, and any bucket size."""
    points = spark.createDataFrame(
        [(t, "a", float(t)) for t in (0, 5, 10, 15, 20, 25, 99)]
        + [(10, "b", 1.0)],
        "timestamp long, tag string, value double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0, 10),    # [0, 10): hits 0, 5 — NOT 10
            ("a", 10, 11),   # [10, 11): hits exactly 10
            ("a", 5, 30),    # overlapping, straddles buckets: 5..25
            ("b", 0, 100),
        ],
        "tag string, lo_ms long, hi_ms long",
    )
    expected = _pairs(
        points.join(intervals, "tag").filter(
            (F.col("timestamp") >= F.col("lo_ms"))
            & (F.col("timestamp") < F.col("hi_ms"))
        )
    )
    assert expected  # fixture sanity
    for bucket_ms in (1, 7, 16, 1000):
        got_df = interval_join(points, intervals, bucket_ms=bucket_ms)
        got = got_df.collect()
        assert len(got) == len(set(map(tuple, got))), "duplicate pairs"
        assert _pairs(got_df) == expected, bucket_ms


def test_interval_join_plan_is_equi_join(spark):
    """The point of the operator: the physical plan must be a hash/merge
    EQUI join on (key, bucket) — never BroadcastNestedLoop or a
    cartesian product, which is what a raw theta join degenerates to."""
    points = spark.createDataFrame(
        [(t, "a", 1.0) for t in range(50)],
        "timestamp long, tag string, value double",
    )
    intervals = spark.createDataFrame(
        [("a", 0, 25)], "tag string, lo_ms long, hi_ms long"
    )
    plan = interval_join(points, intervals, bucket_ms=10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan


def test_maintenance_window_stats_matches_oracle(spark, sf_dir):
    from tests.oracle import check_against_duckdb
    from timeseries_db_spark.registry import EVENTS_T, HI, LO
    from timeseries_db_spark.sources.tables import events_as_tsdb

    check_against_duckdb(
        maintenance_window_stats(events_as_tsdb(spark, sf_dir), lo=LO, hi=HI),
        maintenance_window_stats_sql(EVENTS_T, lo=LO, hi=HI),
        sf_dir,
    )


def test_interval_join_hypothesis_fuzz(spark):
    """Hypothesis sweep: random point sets, random (possibly inverted,
    overlapping, empty, or bucket-straddling) intervals, random bucket
    size — the bucketed decomposition must equal the theta join exactly,
    with no duplicate pairs, every time."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ts = st.integers(min_value=-50, max_value=200)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        pts=st.lists(ts, min_size=1, max_size=15),
        ivs=st.lists(st.tuples(ts, ts), min_size=1, max_size=6),
        bucket_ms=st.integers(min_value=1, max_value=64),
        two_tags=st.booleans(),
    )
    def run(pts, ivs, bucket_ms, two_tags):
        # value = row index: every input row distinct, so "no duplicate
        # pairs" is meaningful even when timestamps repeat
        points = spark.createDataFrame(
            [
                (t, "b" if two_tags and i % 2 else "a", float(i))
                for i, t in enumerate(pts)
            ],
            "timestamp long, tag string, value double",
        )
        intervals = spark.createDataFrame(
            # inverted (lo > hi) intervals are legal input: empty match set
            [("a", min(lo, hi), max(lo, hi)) if lo <= hi else ("a", lo, hi)
             for lo, hi in ivs],
            "tag string, lo_ms long, hi_ms long",
        )
        def rows(df):
            return sorted(
                (r["tag"], r["timestamp"], r["value"], r["lo_ms"], r["hi_ms"])
                for r in df.collect()
            )

        expected = rows(
            points.join(intervals, "tag").filter(
                (F.col("timestamp") >= F.col("lo_ms"))
                & (F.col("timestamp") < F.col("hi_ms"))
            )
        )
        got = rows(interval_join(points, intervals, bucket_ms=bucket_ms))
        # multiset equality: duplicate INPUT rows may duplicate output
        # rows (correct join semantics); the decomposition itself must
        # add none
        assert got == expected

    run()


def test_interval_join_null_bounds_and_unbounded_span(spark):
    """NULL interval bounds match nothing — the same semantics as the
    naive theta join, whose NULL comparisons are false (so the bucketed
    decomposition stays equivalent); an effectively-unbounded span
    raises a clear executor-side error before exploding into millions
    of bucket rows."""
    import pytest

    points = spark.createDataFrame(
        [(5, "a", 1.0)], "timestamp long, tag string, value double"
    )
    null_iv = spark.createDataFrame(
        [("a", None, 10), ("a", 0, 10)], "tag string, lo_ms long, hi_ms long"
    )
    rows = interval_join(points, null_iv, bucket_ms=10).collect()
    assert [(r["lo_ms"], r["hi_ms"]) for r in rows] == [(0, 10)]
    huge_iv = spark.createDataFrame(
        [("a", 0, 10**12)], "tag string, lo_ms long, hi_ms long"
    )
    with pytest.raises(Exception, match="raise bucket_ms"):
        interval_join(points, huge_iv, bucket_ms=10).collect()
    # a REVERSED huge interval must not build a descending 10^11-element
    # sequence (review r8) — it matches nothing, like the theta join
    rev_iv = spark.createDataFrame(
        [("a", 10**12, 0), ("a", 0, 10)], "tag string, lo_ms long, hi_ms long"
    )
    rows = interval_join(points, rev_iv, bucket_ms=10).collect()
    assert [(r["lo_ms"], r["hi_ms"]) for r in rows] == [(0, 10)]
    # valid intervals keep working through the guarded path
    ok = spark.createDataFrame(
        [("a", 0, 10)], "tag string, lo_ms long, hi_ms long"
    )
    assert interval_join(points, ok, bucket_ms=10).count() == 1


def test_interval_overlap_join_matches_theta(spark):
    """Bucketed interval×interval overlap == naive theta join across
    bucket sizes: pairs straddling several shared buckets emit ONCE
    (first-overlap-bucket rule), half-open boundaries exclude
    touch-only pairs, keyed and keyless modes both work."""
    from timeseries_db_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 50), ("a", 49, 60), ("b", 0, 100)],
        "tag string, l_lo long, l_hi long",
    )
    right = spark.createDataFrame(
        [("a", 9, 30), ("a", 10, 12), ("a", 60, 70), ("b", 90, 200)],
        "tag string, r_lo long, r_hi long",
    )
    rr = right.withColumnRenamed("tag", "rtag")
    expected = sorted(
        (r["l_lo"], r["l_hi"], r["r_lo"], r["r_hi"],
         min(r["l_hi"], r["r_hi"]) - max(r["l_lo"], r["r_lo"]))
        for r in left.join(rr, F.col("tag") == F.col("rtag"))
        .filter(
            F.greatest("l_lo", "r_lo") < F.least("l_hi", "r_hi")
        )
        .collect()
    )
    assert expected  # sanity: includes multi-bucket straddlers
    # [49,60) x [60,70) touch but do not overlap (half-open) — absent
    assert (49, 60, 60, 70, 0) not in expected
    for bucket_ms in (1, 7, 16, 1000):
        got = sorted(
            (r["l_lo"], r["l_hi"], r["r_lo"], r["r_hi"], r["overlap_ms"])
            for r in interval_overlap_join(
                left, right.withColumnRenamed("tag", "tag"),
                on="tag", bucket_ms=bucket_ms,
            ).collect()
        )
        assert got == expected, bucket_ms
    # keyless mode: cross-key pairs now eligible
    keyless = interval_overlap_join(
        left.drop("tag"), right.drop("tag"), bucket_ms=16
    ).collect()
    assert len(keyless) >= len(expected)
    assert len(keyless) == len(set(map(tuple, keyless)))  # still no dups


def test_session_window_overlap_matches_oracle(spark, sf_dir):
    from timeseries_db_spark.operators.joins import (
        session_window_overlap,
        session_window_overlap_sql,
    )
    from timeseries_db_spark.registry import HI, LO
    from tests.oracle import check_against_duckdb

    check_against_duckdb(
        session_window_overlap(spark, sf_dir, lo=LO, hi=HI),
        session_window_overlap_sql(lo=LO, hi=HI),
        sf_dir,
    )


def test_interval_overlap_join_plan_is_equi_join(spark):
    from timeseries_db_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [("a", 0, 25)], "tag string, l_lo long, l_hi long"
    )
    right = spark.createDataFrame(
        [("a", 10, 40)], "tag string, r_lo long, r_hi long"
    )
    plan = interval_overlap_join(
        left, right, on="tag", bucket_ms=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan


def test_interval_overlap_join_hypothesis_fuzz(spark):
    """Hypothesis sweep for the overlap join: random interval sets on
    both sides (inverted, empty, touching, nested, bucket-straddling),
    random bucket size — bucketed decomposition == theta join exactly,
    no duplicate pairs, every time."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from timeseries_db_spark.operators.joins import interval_overlap_join

    ts = st.integers(min_value=-50, max_value=200)
    iv = st.tuples(ts, ts)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lhs=st.lists(iv, min_size=1, max_size=6),
        rhs=st.lists(iv, min_size=1, max_size=6),
        bucket_ms=st.integers(min_value=1, max_value=64),
        two_tags=st.booleans(),
    )
    def run(lhs, rhs, bucket_ms, two_tags):
        left = spark.createDataFrame(
            [
                ("b" if two_tags and i % 2 else "a", lo, hi, float(i))
                for i, (lo, hi) in enumerate(lhs)
            ],
            "tag string, l_lo long, l_hi long, l_id double",
        )
        right = spark.createDataFrame(
            [("a", lo, hi, float(i)) for i, (lo, hi) in enumerate(rhs)],
            "tag string, r_lo long, r_hi long, r_id double",
        )

        rr = right.withColumnRenamed("tag", "rtag")
        expected = sorted(
            (
                r["l_id"], r["r_id"],
                min(r["l_hi"], r["r_hi"]) - max(r["l_lo"], r["r_lo"]),
            )
            for r in left.join(rr, F.col("tag") == F.col("rtag"))
            .filter(F.greatest("l_lo", "r_lo") < F.least("l_hi", "r_hi"))
            .collect()
        )
        got = sorted(
            (r["l_id"], r["r_id"], r["overlap_ms"])
            for r in interval_overlap_join(
                left, right, on="tag", bucket_ms=bucket_ms
            ).collect()
        )
        assert got == expected

    run()
