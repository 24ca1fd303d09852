"""Derivative analytics (point deltas, bucketed rate) vs DuckDB oracles
on the events tsdb view."""

from __future__ import annotations

from timeseries_db_spark.operators.analytics import (
    point_deltas,
    point_deltas_scalable,
    point_deltas_sql,
    rate_per_bucket,
    rate_per_bucket_sql,
)
from timeseries_db_spark.sources.tables import events_as_tsdb

from tests.oracle import check_against_duckdb

EVENTS_TSDB = (
    'SELECT epoch_ms(ts) AS "timestamp", event_type AS tag, value FROM events'
)


def test_point_deltas_match_oracle(spark, sf_dir):
    df = point_deltas(events_as_tsdb(spark, sf_dir))
    check_against_duckdb(df, point_deltas_sql(EVENTS_TSDB), sf_dir)


def test_point_deltas_scalable_matches_oracle(spark, sf_dir):
    # same oracle as the plain window variant; coarse AND fine buckets —
    # the 1-minute grid leaves many (tag, bucket) slots empty, exercising
    # the previous-NON-EMPTY-bucket stitch
    for bucket_ms in (6 * 3_600_000, 60_000):
        df = point_deltas_scalable(
            events_as_tsdb(spark, sf_dir), bucket_ms=bucket_ms
        )
        check_against_duckdb(df, point_deltas_sql(EVENTS_TSDB), sf_dir)


def test_point_deltas_scalable_single_row_tag(spark):
    one = spark.createDataFrame(
        [(1_000, "a", 5.0), (7_200_000, "a", 9.0), (500, "b", 1.0)],
        "timestamp long, tag string, value double",
    )
    rows = {
        (r["tag"], r["timestamp"]): (r["dv"], r["dt_ms"])
        for r in point_deltas_scalable(one, bucket_ms=3_600_000).collect()
    }
    assert rows[("a", 1_000)] == (None, None)  # first point of its tag
    assert rows[("a", 7_200_000)] == (4.0, 7_199_000)  # across empty bucket
    assert rows[("b", 500)] == (None, None)


def test_rate_per_bucket_matches_oracle(spark, sf_dir):
    df = rate_per_bucket(events_as_tsdb(spark, sf_dir), bucket_ms=6 * 3_600_000)
    check_against_duckdb(
        df, rate_per_bucket_sql(EVENTS_TSDB, bucket_ms=6 * 3_600_000), sf_dir
    )


def test_single_point_bucket_rate_is_null(spark):
    one = spark.createDataFrame(
        [(1_000, "a", 5.0), (2_000, "a", 9.0)],
        "timestamp long, tag string, value double",
    )
    # bucket of 1 ms puts each point alone → NULL rate
    rows = rate_per_bucket(one, bucket_ms=1).collect()
    assert all(r["rate_per_s"] is None for r in rows)
    # both points in one wide bucket → (9-5)/1s
    rows = rate_per_bucket(one, bucket_ms=10_000).collect()
    assert [r["rate_per_s"] for r in rows] == [4.0]


def test_zscore_outliers_flags_known_outlier(spark):
    """A planted 100.0 among 0/1s is the only |z| >= 2.5 row; its z is
    the closed-form (100 - mean) / sd."""
    from timeseries_db_spark.operators.analytics import zscore_outliers

    vals = [0.0, 1.0] * 10 + [100.0]
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    t = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    out = zscore_outliers(t, threshold=2.5).collect()
    assert [(r["tag"], r["timestamp"], r["value"]) for r in out] == [
        ("a", 20, 100.0)
    ]
    import math

    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum(v * v for v in vals) / n - mean * mean)
    assert abs(out[0]["z"] - round((100.0 - mean) / sd, 4)) < 1e-9


def test_zscore_outliers_constant_tag_excluded(spark):
    """sd = 0 (all-constant tag) must yield no rows — not a divide-by-zero
    NaN/Inf flood — while a mixed tag in the same frame still flags."""
    from timeseries_db_spark.operators.analytics import zscore_outliers

    rows = [(i, "const", 5.0) for i in range(10)]
    rows += [(i, "mixed", 0.0) for i in range(10)] + [(99, "mixed", 50.0)]
    t = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    out = zscore_outliers(t, threshold=2.5).collect()
    assert {r["tag"] for r in out} == {"mixed"}
    assert [(r["timestamp"], r["value"]) for r in out] == [(99, 50.0)]


def test_rolling_avg_window_boundaries(spark):
    """Trailing [ts - W, ts] frame: a point exactly W earlier is
    INCLUDED (inclusive lower bound), one at W+1 excluded; peers at the
    current instant are included; other tags invisible."""
    from timeseries_db_spark.operators.analytics import rolling_avg

    rows = [
        (0, "a", 10.0),
        (1000, "a", 20.0),   # exactly W before 2000
        (2000, "a", 30.0),
        (2000, "b", 99.0),   # other tag, same instant
        (3001, "a", 40.0),   # 2000 is within [2001, 3001]? no: 2000 < 2001
    ]
    t = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    out = {
        (r["tag"], r["timestamp"]): (r["roll_avg"], r["roll_cnt"])
        for r in rolling_avg(t, window_ms=1000).collect()
    }
    assert out[("a", 0)] == (10.0, 1)
    assert out[("a", 1000)] == (15.0, 2)       # 0 is exactly W earlier
    assert out[("a", 2000)] == (25.0, 2)       # {20, 30}; 0 aged out
    assert out[("a", 3001)] == (40.0, 1)       # 2000 < 3001 - 1000
    assert out[("b", 2000)] == (99.0, 1)


def test_rolling_avg_matches_sql_twin(spark, sf_dir):
    from tests.oracle import duck_connect, assert_same
    from timeseries_db_spark.operators.analytics import (
        rolling_avg,
        rolling_avg_sql,
    )
    from timeseries_db_spark.registry import EVENTS_T
    from timeseries_db_spark.sources.tables import events_as_tsdb

    con = duck_connect(sf_dir)
    exp = con.execute(rolling_avg_sql(EVENTS_T)).df()
    assert_same(rolling_avg(events_as_tsdb(spark, sf_dir)), exp)


def test_rolling_avg_scalable_matches_plain(spark, sf_dir):
    """Prefix-sum-difference form == sliding-window form, bit-exact, for
    window/bucket combinations that exercise empty buckets, windows
    spanning several buckets, and windows smaller than a bucket."""
    from timeseries_db_spark.operators.analytics import (
        rolling_avg,
        rolling_avg_scalable,
    )
    from timeseries_db_spark.sources.fixture import timeseries_fixture

    t = timeseries_fixture(spark, 5_000)
    for window_ms, bucket_ms in ((1000, 300), (250, 1000), (997, 1009)):
        plain = {
            (r["tag"], r["timestamp"]): (r["roll_avg"], r["roll_cnt"])
            for r in rolling_avg(t, window_ms=window_ms).collect()
        }
        scal = {
            (r["tag"], r["timestamp"]): (r["roll_avg"], r["roll_cnt"])
            for r in rolling_avg_scalable(
                t, window_ms=window_ms, bucket_ms=bucket_ms
            ).collect()
        }
        assert scal == plain, (window_ms, bucket_ms)
        assert len(plain) == 5_000


def test_rolling_avg_scalable_hypothesis_fuzz(spark):
    """Hypothesis sweep over tiny random series: the prefix-sum
    difference must equal the sliding frame for any timestamps —
    INCLUDING duplicate (tag, timestamp) rows, where the peer-inclusive
    RANGE cumulative is what keeps the two forms identical
    (code-review r8) — and any window/bucket sizes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from timeseries_db_spark.operators.analytics import (
        rolling_avg,
        rolling_avg_scalable,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=300),
                st.sampled_from(["a", "b"]),
                st.integers(min_value=-5, max_value=5),
            ),
            min_size=1,
            max_size=12,
        ),
        window_ms=st.integers(min_value=1, max_value=100),
        bucket_ms=st.integers(min_value=1, max_value=100),
    )
    def run(pts, window_ms, bucket_ms):
        t = spark.createDataFrame(
            [(ts, tag, float(v)) for ts, tag, v in pts],
            "timestamp long, tag string, value double",
        )
        key = lambda r: (r["tag"], r["timestamp"])  # noqa: E731
        plain = {
            key(r): (r["roll_avg"], r["roll_cnt"])
            for r in rolling_avg(t, window_ms=window_ms).collect()
        }
        scal = {
            key(r): (r["roll_avg"], r["roll_cnt"])
            for r in rolling_avg_scalable(
                t, window_ms=window_ms, bucket_ms=bucket_ms
            ).collect()
        }
        assert scal == plain

    run()


def test_window_funnel_hand_scenarios(spark, tmp_path):
    """Hand-built event log with known funnel levels: completed chains,
    window expiry, out-of-order steps, chain restarts (a later s1 start
    succeeds where the first fails), strictly-after semantics for
    same-timestamp events, and users with no start event."""
    import pandas as pd

    from timeseries_db_spark.operators.rollup import window_funnel

    W = 1000  # 1s funnel horizon
    rows = [
        # u1: full chain inside the window -> 4
        (1, 0, "signup"), (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # u2: purchase lands past t1+W -> 3
        (2, 0, "signup"), (2, 100, "view"), (2, 200, "click"), (2, 1500, "purchase"),
        # u3: steps out of order (view before signup) -> 1
        (3, 100, "signup"), (3, 0, "view"),
        # u4: first chain dies (view too late) but a SECOND signup at
        # t=2000 completes -> 4 (max over starts)
        (4, 0, "signup"), (4, 2000, "signup"), (4, 2100, "view"),
        (4, 2200, "click"), (4, 2300, "purchase"),
        # u5: same-timestamp step is NOT strictly after -> 1
        (5, 0, "signup"), (5, 0, "view"),
        # u6: no signup at all -> 0
        (6, 0, "view"), (6, 100, "click"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ms", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ms"], unit="ms")
    pdf["value"] = 1.0
    pdf["event_id"] = range(len(pdf))
    pdf["props"] = "{}"
    out = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ev"))
    import glob, shutil
    shutil.copy(glob.glob(str(tmp_path / "ev") + "/part-*.parquet")[0], out)

    got = {
        r["user_id"]: r["level"]
        for r in window_funnel(spark, str(tmp_path), window_ms=W).collect()
    }
    assert got == {1: 4, 2: 3, 3: 1, 4: 4, 5: 1, 6: 0}, got


def test_window_funnel_matches_oracle(spark, sf_dir):
    from timeseries_db_spark.operators.rollup import (
        window_funnel,
        window_funnel_sql,
    )

    from tests.oracle import check_against_duckdb

    check_against_duckdb(
        window_funnel(spark, sf_dir), window_funnel_sql(), sf_dir
    )


def test_cohort_retention_planted(spark, tmp_path):
    """Planted events: user 1 first active day 0 and again day 2; user 2
    first active day 0 only; user 3 first active day 2. Cohort day-0 has
    size 2 with 100% at offset 0 and 50% at offset 2; cohort day-2 has
    size 1 at 100%."""
    import pandas as pd

    from timeseries_db_spark.operators.rollup import (
        cohort_retention,
        cohort_retention_sql,
    )

    DAY = 86_400_000
    rows = [
        (1, 0), (1, 5_000), (1, 2 * DAY + 7),   # dup day-0 activity collapses
        (2, 100),
        (3, 2 * DAY),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "tms"])
    pdf["ts"] = pd.to_datetime(pdf["tms"], unit="ms").astype("datetime64[us]")
    pdf["event_type"] = "x"
    pdf["value"] = 1.0
    pdf["event_id"] = range(len(pdf))
    pdf["props"] = "{}"
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        (r["cohort_day"], r["offset"]): (r["active_users"], r["retention"])
        for r in cohort_retention(spark, path).collect()
    }
    assert out == {
        (0, 0): (2.0, 1.0),
        (0, 2): (1.0, 0.5),
        (2, 0): (1.0, 1.0),
    }
    # cross-engine on the planted table
    import duckdb

    con = duckdb.connect()
    con.register("events", pdf[["user_id", "ts"]])
    ora = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(cohort_retention_sql()).fetchall()
    }
    assert ora == out


def test_seasonal_zscore_catches_what_global_misses(spark, tmp_path):
    """A value unremarkable globally but anomalous for ITS hour: plant a
    tag whose baseline differs by hour (hour 0 ~ 10, hour 1 ~ 100);
    a 40 at hour 0 is far outside hour-0's tight spread yet well inside
    the global (bimodal) spread — the seasonal detector flags it, the
    global one does not."""
    import pandas as pd

    from timeseries_db_spark.operators.analytics import (
        seasonal_zscore_outliers,
        zscore_outliers,
    )

    H = 3_600_000
    rows = []
    for d in range(20):  # 20 days of two-hour cycles
        base = d * 24 * H
        for i in range(5):
            rows.append((base + i * 60_000, "a", 10.0 + (i % 3)))          # hour 0
            rows.append((base + H + i * 60_000, "a", 100.0 + (i % 3)))     # hour 1
    rows.append((19 * 24 * H + 30 * 60_000, "a", 40.0))  # hour-0 anomaly
    tsdb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["timestamp", "tag", "value"])
    )
    seasonal = seasonal_zscore_outliers(tsdb, threshold=2.5).collect()
    glob = zscore_outliers(tsdb, threshold=2.5).collect()
    s_flagged = {(r["timestamp"], r["value"]) for r in seasonal}
    g_flagged = {(r["timestamp"], r["value"]) for r in glob}
    anom = (19 * 24 * H + 30 * 60_000, 40.0)
    assert anom in s_flagged
    assert anom not in g_flagged
    # and the planted regular points are NOT seasonal anomalies
    assert all(v == 40.0 for _, v in s_flagged)


def test_ewma_dyadic_matches_python_replay_and_halves(spark):
    """r9 dyadic EWMA: the windowed shift-divide fold must equal a
    pure-Python integer replay exactly (the bit-exactness claim), the
    newest point must carry weight 1/2 (a constant series smooths to
    value·(1 − 2⁻ⁿ) micro-units), and negative values truncate toward
    zero like DuckDB's ``//``."""
    from timeseries_db_spark.operators.analytics import EWMA_FP, ewma_dyadic

    rows = [
        (1_000 * i, "a", v)
        for i, v in enumerate([10.0, 2.5, -3.75, 0.00004, 7.0, 7.0, 7.0])
    ] + [(1_000 * i, "b", 5.0) for i in range(45)]  # > 40 lags: truncated tail
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    got = {
        (r["tag"], r["timestamp"]): r["ewma_fp"]
        for r in ewma_dyadic(df).collect()
    }

    hist: dict = {}
    for ts, tag, v in sorted(rows):
        x6 = round(v * EWMA_FP)
        h = hist.setdefault(tag, [])
        h.append(x6)
        frame = h[-40:]
        n = len(frame)

        def trunc_div(a, s):  # DuckDB //: toward zero
            q = abs(a) >> s
            return q if a >= 0 else -q

        expect = sum(trunc_div(x, n - i) for i, x in enumerate(frame))
        assert got[(tag, ts)] == expect, (tag, ts, got[(tag, ts)], expect)
    # a constant series saturates at value * (1 - 2^-n) micro-units
    assert got[("b", 44_000)] == sum(
        trunc_div(5 * EWMA_FP, s) for s in range(1, 41)
    )


def test_mad_robust_where_stddev_is_poisoned(spark):
    """r9 MAD: one wild value must leave the MAD (and the median)
    essentially unmoved while it inflates the stddev arbitrarily — the
    reason robust outlier detection exists; plus a closed-form check."""
    from timeseries_db_spark.operators.analytics import mad_by_tag

    base = [(1_000 * i, "a", float(10 + (i % 5))) for i in range(100)]
    clean = spark.createDataFrame(
        base, "timestamp long, tag string, value double"
    )
    poisoned = spark.createDataFrame(
        base + [(999_000, "a", 1e9)],
        "timestamp long, tag string, value double",
    )
    m_clean = mad_by_tag(clean).collect()[0]
    m_pois = mad_by_tag(poisoned).collect()[0]
    assert abs(m_clean["med"] - m_pois["med"]) <= 1.0
    assert abs(m_clean["mad"] - m_pois["mad"]) <= 1.0
    # while the stddev explodes by orders of magnitude
    from pyspark.sql import functions as F

    sd_clean = clean.agg(F.stddev("value")).first()[0]
    sd_pois = poisoned.agg(F.stddev("value")).first()[0]
    assert sd_pois > 1000 * sd_clean
    # closed form on a tiny series: values 1..5 → med 3, |x-3| = {2,1,0,1,2} → mad 1
    tiny = spark.createDataFrame(
        [(i, "t", float(i + 1)) for i in range(5)],
        "timestamp long, tag string, value double",
    )
    r = mad_by_tag(tiny).collect()[0]
    assert (r["med"], r["mad"]) == (3.0, 1.0)


def test_linfit_recovers_exact_line_and_is_one_aggregation(spark):
    """r9 OLS trend: points on an exact line recover slope (per hour)
    and intercept (at LINFIT_X0) exactly; noisy symmetric points fit
    the midline; the plan is ONE hash aggregation (no window/join)."""
    from timeseries_db_spark.operators.analytics import LINFIT_X0, linfit_by_tag

    H = 3_600_000
    rows = [(LINFIT_X0 + i * H, "line", 2.0 + 0.5 * i) for i in range(10)]
    # noise orthogonal to the linear term (+1,-1,-1,+1 per period-4:
    # Σ(x−x̄)e = 0 within each period) → slope EXACTLY 0, intercept 7
    e = (1.0, -1.0, -1.0, 1.0)
    rows += [
        (LINFIT_X0 + i * H, "flat", 7.0 + e[i % 4]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    out = {r["tag"]: (r["slope"], r["icept"]) for r in linfit_by_tag(df).collect()}
    assert out["line"] == (0.5, 2.0)
    assert out["flat"] == (0.0, 7.0)
    plan = linfit_by_tag(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan, plan


def test_tag_correlations_closed_forms(spark):
    """r9 cross-series correlation: a linear relation gives r = 1, its
    negation r = −1, and a linear-orthogonal pattern r = 0 — computed
    over hourly bucket means with exact-integer pair statistics."""
    from timeseries_db_spark.operators.analytics import tag_correlations

    H = 3_600_000
    rows = []
    for i in range(24):
        base = float(10 + (i * 7) % 13)
        rows += [
            (i * H, "a", base),
            (i * H + 1, "a", base),          # two points per bucket: means
            (i * H, "b", 2.0 * base + 1.0),  # exact linear in a's mean
            (i * H, "c", -base),
            (i * H, "d", (1.0, -1.0, -1.0, 1.0)[i % 4]),
        ]
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    got = {
        (r["tag_a"], r["tag_b"]): (r["r"], r["n"])
        for r in tag_correlations(df).collect()
    }
    assert got[("a", "b")] == (1.0, 24)
    assert got[("a", "c")] == (-1.0, 24)
    assert got[("b", "c")] == (-1.0, 24)
    # d's period-4 pattern is orthogonal to any linear trend but NOT to
    # a's arbitrary sequence — just assert it's far from ±1
    assert abs(got[("a", "d")][0]) < 0.9


def test_tag_correlations_max_tags_guard(spark):
    """r10 |tags|² guard: past the cap only the max_tags most ACTIVE
    tags (most populated buckets, tag-asc tiebreak) enter the pairing;
    under the cap results are unchanged from the unguarded form."""
    from timeseries_db_spark.operators.analytics import tag_correlations

    H = 3_600_000
    rows = []
    # t0..t7: tag t{k} is active in 8-k buckets → activity order is
    # t0 > t1 > ... > t7, no ties
    for k in range(8):
        for i in range(8 - k):
            rows.append((i * H, f"t{k}", float(10 + (i * 7 + k) % 13)))
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    capped = tag_correlations(df, max_tags=5).collect()
    tags_in = {r["tag_a"] for r in capped} | {r["tag_b"] for r in capped}
    assert tags_in <= {"t0", "t1", "t2", "t3", "t4"}, tags_in
    assert len(capped) <= 5 * 4 // 2
    # under the cap: identical to the unguarded result
    key = lambda rws: sorted(
        (r["tag_a"], r["tag_b"], r["r"], r["n"]) for r in rws
    )
    assert key(tag_correlations(df, max_tags=8).collect()) == key(
        tag_correlations(df, max_tags=None).collect()
    )
    # capped rows are a subset of the unguarded rows (values unchanged)
    full = key(tag_correlations(df, max_tags=None).collect())
    assert set(key(capped)) <= set(full)
    # activity tiebreak is deterministic: equal-activity tags keep
    # tag-asc order — u0/u1 tie at 2 buckets each, cap=1 keeps u0
    tie_rows = [(i * H, t, float(i + 1)) for t in ("u1", "u0") for i in range(2)]
    tie = spark.createDataFrame(
        tie_rows, "timestamp long, tag string, value double"
    )
    got = tag_correlations(tie, max_tags=3).collect()  # both kept: r exists
    assert {(r["tag_a"], r["tag_b"]) for r in got} == {("u0", "u1")}
    assert tag_correlations(tie, max_tags=1).collect() == []


def test_linfit_and_correlation_drop_degenerate_groups(spark):
    """A single-point tag has no slope; a constant series has no
    correlation — both must DROP (no engine-shaped NaN rows), matching
    the SQL twins' guards."""
    from timeseries_db_spark.operators.analytics import (
        linfit_by_tag,
        tag_correlations,
    )

    H = 3_600_000
    rows = [(0, "solo", 5.0)]  # one point → no slope
    rows += [(i * H, "const", 3.0) for i in range(6)]  # zero variance
    rows += [(i * H, "ok", 1.0 * i) for i in range(6)]
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    fits = {r["tag"] for r in linfit_by_tag(df).collect()}
    assert fits == {"const", "ok"}  # const has slope 0, solo dropped
    corr = {(r["tag_a"], r["tag_b"]) for r in tag_correlations(df).collect()}
    assert corr == set()  # const: zero variance; solo: n=1 bucket pair


def test_cusum_reflection_identity_matches_recursion(spark):
    """r14: the CUSUM chart — the window-expressible reflection form
    S_i = C_i - min(0, min C_j) must equal the textbook recursion
    S_i = max(0, S_{i-1} + d_i) on a hand-built series with planted
    level shifts; alarm counts/first-crossings/fingerprints follow."""
    from timeseries_db_spark.operators import analytics as A

    base = 1_700_000_000_000
    vals = [10.0] * 20 + [40.0] * 15 + [10.0] * 20 + [-25.0] * 12
    rows = [
        (base + i * 60_000, "m", v) for i, v in enumerate(vals)
    ] + [(base + i * 60_000, "flat", 5.0) for i in range(30)]
    df = spark.createDataFrame(rows, "timestamp long, tag string, value double")
    kappa, h = 3.0, 50.0
    got = {
        r["tag"]: r.asDict()
        for r in A.cusum_by_tag(df, kappa=kappa, h=h).collect()
    }
    # pure-python recursion reference for tag m
    mu = sum(vals) / len(vals)
    sp = sn = 0.0
    n_pos = n_neg = 0
    first_pos = first_neg = None
    fp_pos = fp_neg = 0
    for i, v in enumerate(vals):
        ts = base + i * 60_000
        sp = max(0.0, sp + (v - mu - kappa))
        sn = max(0.0, sn + (-(v - mu) - kappa))
        if sp > h:
            n_pos += 1
            first_pos = first_pos or ts
            fp_pos += ts % 1_000_000_000
        if sn > h:
            n_neg += 1
            first_neg = first_neg or ts
            fp_neg += ts % 1_000_000_000
    g = got["m"]
    assert (g["n_pos"], g["n_neg"]) == (n_pos, n_neg)
    assert (g["first_pos_ts"], g["first_neg_ts"]) == (first_pos, first_neg)
    assert (g["fp_pos"], g["fp_neg"]) == (fp_pos, fp_neg)
    assert n_pos > 0 and n_neg > 0  # both shifts genuinely alarmed
    # a constant series never alarms on either side
    f = got["flat"]
    assert (f["n_pos"], f["n_neg"]) == (0, 0)
    assert f["first_pos_ts"] is None and f["fp_pos"] is None


def test_fused_delta_ewma_bit_equals_separate_ops(spark, sf_dir):
    """r18 fold: the gate entry computes delta+ewma in ONE window pass
    (delta_ewma_fused) — its columns must be bit-identical to the two
    separate operators, and the plan must carry exactly ONE Window over
    one Exchange (the fold's whole point)."""
    import pandas as pd

    from timeseries_db_spark.operators import analytics as A

    t = events_as_tsdb(spark, sf_dir)
    fused = A.delta_ewma_fused(t).toPandas().sort_values(
        ["tag", "timestamp"]
    ).reset_index(drop=True)
    sep_d = point_deltas(t).toPandas().sort_values(
        ["tag", "timestamp"]
    ).reset_index(drop=True)
    sep_e = A.ewma_dyadic(t).toPandas().sort_values(
        ["tag", "timestamp"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        fused[["timestamp", "tag", "value", "dv", "dt_ms"]],
        sep_d[["timestamp", "tag", "value", "dv", "dt_ms"]],
    )
    pd.testing.assert_frame_equal(
        fused[["timestamp", "tag", "value", "ewma_fp"]],
        sep_e[["timestamp", "tag", "value", "ewma_fp"]],
    )
    plan = A.delta_ewma_fused(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan[:3000]


def test_fused_zscore_seasonal_bit_equals_separate_ops(spark, sf_dir):
    """r18 fold: one (tag, hod) aggregation + a window rollup over the
    tiny stats frame must reproduce BOTH moment levels bit-identically
    (decimal partial sums are exact and associative)."""
    import pandas as pd

    from timeseries_db_spark.operators import analytics as A

    t = events_as_tsdb(spark, sf_dir)
    fused = A.zscore_seasonal_fused(t, threshold=2.5).toPandas()
    got_g = (
        fused[fused.keep_global][["tag", "timestamp", "value", "z_global"]]
        .rename(columns={"z_global": "z"})
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    want_g = (
        A.zscore_outliers(t, threshold=2.5)
        .toPandas()[["tag", "timestamp", "value", "z"]]
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_g, want_g)
    got_h = (
        fused[fused.keep_seasonal][
            ["tag", "timestamp", "value", "hod", "z_seasonal"]
        ]
        .rename(columns={"z_seasonal": "z"})
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    want_h = (
        A.seasonal_zscore_outliers(t, threshold=2.5)
        .toPandas()[["tag", "timestamp", "value", "hod", "z"]]
        .sort_values(["tag", "timestamp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_h, want_h)
