"""Analytic (window-function) operators over the tsdb shape.

The reference has no window functions at all (SURVEY.md §2.6) — these are
driver north-star additions. The headline op is the per-tag *running
total*, the batch twin of the stateful streaming operator in
``streaming/stateful.py``.

Scale design: ``Window.partitionBy("tag")`` puts an entire tag's history
in one task — with four reference-style tags over 100 TB that is a
straight skew disaster. :func:`running_totals_scalable` is the two-pass
re-expression: bucket the time axis, aggregate per (tag, bucket) (tiny),
window over buckets for per-bucket starting offsets, then window only
*within* each (tag, bucket) partition — parallelism = tags × buckets, and
no task ever sees more than one bucket of one tag. Both variants return
identical results (same oracle), so the gate checks the scalable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round, duck_div

RUN_COLS = ("timestamp", "tag", "value", "run_cnt", "run_sum")


def running_totals(tsdb: DataFrame) -> DataFrame:
    """Per-tag cumulative count and sum ordered by timestamp (assumes the
    tsdb uniqueness invariant — one row per (timestamp, tag) — so the
    order, and therefore the cumulative, is total)."""
    w = (
        Window.partitionBy("tag")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tsdb.select(
        "timestamp",
        "tag",
        "value",
        F.count(F.lit(1)).over(w).cast("double").alias("run_cnt"),
        # DECIMAL cumsum: exact and association-independent, so the plain,
        # scalable, and oracle variants are bit-identical by construction
        # (a double cumsum would tie the result to summation order)
        F.round(F.sum(F.col("value").cast("decimal(38,10)")).over(w), 4)
        .cast("double")
        .alias("run_sum"),
    )


def _cumulatives_scalable(
    tsdb: DataFrame, bucket_ms: int, *, peer_inclusive: bool = False
) -> DataFrame:
    """Per-row UNROUNDED cumulative (count, DECIMAL sum) per tag, via the
    skew-safe two-pass scheme (module docstring): per-(tag, bucket)
    partials, offsets over the tiny partial table, in-bucket windows
    only. Shared by :func:`running_totals_scalable` (which rounds for
    output) and :func:`rolling_avg_scalable` (which DIFFERENCES the raw
    decimals — rounding first would break exactness).

    ``peer_inclusive``: with duplicate (tag, timestamp) rows, a ROWS
    running frame splits the tied peers in arbitrary order — fine for
    running totals (which document the tsdb key-uniqueness assumption
    and whose plain twin uses ROWS too), WRONG for the rolling-average
    difference, whose plain/oracle twin is a RANGE frame that always
    sees tied peers together (code-review r8). True switches the
    in-bucket window to the RANGE running frame, making every tied
    row carry the full-peer cumulative deterministically.
    Returns (timestamp, tag, value, c_cnt:long, c_sum:decimal)."""
    # duck_div: exact-integer division matching the DuckDB `//` twins
    bucketed = tsdb.withColumn("bucket", duck_div(F.col("timestamp"), bucket_ms))

    # pass 1: per-(tag, bucket) partials — one row per bucket, tiny;
    # decimal sums keep every downstream total exact (see running_totals)
    partials = bucketed.groupBy("tag", "bucket").agg(
        F.count(F.lit(1)).alias("b_cnt"),
        F.sum(F.col("value").cast("decimal(38,10)")).alias("b_sum"),
    )
    # offsets: everything cumulative *before* this bucket; the window runs
    # over the tiny partial table, not the data
    wb = (
        Window.partitionBy("tag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = partials.select(
        "tag",
        "bucket",
        (F.sum("b_cnt").over(wb) - F.col("b_cnt")).alias("off_cnt"),
        (F.sum("b_sum").over(wb) - F.col("b_sum")).alias("off_sum"),
    )

    # pass 2: window only within (tag, bucket); offsets broadcast-join back
    ww = Window.partitionBy("tag", "bucket").orderBy("timestamp")
    ww = (
        ww.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        if peer_inclusive
        else ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(offsets), on=["tag", "bucket"], how="inner")
        .select(
            "timestamp",
            "tag",
            "value",
            (F.col("off_cnt") + F.count(F.lit(1)).over(ww)).alias("c_cnt"),
            (
                F.coalesce(
                    F.col("off_sum"), F.lit(0).cast("decimal(38,10)")
                )
                + F.sum(F.col("value").cast("decimal(38,10)")).over(ww)
            ).alias("c_sum"),
        )
    )


def running_totals_scalable(tsdb: DataFrame, bucket_ms: int = 3_600_000) -> DataFrame:
    """Two-pass running totals that never materializes a whole tag in one
    task (see module docstring). ``bucket_ms`` sizes the inner partitions;
    at 100 TB pick it so one (tag, bucket) fits an executor core's memory.
    """
    cum = _cumulatives_scalable(tsdb, bucket_ms)
    return cum.select(
        "timestamp",
        "tag",
        "value",
        F.col("c_cnt").cast("double").alias("run_cnt"),
        F.round(F.col("c_sum"), 4).cast("double").alias("run_sum"),
    )


def point_deltas(tsdb: DataFrame) -> DataFrame:
    """Per-tag consecutive differences — the discrete derivative every
    monitoring stack asks for first: (timestamp, tag, value, dv, dt_ms),
    NULL on each tag's first point. One keyed window (lag), no second
    shuffle. Skew note: whole-tag-per-task, same as any per-key lag; for
    the 100 TB few-tags case, bucket first and stitch bucket boundaries
    with a per-(tag,bucket) first/last exchange (the running-totals
    two-pass pattern applies verbatim)."""
    w = Window.partitionBy("tag").orderBy("timestamp")
    return tsdb.select(
        "timestamp",
        "tag",
        "value",
        duck_round(F.col("value") - F.lag("value").over(w), 4).alias("dv"),
        (F.col("timestamp") - F.lag("timestamp").over(w)).alias("dt_ms"),
    )


def point_deltas_scalable(tsdb: DataFrame, bucket_ms: int = 3_600_000) -> DataFrame:
    """Two-pass re-expression of :func:`point_deltas` that never puts a
    whole tag in one task (the running-totals pattern, see module
    docstring): window within (tag, bucket), then stitch each bucket's
    first row to the previous non-empty bucket's last point via a tiny
    per-bucket boundary table. Identical output → same oracle."""
    bucketed = tsdb.withColumn("bucket", duck_div(F.col("timestamp"), bucket_ms))

    # boundary: each non-empty bucket's last point; the lag over THIS
    # tiny table (one row per non-empty bucket) finds the previous
    # non-empty bucket's last point, so empty buckets stitch correctly
    last = bucketed.groupBy("tag", "bucket").agg(
        F.max("timestamp").alias("_t"),
        # backticks, not quotes: see rate_per_bucket
        F.expr("max_by(value, `timestamp`)").alias("_v"),
    )
    wb = Window.partitionBy("tag").orderBy("bucket")
    prev = last.select(
        "tag",
        "bucket",
        F.lag("_t").over(wb).alias("prev_t"),
        F.lag("_v").over(wb).alias("prev_v"),
    )

    ww = Window.partitionBy("tag", "bucket").orderBy("timestamp")
    lag_t = F.lag("timestamp").over(ww)
    lag_v = F.lag("value").over(ww)
    first = F.row_number().over(ww) == 1
    pt = F.when(first, F.col("prev_t")).otherwise(lag_t)
    pv = F.when(first, F.col("prev_v")).otherwise(lag_v)
    return (
        bucketed.join(F.broadcast(prev), on=["tag", "bucket"], how="inner")
        .select(
            "timestamp",
            "tag",
            "value",
            duck_round(F.col("value") - pv, 4).alias("dv"),
            (F.col("timestamp") - pt).alias("dt_ms"),
        )
    )


def point_deltas_sql(table_sql: str) -> str:
    return f"""
        WITH t AS ({table_sql})
        SELECT "timestamp", tag, value,
               round(value - lag(value) OVER w, 4) + 0.0 AS dv,
               "timestamp" - lag("timestamp") OVER w AS dt_ms
        FROM t
        WINDOW w AS (PARTITION BY tag ORDER BY "timestamp")
    """


def rate_per_bucket(tsdb: DataFrame, bucket_ms: int = 3_600_000) -> DataFrame:
    """Per-(tag, bucket) average rate of change — (last-first)/(t_last -
    t_first) in value units per second, NULL for single-point buckets.
    One hash aggregation with ``min_by``/``max_by`` monoids (map-side
    partials combine, no window, no skew: a bucket never exceeds its
    time span regardless of tag hotness)."""
    bucketed = tsdb.withColumn(
        "bucket_start", duck_div(F.col("timestamp"), bucket_ms) * bucket_ms
    )
    agg = bucketed.groupBy("tag", "bucket_start").agg(
        # backticks: inside F.expr a double-quoted word is a STRING
        # literal, which would order min_by by a constant
        F.expr("min_by(value, `timestamp`)").alias("_first_v"),
        F.expr("max_by(value, `timestamp`)").alias("_last_v"),
        F.min("timestamp").alias("_first_t"),
        F.max("timestamp").alias("_last_t"),
    )
    span_s = (F.col("_last_t") - F.col("_first_t")) / F.lit(1000.0)
    return agg.select(
        "tag",
        "bucket_start",
        duck_round(
            F.when(
                F.col("_last_t") > F.col("_first_t"),
                (F.col("_last_v") - F.col("_first_v")) / span_s,
            ),
            4,
        ).alias("rate_per_s"),
    )


def rate_per_bucket_sql(table_sql: str, bucket_ms: int = 3_600_000) -> str:
    return f"""
        WITH t AS ({table_sql}),
        g AS (
            SELECT tag, ("timestamp" // {bucket_ms}) * {bucket_ms} AS bucket_start,
                   min_by(value, "timestamp") AS fv,
                   max_by(value, "timestamp") AS lv,
                   min("timestamp") AS ft, max("timestamp") AS lt
            FROM t GROUP BY 1, 2
        )
        SELECT tag, bucket_start,
               round(CASE WHEN lt > ft THEN (lv - fv) / ((lt - ft) / 1000.0) END, 4)
                   + 0.0 AS rate_per_s
        FROM g
    """


def zscore_outliers(tsdb: DataFrame, threshold: float = 2.5) -> DataFrame:
    """Per-tag z-score anomaly detection: rows where
    ``|value - mean(tag)| / stddev_pop(tag) >= threshold``.

    Two-pass, skew-proof by construction: pass 1 is a hash aggregation
    to per-tag moments (one row per tag — tiny), pass 2 broadcasts the
    moments back onto the stream and filters. No window function, so no
    whole-tag-in-one-task hazard — at 100 TB this is a map-side-combined
    agg plus a map-only filtered scan, the cheapest possible shape.

    Determinism / oracle parity: the mean and E[x²] come from exact
    DECIMAL(38,10) sums (partition-order independent), so Spark and the
    DuckDB twin compute bit-identical doubles through the same
    ``E[x²] − mean²`` formula. That one-pass variance form trades the
    usual cancellation hazard for exactness — fine while ``value`` spans
    few orders of magnitude (fixture values are O(100)); for wild ranges
    switch the moment pass to a shifted sum. Returns
    ``(tag, timestamp, value, z)`` with z rounded to 4.
    """
    stats = tsdb.groupBy("tag").agg(
        F.sum(F.col("value").cast("decimal(38,10)")).alias("_s"),
        F.sum(
            (F.col("value") * F.col("value")).cast("decimal(38,10)")
        ).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_sq").cast("double") / F.col("_n") - mean * mean
    moments = stats.select(
        "tag",
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"),
    )
    z = (F.col("value") - F.col("_mean")) / F.col("_sd")
    return (
        tsdb.join(F.broadcast(moments), on="tag", how="inner")
        .filter((F.col("_sd") > 0) & (F.abs(z) >= F.lit(threshold)))
        .select(
            "tag", "timestamp", "value", duck_round(z, 4).alias("z")
        )
    )


def zscore_outliers_sql(table_sql: str, threshold: float = 2.5) -> str:
    return f"""
        WITH t AS ({table_sql}),
        s AS (
            SELECT tag,
                   sum(value::DECIMAL(38,10)) AS ds,
                   sum((value * value)::DECIMAL(38,10)) AS dsq,
                   count(*) AS n
            FROM t GROUP BY tag
        ),
        m AS (
            SELECT tag, ds::DOUBLE / n AS mean,
                   sqrt(greatest(dsq::DOUBLE / n - (ds::DOUBLE / n) * (ds::DOUBLE / n),
                                 0.0)) AS sd
            FROM s
        )
        SELECT t.tag, t."timestamp", t.value,
               round((t.value - m.mean) / m.sd, 4) + 0.0 AS z
        FROM t JOIN m ON t.tag = m.tag
        WHERE m.sd > 0 AND abs((t.value - m.mean) / m.sd) >= {threshold}
    """


def running_totals_sql(table_sql: str, where: str = "") -> str:
    """DuckDB oracle for both batch variants and the streaming operator."""
    return f"""
        WITH t AS ({table_sql})
        SELECT "timestamp", tag, value,
               CAST(count(*) OVER w AS DOUBLE) AS run_cnt,
               round(sum(value::DECIMAL(38,10)) OVER w, 4)::DOUBLE AS run_sum
        FROM t {where}
        WINDOW w AS (PARTITION BY tag ORDER BY "timestamp" ROWS UNBOUNDED PRECEDING)
    """


def rolling_avg(tsdb: DataFrame, window_ms: int = 3_600_000) -> DataFrame:
    """Per-point trailing time-window average: for every row, the mean
    of its tag's values over ``[ts - window_ms, ts]`` (both bounds
    inclusive — Spark ``rangeBetween`` and DuckDB ``RANGE ... PRECEDING``
    agree) plus the contributing row count. The other classic metrics
    window next to the cumulative :func:`running_totals`.

    Plan: ONE hash exchange on tag + one sort. Cost caveat: Spark
    aggregates have no inverse, so a sliding frame RE-AGGREGATES the
    in-frame buffer per row — O(rows-per-window) each, fine for sparse
    series, hostile for dense ones; :func:`rolling_avg_scalable` is the
    O(1)-per-row prefix-sum-difference form the gate checks (both are
    bit-identical — pytest). Determinism: the frame sum is an exact
    DECIMAL(38,10), so the mean is partition-order independent and
    engine-exact before the one rounded division.

    Skew: a whole tag sits in one task, like any per-key window; at
    100 TB apply the bucketed two-pass recipe of
    :func:`running_totals_scalable` — per-(tag, bucket) partials need
    only the previous ``window_ms`` of closing rows carried across the
    bucket boundary."""
    w = (
        Window.partitionBy("tag")
        .orderBy("timestamp")
        .rangeBetween(-window_ms, Window.currentRow)
    )
    dsum = F.sum(F.col("value").cast("decimal(38,10)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return tsdb.select(
        "timestamp",
        "tag",
        "value",
        duck_round(dsum.cast("double") / cnt, 4).alias("roll_avg"),
        cnt.alias("roll_cnt"),
    )


def rolling_avg_sql(table_sql: str, window_ms: int = 3_600_000) -> str:
    return f"""
        WITH t AS ({table_sql})
        SELECT "timestamp", tag, value,
               round(
                   (sum(value::DECIMAL(38,10)) OVER w)::DOUBLE
                   / (count(*) OVER w), 4
               ) + 0.0 AS roll_avg,
               (count(*) OVER w)::BIGINT AS roll_cnt
        FROM t
        WINDOW w AS (
            PARTITION BY tag ORDER BY "timestamp"
            RANGE BETWEEN {window_ms} PRECEDING AND CURRENT ROW
        )
    """


def rolling_avg_scalable(
    tsdb: DataFrame,
    window_ms: int = 3_600_000,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """:func:`rolling_avg` re-expressed as a PREFIX-SUM DIFFERENCE — the
    100 TB form. Spark evaluates a sliding RANGE frame by re-aggregating
    the in-frame buffer for every row (aggregates have no inverse), so
    the naive window costs O(rows-per-window) per row — fine for sparse
    series, quadratic-ish for dense ones (ms-resolution data puts
    millions of rows in a 1 h frame). Here instead:

    ``trailing[t-W, t] = cum(t) − cum(latest point with ts < t−W)``

    1. exact DECIMAL cumulatives via the skew-safe two-pass
       (:func:`_cumulatives_scalable` — shared with running totals);
    2. ONE bucketed as-of self-probe at ``t − W − 1`` fetches the
       cumulative just before the window opens (strictly-before via the
       integer-ms probe shift);
    3. two exact decimal subtractions per row.

    O(1) work per row regardless of window density, and every stage is
    the bucketed skew-safe variant. Decimal differences are exact, so
    the rounded mean is bit-identical to :func:`rolling_avg` and hashes
    against the same SQL-window oracle (gate-checked)."""
    from timeseries_db_spark.operators.asof import asof_join_scalable

    cum = _cumulatives_scalable(tsdb, bucket_ms, peer_inclusive=True)
    # the cumulative table feeds BOTH as-of sides (probe and lookup);
    # without this, Catalyst executes the whole two-pass window subtree
    # twice (no cross-branch CSE) — measured 2.2s -> 1.8s warm /
    # 5.1s -> 2.2s cold at sf0.1. One materialization of an
    # events-sized frame vs recomputing its most expensive pass:
    # linear either way, the checkpoint wins whenever the cumulative
    # pass costs more than a write+read (always, at any SF). At
    # cluster scale prefer reliable checkpointing (localCheckpoint
    # recomputes from scratch on executor loss).
    cum = cum.localCheckpoint(eager=True)
    probe = cum.withColumn("_probe", F.col("timestamp") - window_ms - 1)
    prev = asof_join_scalable(
        probe,
        cum.select(
            "tag",
            F.col("timestamp").alias("_cts"),
            F.col("c_cnt").alias("p_cnt"),
            F.col("c_sum").alias("p_sum"),
        ),
        on="tag",
        left_ts="_probe",
        right_ts="_cts",
        payload=["p_cnt", "p_sum"],
        bucket_ms=bucket_ms,
    )
    roll_cnt = F.col("c_cnt") - F.coalesce(F.col("p_cnt"), F.lit(0))
    roll_sum = F.col("c_sum") - F.coalesce(
        F.col("p_sum"), F.lit(0).cast("decimal(38,10)")
    )
    return prev.select(
        "timestamp",
        "tag",
        "value",
        duck_round(roll_sum.cast("double") / roll_cnt, 4).alias("roll_avg"),
        roll_cnt.cast("long").alias("roll_cnt"),
    )
