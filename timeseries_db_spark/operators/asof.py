"""As-of (most-recent-prior) join — the canonical time-series operator
Spark has no built-in for (the reference has no joins at all, SURVEY.md
§2.6; this is a driver north-star op).

Semantics: for each left row, attach the latest right row whose time is
``<=`` the left row's time, per join key — DuckDB's ``ASOF JOIN``, which
is exactly the oracle used in the gate.

Spark-first plan — union + ordered window, not a join:

1. tag right rows 0 and left rows 1, union them on (key, time, payload);
2. one window per key ordered by (time, side) — right rows sort before
   left rows at equal times, giving ``<=`` semantics;
3. ``last(payload, ignorenulls=True)`` carries the most recent right
   payload forward onto every left row;
4. keep the left rows.

Cost: ONE shuffle of |L|+|R| rows by key — versus a naive range join's
|L|×|R| per-key blowup (Catalyst can't prune a "latest prior" theta
join). Skew note: a whole key lands in one task, same as any
partition-by-key window; :func:`asof_join_scalable` removes that by
bucketing the time axis — closings per (key, bucket), openings carried
across buckets by a recursive bucket-level as-of, final window per
(key, bucket) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round, duck_div


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    payload: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right``
    payload at-or-before its time, matched on ``on``. Left rows earlier
    than any right row get NULL payload (ASOF LEFT JOIN)."""
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload column(s) {sorted(clash)} already exist on the left "
            "side — alias the right payload before joining"
        )
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


HOUR_MS = 3_600_000


def hourly_avg(tsdb: DataFrame) -> DataFrame:
    """Per-tag hourly average — the right side of the enrichment query.
    Averaged via an exact DECIMAL sum so the value is partition-order
    independent (see the rollup note on .00005 rounding boundaries)."""
    return (
        tsdb.groupBy(
            # duck_div, not cast(/): exact-integer division matching the
            # DuckDB twin's `//` (no double-division ulp loss at 2^53+)
            (duck_div(F.col("timestamp"), HOUR_MS) * HOUR_MS).alias("hr"),
            "tag",
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,10)")).alias("_dsum"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "hr",
            "tag",
            # exact decimal sum → shared double → DuckDB-identical round
            # (functions/numeric.py explains both float hazards)
            duck_round(F.col("_dsum").cast("double") / F.col("_n"), 4).alias(
                "hr_avg"
            ),
        )
    )


def enrich_with_hourly_avg(tsdb: DataFrame) -> DataFrame:
    """Each row + the most recent hourly per-tag average as of its
    timestamp (every row's own hour qualifies, so the payload is total)."""
    return asof_join(
        tsdb,
        hourly_avg(tsdb),
        on="tag",
        left_ts="timestamp",
        right_ts="hr",
        payload=["hr_avg"],
    )


def asof_join_scalable(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    payload: list[str],
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """:func:`asof_join` with the whole-key-in-one-task skew removed:

    1. bucket both sides on the time axis;
    2. per (key, bucket) compute the *closing* right payload
       (``max_by(payload, ts)`` — a tiny table, one row per non-empty
       bucket);
    3. each left bucket's *opening* payload = the most recent closing
       from a strictly earlier bucket — itself an as-of join, but at
       bucket granularity over the tiny closings table, so the plain
       union+window :func:`asof_join` is reused recursively;
    4. the final window runs per (key, bucket) over that bucket's rows
       plus one injected opening row — no task ever sees more than one
       bucket of one key.

    Identical results to :func:`asof_join` for any ``bucket_ms`` (tested);
    pick it so one key-bucket fits an executor core."""
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload column(s) {sorted(clash)} already exist on the left "
            "side — alias the right payload before joining"
        )
    sentinel = -(1 << 62)  # opening rows sort before any real timestamp
    lb = left.withColumn("_bkt", duck_div(F.col(left_ts), bucket_ms))
    rb = right.withColumn("_bkt", duck_div(F.col(right_ts), bucket_ms))

    closings = rb.groupBy(on, "_bkt").agg(
        *[F.expr(f"max_by({c}, {right_ts})").alias(c) for c in payload]
    )
    # opening per left bucket: probe at bucket-1 → matches closings with
    # _cbkt <= _bkt-1, i.e. STRICTLY earlier buckets
    lbuckets = (
        lb.select(on, "_bkt").distinct().withColumn("_probe", F.col("_bkt") - 1)
    )
    openings = asof_join(
        lbuckets,
        closings.withColumnRenamed("_bkt", "_cbkt"),
        on=on,
        left_ts="_probe",
        right_ts="_cbkt",
        payload=payload,
    ).drop("_probe")

    # composite partition key (key, bucket) for the in-bucket pass;
    # unit-separator delimiter so ("a",12) and ("a1",2) cannot collide
    def pk(df: DataFrame) -> DataFrame:
        return df.withColumn("_pk", F.concat_ws("\x1f", F.col(on), F.col("_bkt")))

    lcols = left.columns
    l2 = pk(lb)
    r2 = pk(rb).select("_pk", F.col(right_ts).alias("_rts"), *payload)
    open2 = pk(openings).select(
        "_pk", F.lit(sentinel).alias("_rts"), *payload
    )
    out = asof_join(
        l2,
        r2.unionByName(open2),
        on="_pk",
        left_ts=left_ts,
        right_ts="_rts",
        payload=payload,
    )
    return out.select(*lcols, *payload)


def gap_fill(
    tsdb: DataFrame, *, lo: int, hi: int, step_ms: int
) -> DataFrame:
    """Resample to a regular grid with forward-fill: for every tag and
    every grid instant in ``[lo, hi]`` (step ``step_ms``), the latest
    value at-or-before that instant (NULL before a tag's first point) —
    i.e. ``asof_join(grid, data)``. The grid is generated, never stored
    (``sequence`` + ``explode`` — |tags|×|points| rows, embarrassingly
    parallel). Duplicate (tag, timestamp) points collapse to ``max`` first
    so the fill is deterministic in both engines."""
    points = tsdb.groupBy("tag", F.col("timestamp").alias("src_ts")).agg(
        F.max("value").alias("value")
    )
    tags = tsdb.select("tag").distinct()
    if lo > hi:
        # Spark's sequence() rejects descending bounds with a positive
        # step; the SQL twin's generate_series yields zero rows — match it
        grid = tags.select(
            "tag", F.lit(None).cast("long").alias("timestamp")
        ).filter(F.lit(False))
    else:
        grid = tags.select(
            "tag",
            F.explode(
                F.sequence(F.lit(lo), F.lit(hi), F.lit(step_ms))
            ).alias("timestamp"),
        )
    return asof_join(
        grid, points, on="tag", left_ts="timestamp", right_ts="src_ts",
        payload=["value"],
    )


def interpolate_linear(
    tsdb: DataFrame, *, lo: int, hi: int, step_ms: int
) -> DataFrame:
    """Resample to a regular grid with *linear interpolation*: for every
    tag and grid instant, the value linearly interpolated between the
    nearest observation at-or-before and the nearest at-or-after; outside
    a tag's observed range it degrades to nearest-neighbor fill (the
    one-sided value), NULL only for tags with no points at all.

    Spark-first, ONE pass (r8 — replaced the original two as-of passes):
    grid instants and observations union into one stream, and BOTH
    directions are ``last(ignorenulls)`` over a RUNNING range frame —
    the backward pass on the ASC (tag, ts) ordering, the forward pass
    on the DESC ordering (see the in-code note: a symmetric
    [current..unboundedFollowing] frame is O(n²) per partition in
    Spark). RANGE (not ROWS) frames make an observation at exactly a
    grid instant visible to both directions regardless of peer order.
    One hash exchange total, two sorts over it (plan-asserted in
    ``tests/test_plans.py``) vs the two shuffles + two sorts + double
    grid carry of the two-pass form; the grid is generated,
    never stored (see :func:`gap_fill`). Skew: per-tag windows — at
    100 TB apply the bucketed recursion of :func:`asof_join_scalable`
    per direction, exactly as for :func:`gap_fill`.

    The interpolation arithmetic ``p + (n - p) * (t - pt) / (nt - pt)``
    runs identically in the DuckDB twin on identical inputs (grid
    instants and at-most-one point per (tag, ts) after the max-collapse),
    so the rounded doubles hash-match.
    """
    from pyspark.sql import Window

    points = tsdb.groupBy("tag", F.col("timestamp").alias("src_ts")).agg(
        F.max("value").alias("value")
    )
    tags = tsdb.select("tag").distinct()
    if lo > hi:
        return tags.select(
            "tag",
            F.lit(None).cast("long").alias("timestamp"),
            F.lit(None).cast("double").alias("value"),
        ).filter(F.lit(False))
    grid = tags.select(
        "tag",
        F.explode(F.sequence(F.lit(lo), F.lit(hi), F.lit(step_ms))).alias(
            "timestamp"
        ),
        F.lit(None).cast("long").alias("pt_ts"),
        F.lit(None).cast("double").alias("pt_v"),
        F.lit(True).alias("is_grid"),
    )
    obs = points.select(
        "tag",
        F.col("src_ts").alias("timestamp"),
        F.col("src_ts").alias("pt_ts"),
        F.col("value").alias("pt_v"),
        F.lit(False).alias("is_grid"),
    )
    # BOTH directions as RUNNING (unboundedPreceding..currentRow) range
    # frames — the forward pass simply runs over the DESC ordering.
    # Spark evaluates a running frame in O(1) per row, but a
    # [currentRow, unboundedFollowing] frame re-scans the remainder of
    # the partition for EVERY row (O(n²) per tag — measured 47 s vs
    # ~1 s at sf0.1), so the naive symmetric formulation is a
    # scale-killer. The two orderings share one hash exchange on tag;
    # only the sort runs twice.
    asc = Window.partitionBy("tag").orderBy(F.col("timestamp").asc())
    desc = Window.partitionBy("tag").orderBy(F.col("timestamp").desc())
    w_back = asc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = desc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    both = (
        grid.unionByName(obs)
        .withColumn("p_ts", F.last("pt_ts", ignorenulls=True).over(w_back))
        .withColumn("p_v", F.last("pt_v", ignorenulls=True).over(w_back))
        .withColumn("n_ts", F.last("pt_ts", ignorenulls=True).over(w_fwd))
        .withColumn("n_v", F.last("pt_v", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_grid"))
    )
    t, pt, pv = F.col("timestamp"), F.col("p_ts"), F.col("p_v")
    nt, nv = F.col("n_ts"), F.col("n_v")
    interp = pv + (nv - pv) * (t - pt) / (nt - pt)
    value = (
        F.when(pt.isNotNull() & nt.isNotNull() & (nt != pt), interp)
        .when(pt.isNotNull(), pv)
        .otherwise(nv)
    )
    return both.select(
        "tag", "timestamp", duck_round(value, 4).alias("value")
    )


def gapfill_interp_fused(
    tsdb: DataFrame, *, lo: int, hi: int, step_ms: int
) -> DataFrame:
    """:func:`gap_fill` and :func:`interpolate_linear` from ONE
    union+window pass (r18, guide §2.4): the forward-fill leg's value
    IS the backward carry ``p_v`` the interpolation already computes —
    gap_fill's as-of window (ROWS frame, right rows sorting first at
    equal times) and the interpolation's backward RANGE frame see the
    same at-most-one max-collapsed point per (tag, ts), so the carried
    doubles are identical (pytest-pinned bit-equality). Separately the
    two legs each paid the points aggregation, the tags distinct, the
    grid generation and a full union+window exchange; fused they share
    all four. Returns (tag, timestamp, ffill_value, interp_value), one
    row per grid instant."""
    points = tsdb.groupBy("tag", F.col("timestamp").alias("src_ts")).agg(
        F.max("value").alias("value")
    )
    tags = tsdb.select("tag").distinct()
    if lo > hi:
        return tags.select(
            "tag",
            F.lit(None).cast("long").alias("timestamp"),
            F.lit(None).cast("double").alias("ffill_value"),
            F.lit(None).cast("double").alias("interp_value"),
        ).filter(F.lit(False))
    grid = tags.select(
        "tag",
        F.explode(F.sequence(F.lit(lo), F.lit(hi), F.lit(step_ms))).alias(
            "timestamp"
        ),
        F.lit(None).cast("long").alias("pt_ts"),
        F.lit(None).cast("double").alias("pt_v"),
        F.lit(True).alias("is_grid"),
    )
    obs = points.select(
        "tag",
        F.col("src_ts").alias("timestamp"),
        F.col("src_ts").alias("pt_ts"),
        F.col("value").alias("pt_v"),
        F.lit(False).alias("is_grid"),
    )
    asc = Window.partitionBy("tag").orderBy(F.col("timestamp").asc())
    desc = Window.partitionBy("tag").orderBy(F.col("timestamp").desc())
    w_back = asc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = desc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    both = (
        grid.unionByName(obs)
        .withColumn("p_ts", F.last("pt_ts", ignorenulls=True).over(w_back))
        .withColumn("p_v", F.last("pt_v", ignorenulls=True).over(w_back))
        .withColumn("n_ts", F.last("pt_ts", ignorenulls=True).over(w_fwd))
        .withColumn("n_v", F.last("pt_v", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_grid"))
    )
    t, pt, pv = F.col("timestamp"), F.col("p_ts"), F.col("p_v")
    nt, nv = F.col("n_ts"), F.col("n_v")
    interp = pv + (nv - pv) * (t - pt) / (nt - pt)
    value = (
        F.when(pt.isNotNull() & nt.isNotNull() & (nt != pt), interp)
        .when(pt.isNotNull(), pv)
        .otherwise(nv)
    )
    return both.select(
        "tag",
        "timestamp",
        pv.alias("ffill_value"),
        duck_round(value, 4).alias("interp_value"),
    )


def interpolate_linear_sql(
    table_sql: str, *, lo: int, hi: int, step_ms: int
) -> str:
    """DuckDB twin: two ASOF LEFT JOINs — ``<=`` for the prior point,
    ``>=`` for the next (DuckDB ASOF picks the nearest match under
    either inequality direction)."""
    return f"""
        WITH t AS ({table_sql}),
        pts AS (SELECT tag, "timestamp" AS src_ts, max(value) AS value
                FROM t GROUP BY 1, 2),
        grid AS (SELECT tag, g AS ts
                 FROM (SELECT DISTINCT tag FROM t),
                      generate_series({lo}, {hi}, {step_ms}) s(g)),
        prev AS (
            SELECT grid.tag, grid.ts, pts.src_ts AS p_ts, pts.value AS p_v
            FROM grid ASOF LEFT JOIN pts
              ON grid.tag = pts.tag AND pts.src_ts <= grid.ts
        ),
        nxt AS (
            SELECT grid.tag, grid.ts, pts.src_ts AS n_ts, pts.value AS n_v
            FROM grid ASOF LEFT JOIN pts
              ON grid.tag = pts.tag AND pts.src_ts >= grid.ts
        )
        SELECT prev.tag, prev.ts AS "timestamp",
               round(CASE
                   WHEN p_ts IS NOT NULL AND n_ts IS NOT NULL AND n_ts != p_ts
                       THEN p_v + (n_v - p_v) * (prev.ts - p_ts) / (n_ts - p_ts)
                   WHEN p_ts IS NOT NULL THEN p_v
                   ELSE n_v
               END, 4) + 0.0 AS value
        FROM prev JOIN nxt ON prev.tag = nxt.tag AND prev.ts = nxt.ts
    """


def gap_fill_sql(table_sql: str, *, lo: int, hi: int, step_ms: int) -> str:
    return f"""
        WITH t AS ({table_sql}),
        pts AS (SELECT tag, "timestamp" AS src_ts, max(value) AS value
                FROM t GROUP BY 1, 2),
        grid AS (SELECT tag, g AS "timestamp"
                 FROM (SELECT DISTINCT tag FROM t),
                      generate_series({lo}, {hi}, {step_ms}) s(g))
        SELECT grid.tag, grid."timestamp", pts.value
        FROM grid ASOF LEFT JOIN pts
          ON grid.tag = pts.tag AND pts.src_ts <= grid."timestamp"
    """


def enrich_with_hourly_avg_sql(table_sql: str) -> str:
    return f"""
        WITH t AS ({table_sql}),
        r AS (SELECT hr, tag, round(dsum::DOUBLE / n, 4) + 0.0 AS hr_avg
              FROM (SELECT ("timestamp" // {HOUR_MS}) * {HOUR_MS} AS hr, tag,
                           sum(value::DECIMAL(38,10)) AS dsum, count(*) AS n
                    FROM t GROUP BY 1, 2))
        SELECT t."timestamp", t.tag, t.value, r.hr_avg
        FROM t ASOF LEFT JOIN r ON t.tag = r.tag AND r.hr <= t."timestamp"
    """
