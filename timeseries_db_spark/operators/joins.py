"""Relational join queries over the driver's TPC-H-shaped tables.

The reference has no joins (one table exists — SURVEY.md §2.6); these
demonstrate the engine's general analytics surface and its scale posture:

* **dimension joins broadcast** — `nation`/`region`/`customer` are tiny
  next to `lineitem`/`orders`; `F.broadcast` pins the build side so the
  fact table streams map-side with no shuffle (`test_plans.py` asserts
  BroadcastHashJoin in the executed plan). At 100 TB the fact-side scan
  still prunes on pushed filters before the join.
* **fact-fact joins shuffle on the key** — `orders ⋈ lineitem` on
  orderkey; with both sides bucketed by orderkey at write time this
  becomes a zero-shuffle sort-merge join, and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_db_spark.sources.tables import load_table


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation gross revenue: lineitem ⋈ orders ⋈ customer ⋈ nation.
    The two dim joins broadcast; the orders⋈lineitem join shuffles on
    orderkey (the only big-data exchange in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.select("l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy("nation")
    )


REVENUE_BY_NATION_SQL = """
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY nation
"""


def top_orders_by_segment(
    spark: SparkSession, sf_dir: str, segment: str = "BUILDING", k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped: top-k orders by revenue within a customer segment.
    Deterministic top-k: ties broken by orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_mktsegment") == segment)
        .select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.select("l_orderkey", "l_extendedprice", "l_discount"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(k)
    )


def top_orders_by_segment_sql(segment: str = "BUILDING", k: int = 10) -> str:
    return f"""
        SELECT o_orderkey AS orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = '{segment}'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, orderkey ASC LIMIT {k}
    """


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue rolled up to region through the
    customer→nation→region dimension chain (all three broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.select("l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy("region")
    )


REVENUE_BY_REGION_SQL = """
    SELECT r_name AS region,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region
"""


def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand lineitem revenue and supplier balance context: covers the
    part and supplier dimensions (both broadcast against the fact scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_acctbal")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("double").alias("n_items"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_supp_bal"),
        )
        .orderBy("brand")
    )


PART_BRAND_STATS_SQL = """
    SELECT p_brand AS brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS DOUBLE) AS n_items,
           round(avg(s_acctbal), 4) AS avg_supp_bal
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand ORDER BY brand
"""


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str = "tag",
    point_ts: str = "timestamp",
    lo: str = "lo_ms",
    hi: str = "hi_ms",
    bucket_ms: int = 6 * 3_600_000,
) -> DataFrame:
    """Point-in-interval (range) join: every ``points`` row paired with
    every ``intervals`` row of the same key with ``lo <= ts < hi`` —
    the operator behind maintenance-window / experiment-cohort / SLA
    lookups that Spark has no native plan for (a raw theta join falls
    back to BroadcastNestedLoop, O(|P|·|I|) per key).

    Distributed plan: each interval EXPLODES to the time buckets it
    covers (replication = interval span / ``bucket_ms`` — bounded for
    bounded intervals), the points equi-join on (key, bucket) — a plain
    hash shuffle join Catalyst/AQE handle like any other — and the
    exact range predicate filters residually. A (point, interval) match
    shares exactly the point's bucket, so no pair duplicates and no
    dedup pass. Pick ``bucket_ms`` near the typical interval span: the
    replication factor stays O(1) while the join stays an equi-join.
    ``tests/test_plans.py`` asserts no nested-loop/cartesian node.

    Output: the point columns plus the interval's columns (caller
    projects). Both frames must share the ``on`` key column."""
    from timeseries_db_spark.functions.numeric import duck_div

    # Degenerate intervals are dropped BEFORE the explode: a NULL bound
    # or a reversed range (hi < lo) matches nothing under the residual
    # predicates — in BOTH this plan and the naive theta join (NULL
    # comparisons are false; ts >= lo AND ts < hi is unsatisfiable when
    # hi < lo) — and sequence(start, stop) with start > stop would
    # otherwise build a DESCENDING array of |span| elements (a reversed
    # 10^12 ms interval = a 10^11-element array → OOM, review r8).
    # The remaining hazard is a legitimately huge span (open-ended
    # "ongoing" windows): its bucket explode fans out to millions of
    # rows. Guard it executor-side, folded INTO the bucket expression so
    # column pruning cannot drop the check; callers clamp open ends to
    # their data horizon and/or raise bucket_ms.
    max_buckets = 100_000
    span_buckets = (
        duck_div(F.col(hi), bucket_ms) - duck_div(F.col(lo), bucket_ms) + 1
    )
    hi_b = F.when(
        span_buckets <= F.lit(max_buckets), duck_div(F.col(hi), bucket_ms)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval explodes to "),
                span_buckets,
                F.lit(f" bucket rows of {bucket_ms} ms (max {max_buckets}; lo="),
                F.col(lo),
                F.lit(", hi="),
                F.col(hi),
                F.lit("); raise bucket_ms or split the interval"),
            )
        )
    )
    iv = intervals.filter(F.col(hi) >= F.col(lo)).withColumn(
        "_b", F.explode(F.sequence(duck_div(F.col(lo), bucket_ms), hi_b))
    )
    pt = points.withColumn("_b", duck_div(F.col(point_ts), bucket_ms))
    return (
        pt.join(iv, on=[on, "_b"])
        .filter(
            (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
        )
        .drop("_b")
    )


DAY_MS = 86_400_000


def maintenance_window_stats(
    tsdb: DataFrame, *, lo: int, hi: int,
    win_start_h: int = 2, win_end_h: int = 8,
) -> DataFrame:
    """Per-(tag, day) point count + value sum inside a daily
    "maintenance window" [day+2h, day+8h) — the gate-shaped consumer of
    :func:`interval_join`: the interval table is generated closed-form
    (tags × UTC days of [lo, hi]), so a DuckDB theta-join oracle
    restates the result exactly."""
    from timeseries_db_spark.functions.numeric import duck_div, duck_round

    tags = tsdb.select("tag").distinct()
    day_lo, day_hi = lo // DAY_MS, hi // DAY_MS
    intervals = tags.select(
        "tag",
        F.explode(F.sequence(F.lit(day_lo), F.lit(day_hi))).alias("_day"),
    ).select(
        "tag",
        # sequence() of int literals yields int32 — widen BEFORE the
        # ms multiply or ANSI mode overflows
        (F.col("_day").cast("long") * DAY_MS + win_start_h * 3_600_000)
        .alias("lo_ms"),
        (F.col("_day").cast("long") * DAY_MS + win_end_h * 3_600_000)
        .alias("hi_ms"),
    )
    joined = interval_join(tsdb, intervals)
    return (
        joined.groupBy("tag", F.col("lo_ms").alias("win_start"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            duck_round(
                F.sum(F.col("value").cast("decimal(38,10)")).cast("double"), 4
            ).alias("win_sum"),
        )
    )


def maintenance_window_stats_sql(
    table_sql: str, *, lo: int, hi: int,
    win_start_h: int = 2, win_end_h: int = 8,
) -> str:
    """DuckDB twin: the naive theta join (fine at oracle scale)."""
    return f"""
        WITH t AS ({table_sql}),
        iv AS (
            SELECT tag,
                   d.g * {DAY_MS} + {win_start_h} * 3600000 AS lo_ms,
                   d.g * {DAY_MS} + {win_end_h} * 3600000 AS hi_ms
            FROM (SELECT DISTINCT tag FROM t),
                 generate_series({lo // DAY_MS}, {hi // DAY_MS}) d(g)
        )
        SELECT t.tag, iv.lo_ms AS win_start,
               count(*)::BIGINT AS n_points,
               round(sum(t.value::DECIMAL(38,10))::DOUBLE, 4) + 0.0 AS win_sum
        FROM t JOIN iv
          ON t.tag = iv.tag
         AND t."timestamp" >= iv.lo_ms AND t."timestamp" < iv.hi_ms
        GROUP BY t.tag, iv.lo_ms
    """


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | None = None,
    l_lo: str = "l_lo",
    l_hi: str = "l_hi",
    r_lo: str = "r_lo",
    r_hi: str = "r_hi",
    bucket_ms: int = 6 * 3_600_000,
) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) interval pair (same
    ``on`` key when given) whose half-open ranges intersect, with the
    exact ``overlap_ms``. The interval×interval generalization of
    :func:`interval_join` — and the other join shape Spark natively
    plans as a per-key nested loop.

    Distributed plan: BOTH sides explode to the time buckets they
    cover; candidate pairs equi-join on (key, bucket); the residual
    overlap predicate filters; and the classic first-overlap-bucket
    rule — keep a pair only in the bucket containing
    ``greatest(l_lo, r_lo)`` — dedups pairs that share several buckets
    WITHOUT a distinct (no second shuffle, no wide state). Replication
    per interval is span/bucket_ms, and the same ``max_buckets``
    executor-side guard as :func:`interval_join` rejects unbounded
    open-ended intervals with an actionable error instead of an OOM.

    Column names must be disjoint across the two frames (caller
    renames; the four bound columns already force it)."""
    from timeseries_db_spark.functions.numeric import duck_div

    def explode_buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        max_buckets = 100_000
        span_buckets = (
            duck_div(F.col(hi), bucket_ms) - duck_div(F.col(lo), bucket_ms) + 1
        )
        hi_b = F.when(
            span_buckets <= F.lit(max_buckets), duck_div(F.col(hi), bucket_ms)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval_overlap_join: interval explodes to "),
                    span_buckets,
                    F.lit(f" bucket rows of {bucket_ms} ms (max {max_buckets})"),
                )
            )
        )
        return df.filter(F.col(hi) >= F.col(lo)).withColumn(
            "_b", F.explode(F.sequence(duck_div(F.col(lo), bucket_ms), hi_b))
        )

    lb = explode_buckets(left, l_lo, l_hi)
    rb = explode_buckets(right, r_lo, r_hi)
    keys = ([on] if on else []) + ["_b"]
    start = F.greatest(F.col(l_lo), F.col(r_lo))
    end = F.least(F.col(l_hi), F.col(r_hi))
    return (
        lb.join(rb, on=keys)
        .filter(start < end)
        .filter(F.col("_b") == duck_div(start, bucket_ms))
        .withColumn("overlap_ms", end - start)
        .drop("_b")
    )


def session_window_overlap(
    spark: SparkSession,
    sf_dir: str,
    *,
    lo: int,
    hi: int,
    win_start_h: int = 2,
    win_end_h: int = 8,
) -> DataFrame:
    """Per maintenance window: how many user sessions intersect it and
    for how long in total — the gate-shaped consumer of
    :func:`interval_overlap_join` (sessions are half-open
    [start, end+1) so single-event sessions still overlap).
    Output: (win_start, ov_cnt, ov_ms)."""
    from timeseries_db_spark.operators.rollup import sessionize

    sessions = sessionize(spark, sf_dir, with_end=True).select(
        F.col("session_start").alias("s_lo"),
        (F.col("session_end") + 1).alias("s_hi"),
    )
    day_lo, day_hi = lo // DAY_MS, hi // DAY_MS
    windows = (
        spark.range(day_lo, day_hi + 1)
        .select(
            (F.col("id") * DAY_MS + win_start_h * 3_600_000).alias("w_lo"),
            (F.col("id") * DAY_MS + win_end_h * 3_600_000).alias("w_hi"),
        )
    )
    ov = interval_overlap_join(
        sessions, windows, l_lo="s_lo", l_hi="s_hi", r_lo="w_lo", r_hi="w_hi"
    )
    return ov.groupBy(F.col("w_lo").alias("win_start")).agg(
        F.count(F.lit(1)).cast("double").alias("ov_cnt"),
        F.sum("overlap_ms").cast("double").alias("ov_ms"),
    )


def session_window_overlap_sql(
    *, lo: int, hi: int, win_start_h: int = 2, win_end_h: int = 8
) -> str:
    """DuckDB twin: the naive theta overlap join over the same session
    CTE (fine at oracle scale)."""
    from timeseries_db_spark.operators.rollup import sessionize_sql

    return f"""
        WITH sess AS (
            SELECT session_start AS s_lo, session_end + 1 AS s_hi
            FROM ({sessionize_sql(with_end=True)})
        ),
        win AS (
            SELECT g * {DAY_MS} + {win_start_h} * 3600000 AS w_lo,
                   g * {DAY_MS} + {win_end_h} * 3600000 AS w_hi
            FROM generate_series({lo // DAY_MS}, {hi // DAY_MS}) t(g)
        )
        SELECT w_lo AS win_start,
               CAST(count(*) AS DOUBLE) AS ov_cnt,
               CAST(sum(least(s_hi, w_hi) - greatest(s_lo, w_lo)) AS DOUBLE)
                   AS ov_ms
        FROM sess JOIN win
          ON greatest(s_lo, w_lo) < least(s_hi, w_hi)
        GROUP BY w_lo
    """
