"""Batch twins of the streaming operators: tumbling-window rollup and
gap-based sessionization. These are the oracle-checkable faces of
``streaming/ingest.py`` — Spark's ``F.window`` on a batch DataFrame
produces exactly the windows the streaming query emits, and DuckDB's
``time_bucket`` produces the same epoch-aligned buckets.

Scale: the rollup is one hash aggregation keyed (window, tag) — partial
aggregation collapses each executor's rows per bucket before the
shuffle. Sessionization is a per-user window function: one shuffle by
``user_id``, then lag/cumsum inside the partition — the standard
distributed sessionize with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round
from timeseries_db_spark.sources.tables import load_table, ts_to_millis


def rollup_aggregate(grouped) -> DataFrame:
    """The five-aggregate rollup body shared VERBATIM by the batch and
    streaming rollups (one definition — the stream/batch bit-parity
    guarantee is structural, not hand-synchronized).

    Sum as DECIMAL: exact and associative, so the value is partition-
    order independent — a double sum can land either side of a .00005
    rounding boundary depending on combine order (observed at sf0.1).
    Rounding stays decimal (total) or duck-parity (vavg) — see
    functions/numeric.py for the exact-tie semantics."""
    return (
        grouped.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(38,10)")).alias("_dsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start"),
            "tag",
            F.col("_n").cast("double").alias("cnt"),
            F.round(F.col("_dsum"), 4).cast("double").alias("total"),
            duck_round(F.col("_dsum").cast("double") / F.col("_n"), 4).alias("vavg"),
            "vmin",
            "vmax",
        )
    )


def window_rollup(tsdb: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time rollup per tag over a tsdb-shaped frame:
    (window_start epoch-millis, tag, cnt, total, vavg, vmin, vmax)."""
    return rollup_aggregate(
        tsdb.withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
        .groupBy(F.window("event_time", window), F.col("tag"))
    )


def window_rollup_events_sql(window_sql: str = "1 hour") -> str:
    """DuckDB twin over the raw events table (epoch-aligned buckets both
    sides; Spark windows and time_bucket both anchor at 1970-01-01 UTC)."""
    return f"""
        WITH g AS (
            SELECT epoch_ms(time_bucket(INTERVAL '{window_sql}', ts)) AS window_start,
                   event_type AS tag,
                   count(*) AS n,
                   sum(value::DECIMAL(38,10)) AS dsum,
                   min(value) AS vmin,
                   max(value) AS vmax
            FROM events GROUP BY 1, 2
        )
        SELECT window_start, tag,
               CAST(n AS DOUBLE) AS cnt,
               round(dsum, 4)::DOUBLE AS total,
               round(dsum::DOUBLE / n, 4) AS vavg,
               vmin, vmax
        FROM g
    """


SESSION_GAP_MIN = 30


def sessionize(
    spark,
    sf_dir: str,
    gap_minutes: int = SESSION_GAP_MIN,
    with_end: bool = False,
) -> DataFrame:
    """Gap-based sessions per user over events: a new session starts when
    the time since the user's previous event exceeds ``gap_minutes``.
    Output: (user_id, session_start epoch-millis, n_events, total_value)
    plus ``session_end`` (the last event's millis) when ``with_end`` —
    the interval form the overlap join consumes."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", ts_to_millis(ev, "ts").alias("tms"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("tms")
    gap_ms = gap_minutes * 60_000
    with_gap = ev.withColumn("prev", F.lag("tms").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev").isNull() | (F.col("tms") - F.col("prev") > gap_ms), 1
        ).otherwise(0),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    out = (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.min("tms").alias("session_start"),
            F.max("tms").alias("session_end"),
            F.count(F.lit(1)).cast("double").alias("n_events"),
            # decimal sum + duck_round: deterministic at .00005 boundaries
            # (functions/numeric.py)
            F.sum(F.col("value").cast("decimal(38,10)")).alias("_dsum"),
        )
        .withColumn("total_value", F.round(F.col("_dsum"), 4).cast("double"))
    )
    cols = ["user_id", "session_start"]
    if with_end:
        cols.append("session_end")
    return out.select(*cols, "n_events", "total_value")


def sessionize_sql(
    gap_minutes: int = SESSION_GAP_MIN, with_end: bool = False
) -> str:
    gap_ms = gap_minutes * 60_000
    return f"""
        WITH ev AS (
            SELECT user_id, epoch_ms(ts) AS tms, value FROM events
        ),
        gaps AS (
            SELECT user_id, tms, value,
                   CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY tms) IS NULL
                             OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms) > {gap_ms}
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
        ),
        sids AS (
            SELECT user_id, tms, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY tms
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_seq
            FROM gaps
        )
        SELECT user_id, min(tms) AS session_start,
               {"max(tms) AS session_end," if with_end else ""}
               CAST(count(*) AS DOUBLE) AS n_events,
               round(sum(value::DECIMAL(38,10)), 4)::DOUBLE AS total_value
        FROM sids GROUP BY user_id, session_seq
    """


def window_funnel(
    spark,
    sf_dir: str,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    window_ms: int = 6 * 3_600_000,
) -> DataFrame:
    """(user_id, level) — windowFunnel-style event-sequence analysis:
    the maximum number of funnel ``steps`` a user completed IN ORDER
    (each step strictly after the previous) within ``window_ms`` of the
    chain's first event; 0 for users who never performed ``steps[0]``.
    The conversion-funnel primitive of event analytics (ClickHouse's
    ``windowFunnel``), absent from the reference (no sequences at all).

    Semantics: a chain may start at ANY ``steps[0]`` occurrence;
    per-start, greedily taking the EARLIEST eligible next event is
    optimal (exchange argument: an earlier choice only ever leaves more
    room for later steps), so level(user) = max over starts of the
    greedy chain length.

    Scale shape: each step advance is a FORWARD as-of join — "earliest
    next-step event strictly after t" == the tested backward
    :func:`~timeseries_db_spark.operators.asof.asof_join` on a NEGATED
    time axis (min t with t >= p+1 == -max(-t <= -(p+1)); integer ms
    make strictness exact). One union+window shuffle keyed on user_id
    per step in ONE LINEAR plan — no per-user event fan-out (the naive
    range join explodes |starts| x |step events| per user; the as-of
    carries exactly one probe row per chain), and dead chains ride
    through later steps with a NULL probe and their achieved ``lvl``
    frozen, instead of branching a union of re-executed join prefixes
    (an achieved-per-level union re-plans the first i-1 joins in every
    branch — O(k²/2) shuffles; code-review r8). Heavy users: swap in
    ``asof_join_scalable`` (same contract, bucketed)."""
    from timeseries_db_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "user_id", ts_to_millis(ev, "ts").alias("tms"), "event_type"
    )
    users = ev.select("user_id").distinct()
    cur = ev.filter(F.col("event_type") == steps[0]).select(
        "user_id",
        F.col("tms").alias("t1"),
        F.col("tms").alias("p"),
        F.lit(1).alias("lvl"),
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("event_type") == s).select(
            "user_id", (-F.col("tms")).alias("_nt"), F.col("tms").alias("t_next")
        )
        # only chains live at level i-1 probe; dead chains carry a NULL
        # probe (sorts before every real right row -> NULL payload)
        probe = cur.withColumn(
            "_np",
            F.when(F.col("lvl") == i - 1, -(F.col("p") + F.lit(1))),
        )
        j = asof_join(
            probe, nxt, on="user_id", left_ts="_np", right_ts="_nt",
            payload=["t_next"],
        )
        ok = (
            (F.col("lvl") == i - 1)
            & F.col("t_next").isNotNull()
            & (F.col("t_next") <= F.col("t1") + F.lit(window_ms))
        )
        cur = j.select(
            "user_id",
            "t1",
            F.when(ok, F.col("t_next")).otherwise(F.col("p")).alias("p"),
            F.when(ok, F.lit(i)).otherwise(F.col("lvl")).alias("lvl"),
        )
    lv = cur.groupBy("user_id").agg(F.max("lvl").alias("level"))
    return users.join(lv, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("level"), F.lit(0)).cast("long").alias("level"),
    )


def window_funnel_sql(
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    window_ms: int = 6 * 3_600_000,
) -> str:
    """DuckDB twin of :func:`window_funnel` — the decorrelated
    join-aggregation form: per chain, the earliest eligible next event
    is ``min(tms)`` over an inner join bounded by the strictly-after
    and window predicates (folding the window bound into the join
    changes nothing: if the unbounded min exceeds the horizon no event
    was inside it). All values are exact integer ms — no FP seam."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    ctes = [
        "ev AS (SELECT user_id, epoch_ms(ts) AS tms, event_type FROM events)",
        "u AS (SELECT DISTINCT user_id FROM ev)",
        f"c1 AS (SELECT user_id, tms AS t1, tms AS p FROM ev "
        f"WHERE event_type = {q(steps[0])})",
    ]
    lvls = ["SELECT user_id, 1 AS lv FROM c1"]
    for i, s in enumerate(steps[1:], start=2):
        prev = f"c{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT {prev}.user_id, {prev}.t1, min(e.tms) AS p "
            f"FROM {prev} JOIN ev e ON e.user_id = {prev}.user_id "
            f"AND e.event_type = {q(s)} AND e.tms > {prev}.p "
            f"AND e.tms <= {prev}.t1 + {window_ms} "
            f"GROUP BY {prev}.user_id, {prev}.t1, {prev}.p)"
        )
        lvls.append(f"SELECT user_id, {i} AS lv FROM c{i}")
    union = " UNION ALL ".join(lvls)
    return f"""
        WITH {", ".join(ctes)},
        lv AS (SELECT user_id, max(lv) AS level FROM ({union}) GROUP BY 1)
        SELECT u.user_id, COALESCE(lv.level, 0)::BIGINT AS level
        FROM u LEFT JOIN lv ON u.user_id = lv.user_id
    """


def window_rollup_sliding(
    tsdb: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """SLIDING event-time rollup per tag: every row contributes to the
    ``window/slide`` overlapping windows containing it (epoch-aligned,
    like the tumbling form). Same five-aggregate shared body
    (:func:`rollup_aggregate`) → same streaming twin bit-parity.

    Scale: Spark's ``window(event, W, S)`` expands each row to its W/S
    windows BEFORE the partial aggregation, so shuffle bytes stay one
    partial row per (window, tag) per input partition — the fan-out is
    absorbed map-side. Keep W/S small (here 4); for large overlap
    factors pre-aggregate per slide-granule tumbling first and roll the
    granules up (the standard two-level sliding rollup)."""
    return rollup_aggregate(
        tsdb.withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
        .groupBy(F.window("event_time", window, slide), F.col("tag"))
    )


def window_rollup_sliding_events_sql(
    window_ms: int = 3_600_000, slide_ms: int = 900_000
) -> str:
    """DuckDB twin: expand each event to the ``window/slide`` epoch-
    aligned window starts containing it (requires slide | window, which
    Spark requires too for alignment), then the same aggregate body."""
    n = window_ms // slide_ms
    return f"""
        WITH ev AS (
            SELECT epoch_ms(ts) AS tms, event_type AS tag, value FROM events
        ),
        x AS (
            SELECT ((ev.tms // {slide_ms}) - k.g) * {slide_ms} AS window_start,
                   ev.tag, ev.value
            FROM ev, generate_series(0, {n - 1}) k(g)
        ),
        g AS (
            SELECT window_start, tag,
                   count(*) AS n, sum(value::DECIMAL(38,10)) AS dsum,
                   min(value) AS vmin, max(value) AS vmax
            FROM x GROUP BY 1, 2
        )
        SELECT window_start, tag,
               CAST(n AS DOUBLE) AS cnt,
               round(dsum, 4)::DOUBLE AS total,
               round(dsum::DOUBLE / n, 4) AS vavg,
               vmin, vmax
        FROM g
    """


def rollup_state(tsdb: DataFrame, window_ms: int = 3_600_000) -> DataFrame:
    """(window_start, tag, cnt, total, total_dec, vmin, vmax) — the
    MAINTAINABLE materialized rollup: ``total_dec`` is the exact
    DECIMAL(38,10) sum the increments difference against; ``total`` is
    its rounded display twin. Differencing against an already-rounded
    total compounds the rounding of every prior increment (a group of
    0.00004s stays 0.0 forever while a rescan says 0.0001 — code-review
    r8), so the exact column is part of the state, not an implementation
    detail. ``vmin``/``vmax`` (r9) are maintained incrementally for
    inserts and by TARGETED group rescans when a delete/update removes a
    possibly-extremal value — see :func:`rollup_increment`."""
    from timeseries_db_spark.functions.numeric import duck_div

    return (
        tsdb.groupBy(
            (duck_div(F.col("timestamp"), window_ms) * window_ms).alias(
                "window_start"
            ),
            "tag",
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum(F.col("value").cast("decimal(38,10)")).alias("total_dec"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .select(
            "window_start",
            "tag",
            "cnt",
            F.round(F.col("total_dec"), 4).cast("double").alias("total"),
            "total_dec",
            "vmin",
            "vmax",
        )
    )


def rollup_increment(
    current: DataFrame,
    changes: DataFrame,
    window_ms: int = 3_600_000,
    snapshot: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a :func:`rollup_state` frame from a
    :meth:`~timeseries_db_spark.operators.dml.TsTable.changes` feed —
    the materialized-view maintenance loop: apply
    ``+value_after − value_before`` per touched group instead of
    re-aggregating the table.

    Plan (code-review r8 — a broadcast hint on a full-outer join is
    silently dropped by Spark, which would have shuffled the whole view
    every increment): existing groups take a LEFT join with the tiny
    delta broadcast (map-only over the view); groups born in this feed
    come from an anti-join of the delta against the view's KEYS only.
    Cost per increment: one map-only pass over the view + a key-
    projected join of the delta.

    Count and sum are the self-maintainable aggregates. Deltas
    accumulate in DECIMAL against ``total_dec``, so the maintained
    state is exactly a from-scratch :func:`rollup_state` at the new
    version (pytest-pinned, sub-4th-decimal values included).

    MIN/MAX (r9) are maintained with the textbook mixed strategy:
    inserted/updated-in values fold monotonically
    (``least``/``greatest`` — always safe), while a change that REMOVES
    a possibly-extremal value (``value_before ≤ vmin`` or
    ``≥ vmax``) marks the group for a TARGETED RESCAN against
    ``snapshot`` (the table at the new version) — only the marked
    groups are re-aggregated, joined back by key. Pass ``snapshot``
    whenever the state carries ``vmin``/``vmax``; it is read lazily and
    only the marked groups' windows survive its filter, so the common
    insert-heavy increment never scans the table at all (the plan
    contains the rescan subtree only when deletes/updates invalidate an
    extremum — and even then prunes to the affected windows)."""
    from timeseries_db_spark.functions.numeric import duck_div

    if "total_dec" not in current.columns:
        raise ValueError(
            "rollup_increment maintains rollup_state frames (needs the "
            "exact total_dec column); build the base with rollup_state()"
        )
    with_minmax = "vmin" in current.columns
    if with_minmax and snapshot is None:
        raise ValueError(
            "state carries vmin/vmax: pass snapshot= (the table at the "
            "new version) so extremum-invalidating changes can rescan "
            "their groups"
        )
    win = (duck_div(F.col("timestamp"), window_ms) * window_ms).alias(
        "window_start"
    )
    delta = (
        changes.select(
            win,
            "tag",
            "value_before",
            "value_after",
            (
                F.coalesce(F.col("value_after").cast("decimal(38,10)"), F.lit(0))
                - F.coalesce(
                    F.col("value_before").cast("decimal(38,10)"), F.lit(0)
                )
            ).alias("_dv"),
            (
                F.when(F.col("value_before").isNull(), 1)
                .when(F.col("value_after").isNull(), -1)
                .otherwise(0)
            ).alias("_dn"),
        )
        .groupBy("window_start", "tag")
        .agg(
            F.sum("_dv").alias("_dv"),
            F.sum("_dn").alias("_dn"),
            F.min("value_after").alias("_in_min"),
            F.max("value_after").alias("_in_max"),
            F.min("value_before").alias("_out_min"),
            F.max("value_before").alias("_out_max"),
        )
    )
    keys = ["window_start", "tag"]
    dec0 = F.lit(0).cast("decimal(38,10)")
    minmax_cols = (
        [
            # monotone fold of arriving values; a removed value at-or-
            # beyond the current extremum poisons the column to NULL,
            # which the rescan join below repairs (least/greatest skip
            # NULL inputs, so the poison must be explicit)
            F.when(
                F.col("_out_min").isNotNull()
                & (F.col("_out_min") <= F.col("vmin")),
                F.lit(None).cast("double"),
            )
            .otherwise(F.least("vmin", "_in_min"))
            .alias("vmin"),
            F.when(
                F.col("_out_max").isNotNull()
                & (F.col("_out_max") >= F.col("vmax")),
                F.lit(None).cast("double"),
            )
            .otherwise(F.greatest("vmax", "_in_max"))
            .alias("vmax"),
        ]
        if with_minmax
        else []
    )
    existing = (
        current.join(F.broadcast(delta), on=keys, how="left")
        .select(
            *keys,
            (
                F.col("cnt") + F.coalesce(F.col("_dn"), F.lit(0)).cast("double")
            ).alias("cnt"),
            (
                F.col("total_dec") + F.coalesce(F.col("_dv"), dec0)
            ).alias("total_dec"),
            *minmax_cols,
        )
    )
    fresh = (
        delta.join(current.select(*keys), on=keys, how="left_anti")
        .select(
            *keys,
            F.col("_dn").cast("double").alias("cnt"),
            F.col("_dv").cast("decimal(38,10)").alias("total_dec"),
            *(
                [F.col("_in_min").alias("vmin"), F.col("_in_max").alias("vmax")]
                if with_minmax
                else []
            ),
        )
    )
    out = existing.unionByName(fresh).filter(F.col("cnt") > 0)
    if with_minmax:
        # targeted rescan: re-aggregate ONLY the poisoned groups from
        # the snapshot. The poisoned-key set comes from the DELTA-sized
        # inner join (not from `out`, which would re-scan the whole
        # view), and the broadcast semi-join keys the snapshot scan.
        poisoned = (
            current.join(F.broadcast(delta), on=keys)
            .filter(
                (
                    F.col("_out_min").isNotNull()
                    & (F.col("_out_min") <= F.col("vmin"))
                )
                | (
                    F.col("_out_max").isNotNull()
                    & (F.col("_out_max") >= F.col("vmax"))
                )
            )
            .select(*keys)
        )
        rescan = (
            snapshot.select(win, "tag", "value")
            .join(F.broadcast(poisoned), on=keys)
            .groupBy(*keys)
            .agg(F.min("value").alias("_r_min"), F.max("value").alias("_r_max"))
        )
        out = out.join(F.broadcast(rescan), on=keys, how="left").select(
            *keys,
            "cnt",
            "total_dec",
            F.coalesce("vmin", "_r_min").alias("vmin"),
            F.coalesce("vmax", "_r_max").alias("vmax"),
        )
    return out.select(
        *keys,
        "cnt",
        F.round(F.col("total_dec"), 4).cast("double").alias("total"),
        "total_dec",
        *(["vmin", "vmax"] if with_minmax else []),
    )


DAY_MS = 86_400_000


def cohort_retention(spark, sf_dir: str, period_ms: int = DAY_MS) -> DataFrame:
    """(cohort_day, offset, active_users, retention) — classic cohort
    retention: users are grouped by the period of their FIRST event
    (the cohort), and each (cohort, offset) cell counts how many of
    them were active ``offset`` periods later; ``retention`` is that
    count over the cohort's size. The product-analytics staple next to
    sessionization and funnels.

    Scale shape: one scan feeds (a) the per-user first-activity
    aggregate (min monoid, map-side combine) and (b) the distinct
    (user, period) activity pairs — both shuffle on ``user_id``, the
    join is user-keyed, and the final matrix aggregate is bounded by
    cohorts × offsets regardless of row count. No window functions, no
    per-user fan-out."""
    from timeseries_db_spark.functions.numeric import duck_div

    ev = load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", ts_to_millis(ev, "ts").alias("tms"))
    # duck_div, not cast(col/d as long): double division loses ulps for
    # |tms| >= 2^53 and diverges from the twin's integer //
    per = duck_div(F.col("tms"), period_ms)
    first = ev.groupBy("user_id").agg(
        duck_div(F.min("tms"), period_ms).alias("cohort")
    )
    active = ev.select("user_id", per.alias("period")).distinct()
    cells = (
        active.join(first, "user_id")
        .groupBy("cohort", (F.col("period") - F.col("cohort")).alias("offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    # cohort size == the offset-0 cell (every user is active in the
    # period of their own first event), so no third scan and no sizes
    # join — one window over the cohorts×offsets matrix, which is tiny
    # by construction
    w = Window.partitionBy("cohort")
    return cells.withColumn(
        "cohort_size",
        F.max(F.when(F.col("offset") == 0, F.col("active_users"))).over(w),
    ).select(
        F.col("cohort").alias("cohort_day"),
        "offset",
        F.col("active_users").cast("double").alias("active_users"),
        duck_round(
            F.col("active_users") / F.col("cohort_size").cast("double"), 4
        ).alias("retention"),
    )


def cohort_retention_sql(period_ms: int = DAY_MS) -> str:
    return f"""
        WITH ev AS (
            SELECT user_id, epoch_ms(ts) AS tms FROM events
        ),
        first AS (
            SELECT user_id, (min(tms) // {period_ms}) AS cohort
            FROM ev GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id, (tms // {period_ms}) AS period FROM ev
        ),
        cells AS (
            SELECT cohort, period - cohort AS "offset",
                   count(DISTINCT a.user_id) AS active_users
            FROM active a JOIN first f ON a.user_id = f.user_id
            GROUP BY cohort, period - cohort
        )
        SELECT cohort AS cohort_day, "offset",
               CAST(active_users AS DOUBLE) AS active_users,
               round(active_users / (max(CASE WHEN "offset" = 0
                                         THEN active_users END)
                     OVER (PARTITION BY cohort))::DOUBLE, 4) AS retention
        FROM cells
    """
