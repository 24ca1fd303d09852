"""Extension-operator registry: dedup, similarity search, text analysis,
multimodal — the training-data-pipeline surface. Registered alongside the
reference surface in ``registry.build_registry``.

Threshold choices (measured on the fixtures):

* documents contain planted near-duplicates (~0.1% of pairs at
  Jaccard ≥ 0.98, next cluster below 0.03) → ``JACCARD_T = 0.8``
  isolates the planted pairs for both the inverted-index and the
  MinHash-LSH operators;
* SimHash Hamming ≤ 3 captures the same planted pairs;
* embeddings are near-random (max pairwise cos ≈ 0.48) →
  ``NEAR_DUP_COS = 0.4`` keeps a small, stable pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_db_spark.functions import numeric
from timeseries_db_spark.operators import (
    analytics,
    asof,
    dedup,
    multimodal,
    rollup,
    semistructured,
    similarity,
    text,
)
from timeseries_db_spark.sources.tables import events_as_tsdb, load_table

JACCARD_T = 0.8
#: Corpus-split pairs for the HLL set-operation leg (sorted, so the
#: "a|b" pair key parses unambiguously on both engines).
SPLIT_PAIRS = [("test", "train"), ("test", "valid"), ("train", "valid")]
SIMHASH_MAX_HAMMING = 3
NEAR_DUP_COS = 0.4
TOPK_K = 5
TOPK_QUERY_PRED = "vec_id % 100 = 0"
#: r12 pruned-ANN shape: exactly 8 query vectors at EVERY scale (the
#: main pred's |Q| grows with the corpus until every IVF list is
#: probed); with nprobe=2 ≪ nlist=128 this keeps ~87% of the corpus
#: pruned before PQ work at sf0.01 AND sf0.1
PRUNE_QUERY_PRED = "vec_id < 480 AND vec_id % 60 = 0"
EMB_DIM = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- r9 incr leg of window_rollup_1h (VERDICT r8 item 4): incremental
# materialized-view maintenance (operators/rollup.py:rollup_state /
# rollup_increment) was pytest-only; the 100 TB deployment lives on it.
# A scratch TsTable seeded from the dense fixture takes an insert (new
# window born in the feed), an update, and a full-group delete; the
# rollup state is advanced PER COMMIT from the version change feeds —
# never re-aggregated — and the emitted state must hash-equal the
# oracle's from-scratch aggregation of the closed-form final table. ---
_INCR_W_MS = 1_000  # dense-ms fixture → 1s buckets = 4 windows x 4 tags
_INCR_N = 4_000
_INCR_SEED = 3_000


def _incr_rollup_leg(spark: SparkSession) -> DataFrame:
    import os
    import shutil
    import tempfile

    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.sources.fixture import BASE_TS, timeseries_fixture

    fx = timeseries_fixture(spark, _INCR_N)
    ts = F.col("timestamp")
    path = os.path.join(tempfile.gettempdir(), f"tsdb_incr_rt_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    table = TsTable.create(spark, path, fx.filter(ts < BASE_TS + _INCR_SEED))
    versions = [table.version()]
    table.insert(fx.filter(ts >= BASE_TS + _INCR_SEED))  # births window 3
    versions.append(table.version())
    table.update(
        fx.filter((F.col("tag") == "Munich") & (ts < BASE_TS + 100))
        .select("timestamp", "tag")
        .withColumn("value", F.lit(999.0))
    )
    versions.append(table.version())
    table.delete(  # ALL window-0 Athens keys → a fully-emptied group
        fx.filter((F.col("tag") == "Athens") & (ts < BASE_TS + 1_000)).select(
            "timestamp", "tag"
        )
    )
    versions.append(table.version())
    state = rollup.rollup_state(table.read(versions[0]), window_ms=_INCR_W_MS)
    for va, vb in zip(versions, versions[1:]):
        # r9: min/max ride the maintained state too — the full-delete
        # and the extremum-removing update above exercise the targeted
        # group-rescan path against the per-version snapshot
        state = rollup.rollup_increment(
            state,
            table.changes(va, vb),
            window_ms=_INCR_W_MS,
            snapshot=table.read(vb),
        )
    return state.select(
        "window_start",
        "tag",
        "cnt",
        "total",
        F.lit(None).cast("double").alias("vavg"),
        "vmin",
        "vmax",
        F.lit("incr").alias("kind"),
    )


def _incr_rollup_sql() -> str:
    from timeseries_db_spark.sources.fixture import BASE_TS, timeseries_fixture_sql

    return f"""
        SELECT ("timestamp" // {_INCR_W_MS}) * {_INCR_W_MS} AS window_start,
               tag,
               CAST(count(*) AS DOUBLE) AS cnt,
               round(sum(value::DECIMAL(38,10)), 4)::DOUBLE AS total,
               CAST(NULL AS DOUBLE) AS vavg,
               min(value) AS vmin,
               max(value) AS vmax,
               'incr' AS kind
        FROM (
            SELECT "timestamp", tag,
                   CASE WHEN tag = 'Munich' AND "timestamp" < {BASE_TS + 100}
                        THEN 999.0 ELSE value END AS value
            FROM ({timeseries_fixture_sql(_INCR_N)})
            WHERE NOT (tag = 'Athens' AND "timestamp" < {BASE_TS + 1_000})
        )
        GROUP BY 1, 2
    """


_INCR_ROLLUP_SQL = _incr_rollup_sql()


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def register_extensions(q: dict, o: dict) -> None:
    # ---- streaming batch twins (same plan the streaming queries emit) ----
    # r8 fold: tumbling AND sliding (1h window / 15m slide) legs in one
    # entry — both run the SHARED rollup_aggregate body the streaming
    # twins use, so stream/batch parity covers both window kinds
    def window_rollup_1h(s: SparkSession, d: str) -> DataFrame:
        t = events_as_tsdb(s, d)
        tumble = rollup.window_rollup(t, "1 hour").withColumn(
            "kind", F.lit("tumble")
        )
        slide = rollup.window_rollup_sliding(
            t, "1 hour", "15 minutes"
        ).withColumn("kind", F.lit("slide"))
        return tumble.unionByName(slide).unionByName(_incr_rollup_leg(s))

    q["window_rollup_1h"] = window_rollup_1h
    o["window_rollup_1h"] = (
        "SELECT *, 'tumble' AS kind FROM ("
        + rollup.window_rollup_events_sql("1 hour")
        + ") UNION ALL SELECT *, 'slide' AS kind FROM ("
        + rollup.window_rollup_sliding_events_sql(3_600_000, 900_000)
        + ") UNION ALL "
        + _INCR_ROLLUP_SQL
    )

    # late-r8 funnel leg: windowFunnel-style per-user max completed
    # step sequence (signup→view→click→purchase within 6h), coerced to
    # the session schema as (user_id, NULL, level, NULL)
    def sessionize_and_funnel(s: SparkSession, d: str) -> DataFrame:
        ses = rollup.sessionize(s, d).withColumn("kind", F.lit("session"))
        fun = rollup.window_funnel(s, d).select(
            "user_id",
            F.lit(None).cast("long").alias("session_start"),
            F.col("level").cast("double").alias("n_events"),
            F.lit(None).cast("double").alias("total_value"),
            F.lit("funnel").alias("kind"),
        )
        # late-r8 cohort leg: first-activity-day cohorts × period-offset
        # active-user matrix (the retention staple next to sessions and
        # funnels), coerced as (cohort_day, offset, active, retention)
        coh = rollup.cohort_retention(s, d).select(
            F.col("cohort_day").alias("user_id"),
            F.col("offset").alias("session_start"),
            F.col("active_users").alias("n_events"),
            F.col("retention").alias("total_value"),
            F.lit("cohort").alias("kind"),
        )
        return ses.unionByName(fun).unionByName(coh)

    q["sessionize_30m"] = sessionize_and_funnel
    o["sessionize_30m"] = (
        f"SELECT *, 'session' AS kind FROM ({rollup.sessionize_sql()})"
        " UNION ALL "
        "SELECT user_id, CAST(NULL AS BIGINT) AS session_start,"
        " level::DOUBLE AS n_events, CAST(NULL AS DOUBLE) AS total_value,"
        f" 'funnel' AS kind FROM ({rollup.window_funnel_sql()})"
        " UNION ALL "
        'SELECT cohort_day AS user_id, "offset" AS session_start,'
        " active_users AS n_events, retention AS total_value,"
        f" 'cohort' AS kind FROM ({rollup.cohort_retention_sql()})"
    )

    # ---- as-of join (union+window plan vs DuckDB ASOF JOIN oracle) ----
    from timeseries_db_spark.registry import HI, LO, EVENTS_T

    # both physical strategies — plain union+window and the skew-safe
    # bucketed recursion — produce the same rows, so they run as two legs
    # of ONE gate entry (slot freed for ts_anomaly_interp); the oracle is
    # the same ASOF SQL stamped with each leg label
    def asof_enrich_both(s: SparkSession, d: str) -> DataFrame:
        t = events_as_tsdb(s, d)
        # r17 tried persisting one shared hourly_avg for both strategy
        # legs (2 aggregations → 1 + cache). Measured per-run on the
        # same session, interleaved (10 paired reps at sf0.1): medians
        # 1.31 s (two aggs) vs 1.33 s (shared cache) — the cache
        # write/read offsets the saved aggregation, a wash. Reverted to
        # the simpler two-agg shape; every invocation computes from
        # parquet (the hourly agg is a cheap map-side-combined
        # reduction, so this also holds at scale).
        plain = asof.enrich_with_hourly_avg(t).withColumn(
            "variant", F.lit("plain")
        )
        bucketed = asof.asof_join_scalable(
            t, asof.hourly_avg(t), on="tag", left_ts="timestamp",
            right_ts="hr", payload=["hr_avg"], bucket_ms=6 * 3_600_000,
        ).withColumn("variant", F.lit("bucketed"))
        return plain.unionByName(bucketed)

    q["asof_hourly_enrich"] = asof_enrich_both
    _enrich_sql = asof.enrich_with_hourly_avg_sql(EVENTS_T)
    o["asof_hourly_enrich"] = (
        f"SELECT *, 'plain' AS variant FROM ({_enrich_sql})"
        " UNION ALL "
        f"SELECT *, 'bucketed' AS variant FROM ({_enrich_sql})"
    )

    # ---- gap-fill / resample to an hourly grid: forward-fill AND
    # linear-interpolation legs of ONE union entry (r8 — VERDICT r7 item
    # 1: interpolate_linear was implemented with a complete SQL twin but
    # carried no gate row). Same grid machinery, disjoint `kind`s, so
    # the driver's value hash covers both resampling semantics. ----
    def gapfill_hourly(s: SparkSession, d: str) -> DataFrame:
        t = events_as_tsdb(s, d)
        # r17 tried persisting the (tag, ts)→max point table + distinct
        # tag frame shared by both resampler legs (4 scans / 4 agg
        # exchanges → 2 + caches). Measured per-run on the same
        # session, interleaved at sf0.1: medians identical (2.67 vs
        # 2.65 s), mins favor the uncached shape (1.45 vs 2.22) — the
        # point table is near-full-size when (tag, ts) is nearly
        # unique, so caching it costs what the second aggregation
        # costs. Reverted to the per-leg shape; every invocation
        # computes from parquet.
        #
        # r18: no caching needed — the forward-fill value IS the
        # backward carry the interpolation pass already computes, so
        # BOTH legs ride one union+window plan (gapfill_interp_fused:
        # one points aggregation, one tags distinct, one grid, one
        # exchange; values bit-identical, pytest-pinned + oracle).
        fused = asof.gapfill_interp_fused(t, lo=LO, hi=HI, step_ms=3_600_000)
        return fused.select(
            "tag",
            "timestamp",
            F.expr(
                "explode(array("
                "  struct(ffill_value AS value, 'ffill' AS kind),"
                "  struct(interp_value AS value, 'interp' AS kind)"
                ")) AS _x"
            ),
        ).select("tag", "timestamp", "_x.value", "_x.kind")

    q["gapfill_hourly"] = gapfill_hourly
    _ffill_sql = asof.gap_fill_sql(EVENTS_T, lo=LO, hi=HI, step_ms=3_600_000)
    _interp_sql = asof.interpolate_linear_sql(
        EVENTS_T, lo=LO, hi=HI, step_ms=3_600_000
    )
    o["gapfill_hourly"] = (
        f"SELECT *, 'ffill' AS kind FROM ({_ffill_sql})"
        " UNION ALL "
        f"SELECT *, 'interp' AS kind FROM ({_interp_sql})"
    )

    # ---- extended aggregates: exact interpolated percentiles (the
    # reference's agg set is count/sum/avg/min/max only; percentile is the
    # first ask of any real metrics workload). Spark `percentile` and
    # DuckDB `quantile_cont` both linearly interpolate → exact oracle.
    # Scale note: exact percentile sorts each group; native
    # `approx_percentile` (t-digest) can't hash-match an oracle — so r8
    # adds the DETERMINISTIC mergeable scale path as a second leg: the
    # fixed-grid histogram sketch (operators/sketches.py), whose
    # estimates are engine-exact and within one bucket width of the
    # nearest-rank statistic (pytest-pinned). ----
    HIST_LO, HIST_HI = 0.0, 500.0

    def quantiles_by_tag(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import sketches

        t = events_as_tsdb(s, d)
        exact = (
            t.groupBy(F.col("tag").alias("grp"))
            .agg(
                numeric.duck_round(F.percentile("value", 0.5), 4).alias("median"),
                numeric.duck_round(F.percentile("value", 0.95), 4).alias("p95"),
            )
            .withColumn("kind", F.lit("exact"))
        )
        hist = sketches.histogram_counts(t, "tag", "value", HIST_LO, HIST_HI)
        # BOTH quantiles from ONE cumsum pass over one histogram
        # aggregation (review r8: per-q DataFrame branches re-executed
        # the scan+agg subtree — Catalyst does no cross-branch CSE),
        # pivoted to the entry's (grp, median, p95) shape.
        qq = sketches.histogram_quantiles(hist, (0.5, 0.95), HIST_LO, HIST_HI)
        approx = (
            qq.groupBy(F.col("key").alias("grp"))
            .agg(
                F.max(F.when(F.col("q") == 0.5, F.col("est"))).alias("median"),
                F.max(F.when(F.col("q") == 0.95, F.col("est"))).alias("p95"),
            )
            .select("grp", "median", "p95", F.lit("hist").alias("kind"))
        )
        # r9: median absolute deviation — the ROBUST scale statistic a
        # single wild value cannot poison (the z-score legs' stddev
        # can); rides the entry schema as (grp, median=med, p95=mad)
        mad = analytics.mad_by_tag(t).select(
            F.col("tag").alias("grp"),
            F.col("med").alias("median"),
            F.col("mad").alias("p95"),
            F.lit("mad").alias("kind"),
        )
        # r9: per-tag OLS trend — exact-integer sufficient statistics,
        # one hash aggregation; rides as (median=slope/hour,
        # p95=intercept at 2024-01-01)
        lfit = analytics.linfit_by_tag(t).select(
            F.col("tag").alias("grp"),
            F.col("slope").alias("median"),
            F.col("icept").alias("p95"),
            F.lit("lfit").alias("kind"),
        )
        # r14: CUSUM change detection — the reflection-identity chart
        # (two stacked window passes, no recursion); one computation
        # fans out to three leg rows per tag via explode (no re-
        # executed subtree): cusp/cusn carry (alarm count, first alarm
        # ts) per side, cusfp the exact-integer alarm-set fingerprints.
        cus = analytics.cusum_by_tag(t)
        cus3 = cus.select(
            F.col("tag").alias("grp"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("cusp").alias("kind"),
                        F.col("n_pos").cast("double").alias("median"),
                        F.coalesce(F.col("first_pos_ts"), F.lit(-1))
                        .cast("double")
                        .alias("p95"),
                    ),
                    F.struct(
                        F.lit("cusn").alias("kind"),
                        F.col("n_neg").cast("double").alias("median"),
                        F.coalesce(F.col("first_neg_ts"), F.lit(-1))
                        .cast("double")
                        .alias("p95"),
                    ),
                    F.struct(
                        F.lit("cusfp").alias("kind"),
                        F.coalesce(F.col("fp_pos"), F.lit(0))
                        .cast("double")
                        .alias("median"),
                        F.coalesce(F.col("fp_neg"), F.lit(0))
                        .cast("double")
                        .alias("p95"),
                    ),
                )
            ).alias("x"),
        ).select("grp", "x.median", "x.p95", "x.kind")
        return (
            exact.unionByName(approx)
            .unionByName(mad)
            .unionByName(lfit)
            .unionByName(cus3)
        )

    q["agg_quantiles_by_tag"] = quantiles_by_tag
    from timeseries_db_spark.operators import sketches as _hsk

    _hist_sql = _hsk.histogram_quantiles_sql(
        EVENTS_T, "tag", "value", HIST_LO, HIST_HI, (0.5, 0.95)
    )
    o["agg_quantiles_by_tag"] = f"""
        SELECT event_type AS grp,
               round(quantile_cont(value, 0.5), 4) AS median,
               round(quantile_cont(value, 0.95), 4) AS p95,
               'exact' AS kind
        FROM events GROUP BY 1
        UNION ALL
        SELECT key AS grp,
               max(CASE WHEN q = 0.5 THEN est END) AS median,
               max(CASE WHEN q = 0.95 THEN est END) AS p95,
               'hist' AS kind
        FROM ({_hist_sql}) GROUP BY key
        UNION ALL
        SELECT tag AS grp, med AS median, mad AS p95, 'mad' AS kind
        FROM ({analytics.mad_by_tag_sql(EVENTS_T)})
        UNION ALL
        SELECT tag AS grp, slope AS median, icept AS p95, 'lfit' AS kind
        FROM ({analytics.linfit_by_tag_sql(EVENTS_T)})
        UNION ALL
        SELECT grp, median, p95, kind FROM (
            WITH cus AS ({analytics.cusum_by_tag_sql(EVENTS_T)})
            SELECT tag AS grp, n_pos::DOUBLE AS median,
                   coalesce(first_pos_ts, -1)::DOUBLE AS p95,
                   'cusp' AS kind
            FROM cus
            UNION ALL
            SELECT tag, n_neg::DOUBLE, coalesce(first_neg_ts, -1)::DOUBLE,
                   'cusn'
            FROM cus
            UNION ALL
            SELECT tag, coalesce(fp_pos, 0)::DOUBLE,
                   coalesce(fp_neg, 0)::DOUBLE, 'cusfp'
            FROM cus
        )
    """

    # ---- derivative analytics: per-tag consecutive deltas (lag window)
    # and per-(tag, 6h-bucket) average rate of change (min_by/max_by
    # monoids, one hash agg) — folded into one union entry with a `kind`
    # discriminator under the 50-entry gate budget. Common shape:
    # (kind, tag, ts, v1, v2); each branch keeps its own physical plan. ----
    DERIV_BUCKET_MS = 6 * 3_600_000

    def derivatives_by_tag(s: SparkSession, d: str) -> DataFrame:
        t = events_as_tsdb(s, d)
        # r17 tried sharing ONE persisted repartition("tag") of the
        # base across the delta/rate/ewma legs (3 parquet scans +
        # 3 full-data shuffles → 1 + cache; plain ReuseExchange cannot
        # fire — per-branch project pushdown below the repartition
        # breaks canonical equality). Measured per-run on the same
        # session, interleaved (5 paired reps at sf0.1): medians
        # 2.77 s (three shuffles) vs 2.84 s (shared cache), mins 2.42
        # vs 2.66 — writing + thrice-reading the near-full-size cached
        # base costs what the two saved exchanges cost, and the rate
        # leg LOSES its cheap partial-agg-before-shuffle shape by
        # consuming a full-data exchange instead. Reverted to per-leg
        # plans; every invocation computes from parquet.
        #
        # r18: instead of caching, FUSE legs that are keyed identically
        # (guide §2.4) — no persisted state, every invocation computes
        # from parquet, each leg's VALUES unchanged (pytest-pinned
        # bit-equality + oracle):
        # * delta + ewma ride one tag-partitioned window pass (one
        #   Exchange + Sort + scan instead of two of each); one explode
        #   emits both legs' rows.
        # * zscore + szn share one moment aggregation (per-tag moments
        #   are the exact DECIMAL rollup of the per-(tag, hod) partials)
        #   and one broadcast-filtered row scan (4 scans → 2).
        de = analytics.delta_ewma_fused(t)
        delta_ewma = de.select(
            "tag",
            F.col("timestamp").alias("ts"),
            F.expr(
                "explode(array("
                "  struct('delta' AS kind, dv AS v1,"
                "         CAST(dt_ms AS DOUBLE) AS v2),"
                "  struct('ewma' AS kind, CAST(ewma_fp AS DOUBLE) AS v1,"
                "         value AS v2)"
                ")) AS _x"
            ),
        ).select("_x.kind", "tag", "ts", "_x.v1", "_x.v2")
        deltas_sc = analytics.point_deltas_scalable(
            t, bucket_ms=DERIV_BUCKET_MS
        ).select(
            F.lit("delta_sc").alias("kind"),
            "tag",
            F.col("timestamp").alias("ts"),
            F.col("dv").alias("v1"),
            F.col("dt_ms").cast("double").alias("v2"),
        )
        rates = analytics.rate_per_bucket(t, bucket_ms=DERIV_BUCKET_MS).select(
            F.lit("rate").alias("kind"),
            "tag",
            F.col("bucket_start").alias("ts"),
            F.col("rate_per_s").alias("v1"),
            F.lit(None).cast("double").alias("v2"),
        )
        # r8 (VERDICT r7 item 1): per-tag z-score anomaly flagging joins
        # the union — the two-pass broadcast-moments plan, coerced to the
        # entry's (kind, tag, ts, v1, v2) shape with v1=z, v2=value.
        # r18: computed from the fused global+seasonal frame (see above).
        zs = analytics.zscore_seasonal_fused(t, threshold=2.5)
        zscore_szn = (
            zs.select(
                "tag",
                F.col("timestamp").alias("ts"),
                F.expr(
                    "explode(array("
                    "  struct('zscore' AS kind, z_global AS v1,"
                    "         value AS v2, keep_global AS _keep),"
                    "  struct('szn' AS kind, z_seasonal AS v1,"
                    "         CAST(hod AS DOUBLE) AS v2,"
                    "         keep_seasonal AS _keep)"
                    ")) AS _x"
                ),
            )
            .filter("_x._keep")
            .select("_x.kind", "tag", "ts", "_x.v1", "_x.v2")
        )
        # r8: trailing 1h time-window average — gated via the SCALABLE
        # carried-frame difference plan (the sliding-frame twin is
        # pytest bit-equivalence-checked; running_totals precedent),
        # v1=avg, v2=contributing count. bucket_ms is a pure plan knob
        # (results identical for any value — fuzz-tested); the entry's
        # shared 6h skew granule keeps carry replication at W/bucket =
        # 1/6 at the same tags × buckets parallelism
        rolls = analytics.rolling_avg_scalable(
            t, bucket_ms=DERIV_BUCKET_MS
        ).select(
            F.lit("roll").alias("kind"),
            "tag",
            F.col("timestamp").alias("ts"),
            F.col("roll_avg").alias("v1"),
            F.col("roll_cnt").cast("double").alias("v2"),
        )
        # (late-r8 szn and r9 ewma legs now ride the fused frames above:
        # szn pairs with zscore, ewma with delta — values unchanged.)
        return (
            delta_ewma.unionByName(deltas_sc)
            .unionByName(rates)
            .unionByName(zscore_szn)
            .unionByName(rolls)
        )

    q["derivatives_by_tag"] = derivatives_by_tag
    o["derivatives_by_tag"] = f"""
        WITH d AS ({analytics.point_deltas_sql(EVENTS_T)}),
             r AS ({analytics.rate_per_bucket_sql(EVENTS_T, bucket_ms=DERIV_BUCKET_MS)})
        SELECT 'delta' AS kind, tag, "timestamp" AS ts,
               dv AS v1, CAST(dt_ms AS DOUBLE) AS v2 FROM d
        UNION ALL
        -- the scalable twin returns the SAME rows: one oracle CTE, two kinds
        SELECT 'delta_sc' AS kind, tag, "timestamp" AS ts,
               dv AS v1, CAST(dt_ms AS DOUBLE) AS v2 FROM d
        UNION ALL
        SELECT 'rate' AS kind, tag, bucket_start AS ts,
               rate_per_s AS v1, CAST(NULL AS DOUBLE) AS v2 FROM r
        UNION ALL
        SELECT 'zscore' AS kind, tag, "timestamp" AS ts,
               z AS v1, value AS v2
        FROM ({analytics.zscore_outliers_sql(EVENTS_T, threshold=2.5)})
        UNION ALL
        SELECT 'roll' AS kind, tag, "timestamp" AS ts,
               roll_avg AS v1, CAST(roll_cnt AS DOUBLE) AS v2
        FROM ({analytics.rolling_avg_sql(EVENTS_T)})
        UNION ALL
        SELECT 'szn' AS kind, tag, "timestamp" AS ts,
               z AS v1, CAST(hod AS DOUBLE) AS v2
        FROM ({analytics.seasonal_zscore_outliers_sql(EVENTS_T, threshold=2.5)})
        UNION ALL
        SELECT 'ewma' AS kind, tag, "timestamp" AS ts,
               CAST(ewma_fp AS DOUBLE) AS v1, value AS v2
        FROM ({analytics.ewma_dyadic_sql(EVENTS_T)})
    """

    # ---- OLAP extensions the reference lacks (SURVEY.md §2.6): rollup /
    # grouping sets and exact distinct aggregation. Scale: rollup is the
    # same single shuffle as the group-by (Spark expands grouping sets
    # map-side); count(DISTINCT) triggers Spark's two-phase expand+agg —
    # at 100 TB swap for approx_count_distinct (HLL, mergeable) when ±2%
    # is acceptable. ----
    def rollup_tag_day(s: SparkSession, d: str) -> DataFrame:
        t = events_as_tsdb(s, d).withColumn(
            # duck_div matches DuckDB's `//` trunc-toward-zero on negatives
            "day", numeric.duck_div(F.col("timestamp"), 86_400_000) * 86_400_000
        )
        return (
            t.rollup("tag", "day")
            .agg(F.sum("value").alias("result"))
            .withColumn("result", numeric.duck_round(F.col("result"), 4))
            .orderBy("tag", "day")
        )

    q["rollup_tag_day"] = rollup_tag_day
    o["rollup_tag_day"] = f"""
        WITH t AS ({EVENTS_T})
        SELECT tag, ("timestamp" // 86400000) * 86400000 AS day,
               round(sum(value), 4) AS result
        FROM t GROUP BY ROLLUP (tag, day)
    """

    # r8 fold: exact NDV + the portable HyperLogLog sketch as `kind`
    # legs. The hll leg estimates distinct TIMESTAMPS per tag from
    # 256 integer registers — engine-exact by construction
    # (operators/sketches.py), the bounded-state scale path the exact
    # count(DISTINCT) shuffle can't be at 100 TB.
    def ndv_by_tag(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import sketches

        t = events_as_tsdb(s, d)
        exact = (
            t.groupBy(F.col("tag").alias("grp"))
            .agg(F.countDistinct("value").cast("double").alias("result"))
            .withColumn("kind", F.lit("exact"))
        )
        hll = sketches.hll_ndv(
            t, "tag", F.col("timestamp").cast("string")
        ).select(
            F.col("key").alias("grp"),
            F.col("ndv_est").alias("result"),
            F.lit("hll").alias("kind"),
        )
        # late-r8 leg: HLL SET OPERATIONS — per-split distinct-SHINGLE
        # (3-gram phrase) NDV plus pairwise union / inclusion-exclusion
        # intersection over the corpus splits (the "how much does train
        # phrasing overlap valid/test" question; single tokens would be
        # degenerate — the fixture vocabulary is fully shared). The
        # register table (≤ 3×256 rows) is persist-tracked: the overlap
        # plan references it once per pair leg plus the singles
        # estimate, and each reference would otherwise re-run the
        # shingle-explode scan.
        from timeseries_db_spark.operators.corpus import _split_col
        from timeseries_db_spark.operators.dedup import _persist_tracked, doc_shingles

        sh = doc_shingles(_docs(s, d)).select(
            _split_col(F.col("doc_id")).alias("split"),
            F.col("shingle").cast("string").alias("tok"),
        )
        regs = _persist_tracked(
            "hll_split_regs",
            sketches.hll_registers(sh, "split", F.col("tok")),
        )
        tok_hll = sketches.hll_estimate(regs).select(
            F.col("key").alias("grp"),
            F.col("ndv_est").alias("result"),
            F.lit("tok_hll").alias("kind"),
        )
        ov = sketches.hll_overlap(regs, SPLIT_PAIRS)
        unions = ov.select(
            F.col("key").alias("grp"),
            F.col("union_est").alias("result"),
            F.lit("hll_union").alias("kind"),
        )
        inters = ov.select(
            F.col("key").alias("grp"),
            F.col("inter_est").alias("result"),
            F.lit("hll_inter").alias("kind"),
        )
        # r9: cross-series Pearson correlation over hourly-aligned
        # bucket means — exact-integer pair statistics (the linfit
        # discipline), so the full correlation matrix value-hashes;
        # coerced as (grp="a|b", result=r)
        corr = analytics.tag_correlations(t).select(
            F.concat_ws("|", "tag_a", "tag_b").alias("grp"),
            F.col("r").alias("result"),
            F.lit("corr").alias("kind"),
        )
        return (
            exact.unionByName(hll)
            .unionByName(tok_hll)
            .unionByName(unions)
            .unionByName(inters)
            .unionByName(corr)
        )

    q["agg_ndv_by_tag"] = ndv_by_tag
    from timeseries_db_spark.operators import sketches as _sketches
    from timeseries_db_spark.operators.corpus import _split_sql as _split_sql_fn
    from timeseries_db_spark.operators.dedup import _SHINGLES_CTE_DUCK as _SH_CTE

    SPLIT_TOKS_SQL = (
        f"WITH {_SH_CTE} "
        f"SELECT {_split_sql_fn('doc_id')} AS split, shingle::VARCHAR AS tok"
        " FROM sh"
    )
    _analytics_corr_sql = analytics.tag_correlations_sql(EVENTS_T)
    # ONE overlap CTE referenced by both set-op legs (VERDICT r8 item 6:
    # inlining hll_overlap_sql twice made DuckDB re-run the full shingle
    # explode + register build per leg — oracle-side cost only, but it
    # doubled the driver verify time of this entry). MATERIALIZED keeps
    # the planner from re-inlining the subtree per reference.
    o["agg_ndv_by_tag"] = f"""
        WITH t AS ({EVENTS_T}),
        ov AS MATERIALIZED (
            {_sketches.hll_overlap_sql(SPLIT_TOKS_SQL, "split", "tok", SPLIT_PAIRS)}
        )
        SELECT tag AS grp, CAST(count(DISTINCT value) AS DOUBLE) AS result,
               'exact' AS kind
        FROM t GROUP BY tag
        UNION ALL
        SELECT key AS grp, ndv_est AS result, 'hll' AS kind
        FROM ({_sketches.hll_ndv_sql(EVENTS_T, "tag", '"timestamp"::VARCHAR')})
        UNION ALL
        SELECT key AS grp, ndv_est AS result, 'tok_hll' AS kind
        FROM ({_sketches.hll_ndv_sql(SPLIT_TOKS_SQL, "split", "tok")})
        UNION ALL
        SELECT key AS grp, union_est AS result, 'hll_union' AS kind FROM ov
        UNION ALL
        SELECT key AS grp, inter_est AS result, 'hll_inter' AS kind FROM ov
        UNION ALL
        SELECT tag_a || '|' || tag_b AS grp, r AS result, 'corr' AS kind
        FROM ({_analytics_corr_sql})
    """

    # ---- relational joins over the TPC-H-shaped tables ----
    from timeseries_db_spark.operators import joins

    # r8 fold: the broadcast-dim revenue join AND the bucketed
    # point-in-interval (range) join share one entry with a `kind`
    # discriminator on a (kind, grp, result) schema — revenue rows carry
    # the nation, interval rows the (tag, window-start) maintenance
    # window with its point count / value sum as two kinds
    def join_family(s: SparkSession, d: str) -> DataFrame:
        rev = joins.revenue_by_nation(s, d).select(
            F.lit("revenue").alias("kind"),
            F.col("nation").alias("grp"),
            F.col("revenue").alias("result"),
        )
        # the window/overlap stat tables are (tags×days)-sized and each
        # feeds TWO projection legs — persist them or the interval join
        # (resp. the sessionize window pass) runs once per leg.
        # r17: lazy-persist — CONSTRUCTING these two plans costs
        # ~0.8 s of driver/py4j work per invocation (measured warm),
        # re-paid on every bench/gate re-invocation even though the
        # persisted generation already existed; the builders now run
        # only on a cache miss, overlapped on a small pool (guide
        # §2.6). plan_key = base-view semantic hash + the window
        # literals — the full input identity of both plans.
        from concurrent.futures import ThreadPoolExecutor

        from timeseries_db_spark.operators.dedup import _persist_tracked_lazy

        base_h = events_as_tsdb(s, d).semanticHash()
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_win = pool.submit(
                lambda: _persist_tracked_lazy(
                    "join_iv_win",
                    f"{base_h}:{LO}:{HI}",
                    lambda: joins.maintenance_window_stats(
                        events_as_tsdb(s, d), lo=LO, hi=HI
                    ),
                )
            )
            f_ov = pool.submit(
                lambda: _persist_tracked_lazy(
                    "join_ov_win",
                    f"{base_h}:{LO}:{HI}",
                    lambda: joins.session_window_overlap(s, d, lo=LO, hi=HI),
                )
            )
            win = f_win.result()
            ov = f_ov.result()
        grp = F.concat_ws(":", "tag", F.col("win_start").cast("string"))
        cnt = win.select(
            F.lit("iv_cnt").alias("kind"),
            grp.alias("grp"),
            F.col("n_points").cast("double").alias("result"),
        )
        sm = win.select(
            F.lit("iv_sum").alias("kind"),
            grp.alias("grp"),
            F.col("win_sum").alias("result"),
        )
        # late-r8 legs: interval×interval OVERLAP join (user sessions ∩
        # maintenance windows, first-overlap-bucket dedup — the other
        # range-join shape Spark natively nested-loops); built above on
        # the shared pool
        ovc = ov.select(
            F.lit("ov_cnt").alias("kind"),
            F.col("win_start").cast("string").alias("grp"),
            F.col("ov_cnt").alias("result"),
        )
        ovm = ov.select(
            F.lit("ov_ms").alias("kind"),
            F.col("win_start").cast("string").alias("grp"),
            F.col("ov_ms").alias("result"),
        )
        return (
            rev.unionByName(cnt)
            .unionByName(sm)
            .unionByName(ovc)
            .unionByName(ovm)
        )

    q["join_revenue_by_nation"] = join_family
    _mw_sql = joins.maintenance_window_stats_sql(EVENTS_T, lo=LO, hi=HI)
    _ov_sql = joins.session_window_overlap_sql(lo=LO, hi=HI)
    o["join_revenue_by_nation"] = f"""
        SELECT 'revenue' AS kind, nation AS grp, revenue AS result
        FROM ({joins.REVENUE_BY_NATION_SQL})
        UNION ALL
        SELECT 'iv_cnt' AS kind,
               tag || ':' || CAST(win_start AS VARCHAR) AS grp,
               CAST(n_points AS DOUBLE) AS result
        FROM ({_mw_sql})
        UNION ALL
        SELECT 'iv_sum' AS kind,
               tag || ':' || CAST(win_start AS VARCHAR) AS grp,
               win_sum AS result
        FROM ({_mw_sql})
        UNION ALL
        SELECT 'ov_cnt' AS kind, CAST(win_start AS VARCHAR) AS grp,
               ov_cnt AS result
        FROM ({_ov_sql})
        UNION ALL
        SELECT 'ov_ms' AS kind, CAST(win_start AS VARCHAR) AS grp,
               ov_ms AS result
        FROM ({_ov_sql})
    """

    # r9 fold: the TPC-H Q3 top-k shares the entry with PageRank over
    # the customer↔supplier trade graph (operators/graph.py — exact
    # integer micro-unit updates, so the iterative result value-hashes)
    # on a (kind, grp, result) schema
    def top_orders_and_pagerank(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import graph

        top = joins.top_orders_by_segment(s, d).select(
            F.lit("top").alias("kind"),
            F.col("orderkey").cast("string").alias("grp"),
            F.col("revenue").alias("result"),
        )
        pr = graph.supplier_influence_pagerank(s, d).select(
            F.lit("pr").alias("kind"),
            F.col("node").cast("string").alias("grp"),
            F.col("rank").cast("double").alias("result"),
        )
        return top.unionByName(pr)

    q["join_top_orders_building"] = top_orders_and_pagerank
    from timeseries_db_spark.operators import graph as _graph

    o["join_top_orders_building"] = (
        "SELECT 'top' AS kind, CAST(orderkey AS VARCHAR) AS grp,"
        " revenue AS result FROM ("
        + joins.top_orders_by_segment_sql()
        + ") UNION ALL SELECT 'pr' AS kind, CAST(node AS VARCHAR) AS grp,"
        " rank::DOUBLE AS result FROM ("
        + _graph.supplier_influence_pagerank_sql()
        + ")"
    )

    # late-r8 fold: the Deequ-style data-quality report rides the
    # region entry's (name, value) shape — completeness, uniqueness,
    # referential integrity, and domain-range metrics, one conditional-
    # aggregate scan per table + one anti-join
    def region_and_dq(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import dq

        rev = joins.revenue_by_region(s, d).select(
            F.lit("revenue").alias("kind"), "region", "revenue"
        )
        rep = dq.dq_report(s, d).select(
            F.lit("dq").alias("kind"),
            F.col("metric").alias("region"),
            F.col("value").alias("revenue"),
        )
        return rev.unionByName(rep)

    from timeseries_db_spark.operators import dq as _dq

    q["join_revenue_by_region"] = region_and_dq
    o["join_revenue_by_region"] = f"""
        SELECT 'revenue' AS kind, * FROM ({joins.REVENUE_BY_REGION_SQL})
        UNION ALL
        SELECT 'dq' AS kind, metric AS region, value AS revenue
        FROM ({_dq.dq_report_sql()})
    """

    q["join_part_brand_stats"] = joins.part_brand_stats
    o["join_part_brand_stats"] = joins.PART_BRAND_STATS_SQL

    # ---- text analysis: ONE single-scan entry carrying every per-doc
    # feature (token counts incl. BPE-ish, quality components, lang-id,
    # content + rolling fingerprints). The per-feature operators remain
    # the API surface (tests/test_text.py mirrors each against its own
    # oracle); folding them here freed four gate slots for the vocab,
    # sampling, curation, and quantization entries below. ----
    q["text_features"] = lambda s, d: text.features(_docs(s, d))
    o["text_features"] = text.features_sql()

    # r8 fold: top-N vocabulary + BM25 query-relevance top-k as `kind`
    # legs — both are corpus-statistics rankers with a (key, weight,
    # rank) shape; the bm25 leg's micro-unit scores are exact integers
    # (LM-style fixed-point partials), so the union value-hashes whole
    BM25_TERMS = ("spark", "query", "window", "hash")

    def vocab_and_bm25(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import sketches
        from timeseries_db_spark.operators.dedup import _persist_tracked

        # one materialization of the (token, freq) count table serves
        # the vocab leg AND the weighted count-min build AND the cms
        # probe set (and repeated sweep invocations) — the upstream
        # token explode+agg is the entry's dominant cost, and counters
        # are additive so the sketch over |distinct| weighted rows is
        # IDENTICAL to one over the re-exploded corpus (late-r8: this
        # dropped the entry's second full tokenize pass)
        # r17: lazy — the tokenize expression chain is a large plan
        # whose construction+hash repeated per invocation (guide §1.2
        # driver work); the builder now runs only on a cache miss
        from timeseries_db_spark.operators.dedup import _persist_tracked_lazy

        docs = _docs(s, d)
        tok_counts = _persist_tracked_lazy(
            "token_counts",
            str(docs.semanticHash()),
            lambda: text.token_counts(docs),
        )
        topv = text.vocab_topn(_docs(s, d), 100, counts=tok_counts)
        vocab = topv.withColumn("kind", F.lit("vocab"))
        bm25 = (
            text.bm25_topk(_docs(s, d), BM25_TERMS, 20, counts=tok_counts)
            .select(
                F.col("doc_id").cast("string").alias("token"),
                F.col("score_fp").alias("freq"),
                F.col("rank").alias("rnk"),
            )
            .withColumn("kind", F.lit("bm25"))
        )
        # cms leg: the count-min estimate for every vocab token, with
        # its vocab rank carried through — est >= true freq by the
        # sketch's no-undercount guarantee, equal on this vocabulary
        # (w = 1024 >> distinct tokens); counters built WEIGHTED from
        # the shared count table, not a second corpus explode
        counters = sketches.cms_counters(
            tok_counts, F.col("token"), weight_col="freq"
        )
        cms = sketches.cms_estimate(
            counters, topv, "token", carry=("rnk",)
        ).select(
            F.col("item").alias("token"),
            F.col("est").alias("freq"),
            "rnk",
            F.lit("cms").alias("kind"),
        )
        return vocab.unionByName(bm25).unionByName(cms)

    q["text_vocab_topn"] = vocab_and_bm25
    from timeseries_db_spark.operators import sketches as _sk

    o["text_vocab_topn"] = (
        f"SELECT *, 'vocab' AS kind FROM ({text.vocab_topn_sql(100)})"
        " UNION ALL "
        "SELECT doc_id::VARCHAR AS token, score_fp AS freq, rank AS rnk,"
        f" 'bm25' AS kind FROM ({text.bm25_topk_sql(BM25_TERMS, 20)})"
        " UNION ALL "
        "SELECT e.item AS token, e.est AS freq, v.rnk, 'cms' AS kind"
        f" FROM ({_sk.cms_token_estimates_sql(text.vocab_topn_sql(100))}) e"
        f" JOIN ({text.vocab_topn_sql(100)}) v ON v.token = e.item"
    )

    # r13 goph leg shared pieces: the constructed page template (one
    # source of truth — {clean} and the repeat-count cast {bn} are the
    # only engine-dialect seams) and the tightened gate thresholds,
    # passed to BOTH text.gopher_quality and its generated DuckDB twin.
    _GOPH_PAGE = (
        "concat('Doc ', doc_id, ' opens with plain words here. ',"
        " {clean}, chr(10),"
        " repeat('- bullet item line' || chr(10), {bn}),"
        " CASE WHEN doc_id % 4 = 0 THEN"
        " 'This line trails off...' || chr(10) ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN"
        " 'An exactly duplicated sentence rides here.' || chr(10) ||"
        " 'An exactly duplicated sentence rides here.' || chr(10)"
        " ELSE '' END,"
        " CASE WHEN doc_id % 6 = 0 THEN"
        " '## ## ## symbol heavy words now' || chr(10) ELSE '' END,"
        " CASE WHEN doc_id % 7 = 0 THEN"
        " chr(10) || 'Repeated paragraph block rides alone.' ||"
        " chr(10) || chr(10) || 'Repeated paragraph block rides alone.'"
        " || chr(10) ELSE '' END,"
        " 'Closing line for doc ', doc_id, ' ends the page.')"
    )
    _GOPH_GATE = {
        "min_words": 10,
        "max_words": 100_000,
        "min_mean_word_len": 2.0,
        "max_mean_word_len": 12.0,
        "max_symbol_word_ratio": 0.1,
        "max_bullet_frac": 0.3,
        "max_ellipsis_frac": 0.2,
        "min_alpha_word_frac": 0.6,
        "max_dup_line_frac": 0.2,
        "max_dup_para_frac": 0.4,
        "max_dup_line_char_frac": 0.25,
    }

    # r13 pmet leg shared construction: a head section cycling every
    # page-meta field by doc_id — lang by parity, canonical every 3rd,
    # noindex every 5th, a JSON-LD block except every 4th, description
    # length 10 + id%20; {dn} is the repeat-count cast seam.
    _PMETA_PAGE = (
        "concat('<html lang=\"',"
        " CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de-AT' END, '\">',"
        " '<head><title>Doc ', doc_id, ' Title</title>',"
        " CASE WHEN doc_id % 3 = 0 THEN concat("
        " '<link rel=\"canonical\" href=\"https://example',"
        " doc_id % 7, '.com/doc', doc_id, '\">') ELSE '' END,"
        " '<meta property=\"og:title\" content=\"OG ', doc_id, '\">',"
        " '<meta name=\"description\" content=\"',"
        " repeat('d', {dn}), '\">',"
        " CASE WHEN doc_id % 5 = 0 THEN"
        " '<meta name=\"robots\" content=\"noindex\">' ELSE '' END,"
        " CASE WHEN doc_id % 4 < 3 THEN concat("
        " '<script type=\"application/ld+json\">"
        "{{\"@type\": \"T', doc_id % 9, '\"}}</script>') ELSE '' END,"
        " '</head><body>x</body></html>')"
    )

    # r13 unor leg shared construction: combining acute (must NFC-fold
    # into the precomposed char), zero-widths (id%4 of them), BEL
    # controls (id%3), curly quotes every 3rd doc — the characters are
    # embedded as UTF-8 literals because Spark's chr() cannot produce
    # codepoints above 255. {dn}/{cn} are the repeat-count cast seams.
    _UNOR_PAGE = (
        "concat('Doc ', doc_id, ' café text',"
        " repeat('​', {dn}),"
        " repeat('\x07', {cn}),"
        " CASE WHEN doc_id % 3 = 0 THEN '“quoted”'"
        " ELSE '' END,"
        " ' end')"
    )

    # r14 slid leg shared construction: one script per doc_id%10 mode
    # (Latin-with/without-stopwords, Arabic, Greek, Hebrew, Devanagari,
    # kana+Han — the ja override — Hangul, Cyrillic, Thai, pure Han),
    # script chars embedded as UTF-8 literals like _UNOR_PAGE; {rn} is
    # the repeat-count cast seam. Shared Spark-SQL/DuckDB syntax.
    _SLID_PAGE = (
        "CASE (doc_id % 10)"
        " WHEN 0 THEN (CASE WHEN doc_id % 2 = 0"
        " THEN 'the quick and the lazy of it is' ELSE 'zzz qqq xxx' END)"
        " WHEN 1 THEN repeat('م', {rn})"
        " WHEN 2 THEN repeat('λ', {rn})"
        " WHEN 3 THEN repeat('א', {rn})"
        " WHEN 4 THEN repeat('क', {rn})"
        " WHEN 5 THEN repeat('ひ', {rn}) || '中中中中中中'"
        " WHEN 6 THEN repeat('한', {rn})"
        " WHEN 7 THEN repeat('ж', {rn})"
        " WHEN 8 THEN repeat('ท', {rn})"
        " ELSE repeat('中', {rn}) END"
        " || ' Doc ' || doc_id || ' 123.'"
    )

    # PII scrubbing (email + IPv4 redaction with per-doc counts) — the
    # repetition/diversity signals ride inside text_features; this is
    # the one text op whose OUTPUT is a rewritten text column, so it
    # gets its own hash-checked entry (slot freed by folding the
    # grouped desc-limit shape into agg_by_ts). r11: + html leg — the
    # REAL HTML→text state machine (script/style/comment drop, tag
    # strip, entity decode) runs on HTML the entry CONSTRUCTS from each
    # doc's sanitized text, so the oracle restates the extraction
    # closed-form without parsing anything. Column mapping:
    # pii:  n_a=n_emails  n_b=n_ips      out_text=text_scrubbed
    # html: n_a=n_tags    n_b=n_entities out_text=extracted text
    def text_pii_scrub(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        pii = text.pii_scrub(docs).select(
            "doc_id",
            F.lit("pii").alias("kind"),
            F.col("n_emails").alias("n_a"),
            F.col("n_ips").alias("n_b"),
            F.col("text_scrubbed").alias("out_text"),
        )
        clean = (
            "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', ''),"
            " ' +', ' '))"
        )
        # r12: the constructed HTML varies BY doc_id — repeat('<i>z</i>',
        # doc_id%4) and repeat('&#33;', doc_id%3) make n_tags/n_entities
        # doc-dependent closed forms (14 + 2*(id%4), 3 + id%3) instead of
        # template constants, so the counters are genuinely gate-checked
        html_docs = docs.select(
            "doc_id",
            F.expr(
                "concat('<html><head><script>var x=1;</script>',"
                "'<style>p{}</style></head><body><!-- c --><h1>Doc ',"
                f"doc_id, '</h1><p>', {clean},"
                " repeat('<i>z</i>', cast(doc_id % 4 as int)),"
                "' &nbsp;&amp;tail&#33;',"
                " repeat('&#33;', cast(doc_id % 3 as int)),"
                "'</p></body></html>')"
            ).alias("html"),
        )
        hx = text.html_extract(html_docs, "html").select(
            "doc_id",
            F.lit("html").alias("kind"),
            F.col("n_tags").alias("n_a"),
            F.col("n_entities").alias("n_b"),
            F.col("text").alias("out_text"),
        )
        # r11 url leg: canonical-URL dedup key — the entry CONSTRUCTS a
        # messy URL from doc_id (upper-case scheme/host, default port,
        # unsorted params, fragment) and url_normalize canonicalizes
        # it; the oracle runs the generated DuckDB twin of the SAME
        # operator (engine parity on real expressions, not a restated
        # constant). n_a=n_params, n_b=host length. r12: the RFC 3986
        # completion is exercised too — dot segments (/A/./…/x/../…),
        # mixed-case percent escapes (%61→a unreserved-decode, %2f→%2F
        # reserved case-norm, %7e→~), a param escape (%4a is ALPHA →
        # J), and an EMPTY path every 3rd doc (→ '/').
        url_docs = docs.select(
            "doc_id",
            F.expr(
                "concat('HTTP://Example', doc_id % 7, '.COM',"
                " CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,"
                " CASE WHEN doc_id % 3 = 0 THEN ''"
                " ELSE concat('/A/./P%61th', doc_id, '/x%2f/../End%7e')"
                " END,"
                " '?b=2&a=', doc_id % 5, '&c=%4a#frag')"
            ).alias("url"),
        )
        # r12: out_text also carries the SURT form — the CDX-index join
        # key — so the reversed-label/port/www handling is value-checked
        ux = text.url_normalize(url_docs).select(
            "doc_id",
            F.lit("url").alias("kind"),
            F.col("n_params").alias("n_a"),
            F.expr("length(host)").cast("long").alias("n_b"),
            F.expr("concat(url_norm, ' @ ', surt)").alias("out_text"),
        )

        # r11 warc leg: the FULL Common-Crawl-style ingest chain under
        # the gate — per-doc WARC (warcinfo + response records) built
        # around the SAME constructed HTML, then WARC parse → HTTP body
        # → HTML→text, one mapInPandas stage. out_text = uri | text so
        # the record-header parse is value-checked too. r12: real-crawl
        # transport + charset realism, cycled by doc_id so every shape
        # is under the gate —
        #   transport t = doc_id % 4: 0 plain record / 1 per-record
        #   gzip members (.warc.gz layout) / 2 chunked transfer-
        #   encoding / 3 Content-Encoding: gzip THEN chunked (the
        #   real-crawl stack: CE applied first, TE for transport);
        #   charset c = doc_id % 3: 0 utf-8 / 1 ISO-8859-1 with a
        #   latin-1 ' café' token appended (utf-8-replace would garble
        #   the 0xE9 byte → hash flip) / 2 utf-16 (BOM; utf-8-replace
        #   would garble EVERYTHING). 4×3 combos cycle with period 12.
        def build_warc(batches):
            import pandas as _pd

            from timeseries_db_spark.operators import warc as W

            _CT = {
                0: ("text/html; charset=utf-8", "utf-8", ""),
                1: ("text/html; charset=ISO-8859-1", "latin-1", " caf\xe9"),
                2: ("text/html; charset=utf-16", "utf-16", ""),
            }
            for pdf in batches:
                if not len(pdf):
                    continue
                payloads = []
                for did, html in zip(pdf["doc_id"], pdf["html"]):
                    did = int(did)
                    t, c = did % 4, did % 3
                    uri = f"http://example{did % 7}.com/doc{did}"
                    ctype, codec, extra = _CT[c]
                    block = W.http_response_block(
                        (html + extra).encode(codec),
                        content_type=ctype,
                        gzip_body=(t == 3),
                        chunked=(t in (2, 3)),
                    )
                    payloads.append(
                        W.warc_build(
                            [
                                ("warcinfo", "", b"software: tsdb\r\n"),
                                ("response", uri, block),
                            ],
                            gzip_records=(t == 1),
                        )
                    )
                yield _pd.DataFrame(
                    {
                        "asset_id": pdf["doc_id"],
                        "kind": "warc",
                        "payload": payloads,
                    }
                )

        from timeseries_db_spark.operators import warc as _warc

        warc_assets = html_docs.mapInPandas(
            build_warc, schema="asset_id long, kind string, payload binary"
        )
        wx = _warc.warc_extract_text(warc_assets).select(
            F.col("asset_id").alias("doc_id"),
            F.lit("warc").alias("kind"),
            F.col("n_tags").alias("n_a"),
            F.col("n_entities").alias("n_b"),
            F.expr("concat(uri, ' | ', text)").alias("out_text"),
        )

        # r13 werr leg (VERDICT items 1+2): dirty-crawl-segment
        # realism under the gate. Each doc ships ONE deliberately
        # damaged WARC file — a good 200 page, a 404/410/503 error
        # page (status cycles by doc_id%3), a 301 redirect stub
        # (except every 3rd doc), a `revisit` record carrying
        # WARC-Payload-Digest, and structural corruption: even docs
        # are plain streams with TWO oversized-Content-Length records
        # mid-file, odd docs are .warc.gz member streams with ONE
        # junk (magic-less) member. The corruption sits BETWEEN good
        # records, so the leg value-checks that (a) damage costs
        # exactly its own records — n_a = quarantined error rows =
        # 2 - doc_id%2; (b) non-200 bodies are surfaced but NEVER
        # extracted — n_b = skipped responses = 2 - (doc_id%3==0),
        # and out_text pins their total extracted length at 0 plus
        # the min skipped status (404 when only the error page, else
        # 301); (c) the revisit digest and the good page's text both
        # survive. Column mapping:
        # werr: n_a=n_error_rows n_b=n_non200_responses
        #       out_text = good_text | revisit_digest | len(non-200
        #       extracted text)==0 | min skipped status |
        #       mime:len of the binary 200 response ('image/png:0' —
        #       the bait inside the PNG body must never extract)
        def build_werr(batches):
            import pandas as _pd

            from timeseries_db_spark.operators import warc as W

            corrupt = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 999999\r\n\r\nshort\r\n\r\n"
            )
            for pdf in batches:
                if not len(pdf):
                    continue
                ids, payloads = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    uri = f"http://example{did % 7}.com/doc{did}"
                    bad_status = (404, 410, 503)[did % 3]
                    head = [
                        ("warcinfo", "", b"software: tsdb\r\n"),
                        (
                            "response",
                            uri,
                            W.http_response_block(
                                f"<p>Good {did}</p>".encode()
                            ),
                        ),
                    ]
                    tail = [
                        (
                            "response",
                            uri + "/missing",
                            W.http_response_block(
                                f"<p>Error body {did}</p>".encode(),
                                status=bad_status,
                            ),
                        ),
                    ]
                    if did % 3:
                        tail.append(
                            (
                                "response",
                                uri + "/old",
                                W.http_response_block(
                                    b"",
                                    status=301,
                                    extra_headers=[f"Location: {uri}"],
                                ),
                            )
                        )
                    # r13 MIME filter: a 200 image/png whose body
                    # CONTAINS html-looking bait — if the extractor
                    # ever pushes a binary body through HTML
                    # extraction, the bait text leaks and the hash
                    # flips (out_text pins mime:extracted_len at
                    # 'image/png:0')
                    tail.append(
                        (
                            "response",
                            uri + "/img.png",
                            W.http_response_block(
                                b"\x89PNG\r\n\x1a\n<p>BAIT leak</p>"
                                + bytes(16),
                                content_type="image/png",
                            ),
                        )
                    )
                    tail.append(
                        (
                            "revisit",
                            uri,
                            b"HTTP/1.1 200 OK\r\n\r\n",
                            [f"WARC-Payload-Digest: sha1:REV{did}"],
                        )
                    )
                    if did % 2:  # .warc.gz with one junk member mid-file
                        parts = [
                            W.gzip_member(W.warc_build([r])) for r in head
                        ]
                        parts.append(b"XXJUNKXX" * 4)
                        parts += [
                            W.gzip_member(W.warc_build([r])) for r in tail
                        ]
                        payload = b"".join(parts)
                    else:  # plain stream with two oversized-CL records
                        payload = (
                            W.warc_build(head)
                            + corrupt
                            + corrupt
                            + W.warc_build(tail)
                        )
                    ids.append(did)
                    payloads.append(payload)
                yield _pd.DataFrame(
                    {"asset_id": ids, "kind": "warc", "payload": payloads}
                )

        werr_assets = docs.select("doc_id").mapInPandas(
            build_werr, schema="asset_id long, kind string, payload binary"
        )
        skipped = (F.col("rec_type") == "response") & ~F.col(
            "status"
        ).between(200, 299)
        werr = (
            _warc.warc_extract_text(werr_assets)
            .groupBy(F.col("asset_id").alias("doc_id"))
            .agg(
                F.sum((F.col("rec_type") == "error").cast("long")).alias(
                    "n_a"
                ),
                F.sum(skipped.cast("long")).alias("n_b"),
                F.concat(
                    F.max(
                        F.when(
                            (F.col("rec_type") == "response")
                            & F.col("status").between(200, 299),
                            F.col("text"),
                        )
                    ),
                    F.lit(" | "),
                    F.max(
                        F.when(
                            F.col("rec_type") == "revisit", F.col("digest")
                        )
                    ),
                    F.lit(" | "),
                    F.sum(F.when(skipped, F.length("text"))).cast("string"),
                    F.lit(" | "),
                    F.min(F.when(skipped, F.col("status"))).cast("string"),
                    F.lit(" | "),
                    F.max(
                        F.when(
                            F.col("mime").startswith("image/"),
                            F.concat(
                                F.col("mime"),
                                F.lit(":"),
                                F.length("text").cast("string"),
                            ),
                        )
                    ),
                ).alias("out_text"),
            )
            .select(
                "doc_id", F.lit("werr").alias("kind"), "n_a", "n_b",
                "out_text",
            )
        )

        # r12 wet + wat legs: Common Crawl's OTHER two container views.
        # WET files carry pre-extracted plain text as `conversion`
        # records in the same ISO 28500 envelope (most LLM corpus
        # pipelines start here); WAT files carry per-page JSON metadata
        # as `metadata` records. One builder emits both views per doc
        # (odd ids ship as per-record gzip members); the WAT leg's
        # field extraction runs JVM-side via get_json_object, per the
        # operator's contract. n_a/n_b are doc-dependent closed forms
        # (text length / uri length; WAT restates the content length
        # through the JSON envelope).
        def build_crawl_views(batches):
            import pandas as _pd

            from timeseries_db_spark.operators import warc as W

            for pdf in batches:
                if not len(pdf):
                    continue
                ids, kinds, payloads = [], [], []
                for did, cl in zip(pdf["doc_id"], pdf["clean"]):
                    did = int(did)
                    cl = str(cl)
                    uri = f"http://example{did % 7}.com/doc{did}"
                    gz = did % 2 == 1
                    ids.append(did)
                    kinds.append("wet")
                    payloads.append(
                        W.warc_build(
                            [
                                ("warcinfo", "", b"software: tsdb\r\n"),
                                ("conversion", uri, cl.encode("utf-8")),
                            ],
                            gzip_records=gz,
                        )
                    )
                    meta = (
                        '{"Envelope": {"WARC-Header-Metadata": '
                        '{"WARC-Target-URI": "%s"}, "Payload-Metadata": '
                        '{"Actual-Content-Length": %d}}}' % (uri, len(cl))
                    )
                    ids.append(did)
                    kinds.append("wat")
                    payloads.append(
                        W.warc_build(
                            [("metadata", uri, meta.encode("utf-8"))],
                            gzip_records=gz,
                        )
                    )
                yield _pd.DataFrame(
                    {"asset_id": ids, "kind": kinds, "payload": payloads}
                )

        crawl_assets = docs.select(
            "doc_id", F.expr(clean).alias("clean")
        ).mapInPandas(
            build_crawl_views, schema="asset_id long, kind string, payload binary"
        )
        wet = _warc.wet_extract_text(crawl_assets).select(
            F.col("asset_id").alias("doc_id"),
            F.lit("wet").alias("kind"),
            F.expr("length(text)").cast("long").alias("n_a"),
            F.expr("length(uri)").cast("long").alias("n_b"),
            F.expr("concat(uri, ' | ', text)").alias("out_text"),
        )
        wat = _warc.wat_extract_meta(crawl_assets).select(
            F.col("asset_id").alias("doc_id"),
            F.lit("wat").alias("kind"),
            F.get_json_object(
                "meta_json",
                "$['Envelope']['Payload-Metadata']['Actual-Content-Length']",
            )
            .cast("long")
            .alias("n_a"),
            F.expr("length(uri)").cast("long").alias("n_b"),
            F.concat(
                F.get_json_object(
                    "meta_json",
                    "$['Envelope']['WARC-Header-Metadata']['WARC-Target-URI']",
                ),
                F.lit(" | wat"),
            ).alias("out_text"),
        )
        # r12 pdf leg: PDF text extraction (operators/pdf.py) — the
        # fixture writes a real PDF per doc around the sanitized text
        # (Flate for even ids, raw for odd; TJ kerned arrays every 3rd
        # id; odd ids get a second page) and the REAL extraction must
        # reproduce the closed-form line structure. n_a = show ops,
        # n_b = streams — both doc-dependent. r13 (VERDICT item 5):
        # every 5th doc carries LZWDecode content (the TIFF-LZW reuse)
        # and every 7th ships the PDF-1.5 layout — ObjStm'd document
        # dicts + indirect /Length integers + a binary /Type /XRef
        # stream — so the xref walk, ObjStm expansion, and
        # indirect-length resolution run under the gate (those docs
        # count 2 extra infrastructure streams in n_b).
        # r13 late: the fixture is now also ENCRYPTED and ILLUSTRATED —
        #   encryption cycles the Standard security handler by
        #   doc_id%4: plain / RC4-40 (/V1/R2) / RC4-128 (/V2/R3,
        #   r14: USER-password-locked — the leg passes the known
        #   password and Algorithm 4/5 must authenticate it) /
        #   AES-128 /AESV2 (/V4/R4, empty user password); decode
        #   is TRANSPARENT (Algorithm 6 auth + per-object Algorithm-1
        #   keys + stream decrypt), so the SAME text/show closed forms
        #   pin it — a wrong key garbles every downstream value, the
        #   warc-leg transport-cycling discipline;
        #   every EVEN doc embeds a 16×16 grayscale /Subtype /Image
        #   XObject of four per-block-constant 8×8 blocks v_k =
        #   (10*doc_id + 31k) % 256 — DCTDecode (doc_id%4==0, through
        #   the repo JPEG decoder, exact on per-block-constant pixels)
        #   or FlateDecode (doc_id%4==2) — so n_b gains the image
        #   stream (even: +1) and out_text gains ' | IMG:' +
        #   64*Σv_k, the video-leg px_sum closed form.
        def build_pdf(batches):
            import pandas as _pd

            from timeseries_db_spark.operators import pdf as PD

            _ENC = [None, "rc4-40", "rc4-128", "aesv2"]
            for b in batches:
                if not len(b):
                    continue
                ids, payloads = [], []
                for did, cl in zip(b["doc_id"], b["clean"]):
                    did = int(did)
                    pages = [
                        [f"Doc {did}", str(cl)]
                        + [f"L{k}" for k in range(did % 3)]
                    ]
                    if did % 2:
                        pages.append([f"End {did}"])
                    img = None
                    if did % 2 == 0:
                        vals = [(10 * did + 31 * k) % 256 for k in range(4)]
                        img = (
                            16,
                            16,
                            1,
                            bytes(
                                vals[(y // 8) * 2 + (x // 8)]
                                for y in range(16)
                                for x in range(16)
                            ),
                        )
                    ids.append(did)
                    payloads.append(
                        PD.pdf_build(
                            pages,
                            flate=(did % 2 == 0),
                            use_tj_array=(did % 3 == 0),
                            lzw=(did % 5 == 0),
                            xref_stream=(did % 7 == 0),
                            encrypt=_ENC[did % 4],
                            # r14: the RC4-128 state is USER-LOCKED —
                            # extraction must authenticate the known
                            # password (Algorithm 4/5), not the empty one
                            user_pwd=(b"tsdbpw" if did % 4 == 2 else b""),
                            cid_font=(did % 3 == 1),
                            image=img,
                            image_filter=(
                                "dct" if did % 4 == 0 else "flate"
                            ),
                        )
                    )
                yield _pd.DataFrame(
                    {"asset_id": ids, "kind": "pdf", "payload": payloads}
                )

        from timeseries_db_spark.operators import pdf as _pdfmod

        pdf_assets = docs.select(
            "doc_id", F.expr(clean).alias("clean")
        ).mapInPandas(build_pdf, schema="asset_id long, kind string, payload binary")
        pdfx = _pdfmod.pdf_extract_text(
            pdf_assets, with_images=True, password=b"tsdbpw"
        ).select(
            F.col("asset_id").alias("doc_id"),
            F.lit("pdf").alias("kind"),
            F.col("n_shows").alias("n_a"),
            F.col("n_streams").alias("n_b"),
            F.expr(
                "concat(text, CASE WHEN n_images > 0 THEN"
                " concat(' | IMG:', img_px) ELSE '' END)"
            ).alias("out_text"),
        )
        # r12 rob leg: robots.txt admission (RFC 9309,
        # operators/robots.py) — per-host robots bodies are constructed
        # so every RFC mechanism decides a doc-dependent outcome: even
        # hosts carry an EXACT tsdb-bot group (Allow / + a $-anchored
        # wildcard Disallow) PLUS a block-everything '*' group that
        # must be ignored (exact-match override); odd hosts carry a
        # '*' group whose Allow out-specifies a Disallow prefix unless
        # the longer $-anchored Disallow matches. n_a = winning pattern
        # length, n_b = allowed flag.
        from timeseries_db_spark.operators import robots as _robots

        # r13: Crawl-delay rides both bodies — even hosts' EXACT group
        # carries 2 (the '*' group's 9 must NOT apply: exact-group
        # selection covers politeness too), odd hosts' '*' group 3
        even_txt = (
            "User-agent: tsdb-bot\nAllow: /\nDisallow: /A/*9/End~$\n"
            "Crawl-delay: 2\n"
            "\nUser-agent: *\nDisallow: /\nCrawl-delay: 9"
        )
        odd_txt = (
            "User-agent: *\nDisallow: /A/\nAllow: /A/Path*\n"
            "Disallow: /A/*3/End~$\nCrawl-delay: 3"
        )
        # r13: every robots body also carries a group-independent
        # Sitemap: directive (robots_sitemaps), joined back onto the
        # admission rows so the discovery seed is value-checked too
        rob_hosts = s.range(7).select(
            F.expr("concat('example', id, '.com')").alias("host"),
            F.concat(
                F.expr(
                    "concat('Sitemap: https://example', id,"
                    " '.com/sm.xml')"
                ),
                F.lit("\n"),
                F.when(F.col("id") % 2 == 0, F.lit(even_txt)).otherwise(
                    F.lit(odd_txt)
                ),
            ).alias("robots_txt"),
        )
        rob_urls = docs.select(
            "doc_id",
            F.expr("concat('example', doc_id % 7, '.com')").alias("host"),
            F.expr(
                "CASE WHEN doc_id % 3 = 0 THEN '/' "
                "ELSE concat('/A/Path', doc_id, '/End~') END"
            ).alias("path"),
        )
        rob = (
            _robots.robots_allowed(
                rob_urls, _robots.robots_rules(rob_hosts), "TSDB-Bot"
            )
            .join(F.broadcast(_robots.robots_sitemaps(rob_hosts)), "host")
            .join(
                F.broadcast(
                    _robots.robots_crawl_delay(rob_hosts, "TSDB-Bot")
                ),
                "host",
            )
            .select(
                "doc_id",
                F.lit("rob").alias("kind"),
                F.col("win_plen").alias("n_a"),
                F.col("allowed").cast("long").alias("n_b"),
                F.expr(
                    "concat(host, path, '|', "
                    "CASE WHEN allowed THEN 'T' ELSE 'F' END, "
                    "'|', sitemap, '|d', cast(crawl_delay as bigint))"
                ).alias("out_text"),
            )
        )
        # r12 c4 leg: the canonical C4 page/line cleaning recipe
        # (text.c4_page_filter) — the entry CONSTRUCTS a multi-line
        # page per doc cycling every rule (short line, javascript line,
        # proper line, lorem-ipsum page poison, brace poison, blocklist
        # poison) and the oracle runs the GENERATED DuckDB twin of the
        # SAME operator over the same construction (engine parity, not
        # restated constants). n_a = kept lines, n_b = sentences.
        c4_text = (
            "concat("
            "'This is a good long sentence number one for doc ', doc_id,"
            " '.', chr(10), "
            f"{clean}, '.', chr(10), "
            "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Too short.' "
            "WHEN 1 THEN 'This line mentions javascript so it drops.' "
            "ELSE 'Another proper sentence with enough words kept.' END,"
            " chr(10), 'A third proper sentence with enough words to pass.',"
            " CASE WHEN doc_id % 5 = 0 THEN concat(chr(10),"
            " 'Filler then lorem ipsum appears here with many words.')"
            " ELSE '' END,"
            " CASE WHEN doc_id % 7 = 0 THEN concat(chr(10),"
            " 'This brace { poisons the whole page entirely now.')"
            " ELSE '' END,"
            " CASE WHEN doc_id % 11 = 0 THEN concat(chr(10),"
            " 'Sadly a badword appears in this long sentence.')"
            " ELSE '' END)"
        )
        c4 = text.c4_page_filter(
            docs.select("doc_id", F.expr(c4_text).alias("text"))
        ).select(
            "doc_id",
            F.lit("c4").alias("kind"),
            F.col("n_kept").alias("n_a"),
            F.col("n_sentences").alias("n_b"),
            F.expr(
                "concat(CASE WHEN page_kept THEN 'K' ELSE 'D' END, '|',"
                " text_clean)"
            ).alias("out_text"),
        )
        # r13 mce leg (VERDICT stretch item 8): main-content extraction
        # — the readability-style block scorer (text.main_content_str)
        # runs on a page with REAL boilerplate shapes: a link-only
        # <nav>, a too-short <h1> and <p>, a link-dense <div> (density
        # 10/16 > 1/3), a <footer>, and 1 + doc_id%3 prose blocks that
        # must survive (the main block carries the sanitized doc text
        # + an entity). n_a = candidate blocks (4 + id%3), n_b = kept
        # (1 + id%3), out_text = the newline-joined survivors — all
        # closed-form.
        mce_html = docs.select(
            "doc_id",
            F.expr(
                "concat('<html><head><title>t</title>"
                "<script>var x=1;</script></head><body>',"
                "'<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a>"
                " <a>Contact</a></nav>',"
                "'<h1>Doc ', doc_id, '</h1>',"
                f"'<p>Main content for doc ', doc_id, '. ', {clean},"
                "' x &amp; y</p>',"
                "'<p>short</p>',"
                "'<div><a href=\"x\">link1</a> <a>link2</a> tiny</div>',"
                "CASE WHEN doc_id % 3 >= 1 THEN concat("
                "'<p>Filler sentence number 0 for doc ', doc_id,"
                "' rides here.</p>') ELSE '' END,"
                "CASE WHEN doc_id % 3 >= 2 THEN concat("
                "'<p>Filler sentence number 1 for doc ', doc_id,"
                "' rides here.</p>') ELSE '' END,"
                "'<footer><a>terms</a> copyright</footer></body></html>')"
            ).alias("html"),
        )
        mce = text.main_content_extract(mce_html, min_len=10).select(
            "doc_id",
            F.lit("mce").alias("kind"),
            F.col("n_blocks").alias("n_a"),
            F.col("n_kept").alias("n_b"),
            F.col("text").alias("out_text"),
        )
        # r13 smap leg: sitemap XML URL extraction (warc.sitemap_urls)
        # — the discovery loop's second half (robots → Sitemap: →
        # sitemap.xml → frontier). Each doc carries a sitemap with a
        # lastmod'd primary URL and (odd ids) a lastmod-less second
        # URL; the REAL operator runs on BOTH engines via the
        # generated twin. n_a = lastmod_day (days since epoch, NULL
        # for the second url), n_b = loc length.
        smap_xml = docs.select(
            "doc_id",
            F.expr(
                "concat('<urlset>',"
                "'<url><loc>https://example', doc_id % 7, '.com/doc',"
                " doc_id, '</loc>',"
                "'<lastmod>2024-01-',"
                " lpad(cast(1 + doc_id % 28 as string), 2, '0'),"
                " '</lastmod></url>',"
                "CASE WHEN doc_id % 2 = 1 THEN concat("
                "'<url><loc>https://alt', doc_id % 5, '.org/p', doc_id,"
                " '</loc></url>') ELSE '' END,"
                "'</urlset>')"
            ).alias("xml"),
        )
        smap = _warc.sitemap_urls(smap_xml).select(
            "doc_id",
            F.lit("smap").alias("kind"),
            F.col("lastmod_day").alias("n_a"),
            F.expr("length(loc)").cast("long").alias("n_b"),
            F.expr("concat(loc, ' @ ', lastmod)").alias("out_text"),
        )
        # r13 sidx leg: SITEMAP INDEX files (large sites shard their
        # sitemaps) — the recursive middle of the discovery loop; the
        # oracle runs the generated twin on the same construction.
        # n_a = lastmod_day (NULL for the odd second child), n_b = loc
        # length. Every doc's index carries one lastmod'd child plus,
        # on odd ids, a lastmod-less second child.
        sidx_xml = docs.select(
            "doc_id",
            F.expr(
                "concat('<sitemapindex>',"
                "'<sitemap><loc>https://example', doc_id % 7,"
                " '.com/sm-', doc_id, '-1.xml</loc>',"
                "'<lastmod>2024-02-',"
                " lpad(cast(1 + doc_id % 28 as string), 2, '0'),"
                " '</lastmod></sitemap>',"
                "CASE WHEN doc_id % 2 = 1 THEN concat("
                "'<sitemap><loc>https://example', doc_id % 7,"
                " '.com/sm-', doc_id, '-2.xml</loc></sitemap>')"
                " ELSE '' END,"
                "'</sitemapindex>')"
            ).alias("xml"),
        )
        sidx = _warc.sitemap_index_urls(sidx_xml).select(
            "doc_id",
            F.lit("sidx").alias("kind"),
            F.col("lastmod_day").alias("n_a"),
            F.expr("length(loc)").cast("long").alias("n_b"),
            F.expr("concat(loc, ' @ ', lastmod)").alias("out_text"),
        )
        # r13 feed leg: RSS <item> / Atom <entry> feeds — the OTHER
        # discovery source; even docs ship RSS (element-text links),
        # odd docs Atom (href attributes), both through ONE operator
        # whose coalesce reads both dialects. n_a = link length,
        # n_b = title length.
        feed_xml = docs.select(
            "doc_id",
            F.expr(
                "CASE WHEN doc_id % 2 = 0 THEN concat("
                "'<rss><channel><item><title>Post ', doc_id,"
                " '</title>', chr(10),"
                " '<link>https://b', doc_id % 5, '.com/p', doc_id,"
                " '</link></item></channel></rss>')"
                " ELSE concat("
                "'<feed><entry><title type=\"text\">E', doc_id,"
                " '</title><link rel=\"alternate\" href=\"https://a',"
                " doc_id % 5, '.org/e', doc_id, '\"/></entry></feed>')"
                " END"
            ).alias("xml"),
        )
        feed = _warc.feed_urls(feed_xml).select(
            "doc_id",
            F.lit("feed").alias("kind"),
            F.expr("length(link)").cast("long").alias("n_a"),
            F.expr("length(title)").cast("long").alias("n_b"),
            F.expr("concat(link, ' | ', title)").alias("out_text"),
        )
        # r12 cdx leg: the Common Crawl URL INDEX format (CDXJ — how
        # consumers discover records before fetching any WARC bytes):
        # constructed closed-form lines, REAL parser on both engines
        # (the oracle runs the generated DuckDB twin). n_a = parsed
        # epoch ms, n_b = parsed length.
        cdx_line = (
            "concat('com,example', doc_id % 7, ')/doc', doc_id, ' ',"
            " '202401', lpad(cast(1 + doc_id % 28 as string), 2, '0'),"
            " '10', lpad(cast(doc_id % 60 as string), 2, '0'),"
            " lpad(cast(doc_id % 59 as string), 2, '0'),"
            " ' {\"url\": \"http://example', doc_id % 7, '.com/doc',"
            " doc_id, '\", \"mime\": \"text/html\", \"status\": \"',"
            " CASE WHEN doc_id % 9 = 0 THEN '404' ELSE '200' END,"
            " '\", \"digest\": \"D', doc_id, '\", \"length\": \"',"
            " 100 + doc_id % 900,"
            " '\", \"filename\": \"crawl-data/seg-', doc_id % 4,"
            " '.warc.gz\"}')"
        )
        cdx = _warc.cdx_parse(
            docs.select("doc_id", F.expr(cdx_line).alias("line"))
        ).select(
            "doc_id",
            F.lit("cdx").alias("kind"),
            F.col("ts_ms").alias("n_a"),
            F.col("length").alias("n_b"),
            F.expr(
                "concat(surt, ' | ', url, ' | ', status, ' | ',"
                " filename, ' | ', mime, ' | ', digest)"
            ).alias("out_text"),
        )
        # r13 goph leg: the Gopher/MassiveText repetition+quality rules
        # (text.gopher_quality) on a constructed page cycling every
        # rule — bullets (%3), a trailing-ellipsis line (%4), an exact
        # duplicate line pair (%5), symbol-heavy words (%6), a
        # duplicated paragraph (%7) — over the doc's own cleaned text,
        # so every metric is doc-dependent; the oracle runs the
        # GENERATED DuckDB twin of the SAME operator on the SAME
        # construction (engine parity). Gate thresholds are tightened
        # (the operator's kwargs) so `keep` genuinely flips across the
        # rule cycles instead of the published 50-word floor dropping
        # every fixture page. n_a = n_words, n_b = keep; out_text
        # carries all 8 fractions as floor(x*1e4+0.5) scaled BIGINTs —
        # identical doubles in, identical integers out on both engines
        # (a string-cast double would diverge on Java's scientific
        # notation below 1e-3).
        goph_text = _GOPH_PAGE.format(
            clean=clean, bn="cast(doc_id % 3 as int)"
        )
        goph = text.gopher_quality(
            docs.select("doc_id", F.expr(goph_text).alias("text")),
            **_GOPH_GATE,
        ).select(
            "doc_id",
            F.lit("goph").alias("kind"),
            F.col("n_words").alias("n_a"),
            F.col("keep").cast("long").alias("n_b"),
            F.expr(
                "concat_ws('|', "
                + ", ".join(
                    f"cast(cast(floor({m} * 10000 + 0.5) as bigint)"
                    " as string)"
                    for m in text._GOPHER_METRICS
                )
                + ")"
            ).alias("out_text"),
        )
        # r13 pmet leg: page-level metadata (html_page_meta) — title,
        # rel=canonical, og:title, meta description length, the
        # meta-robots NOINDEX flag, <html lang>, and the JSON-LD
        # @type through the engines' REAL JSON path evaluators
        # (get_json_object vs json_extract_string) — the oracle runs
        # the generated twin over the same construction. n_a =
        # desc_len, n_b = n_jsonld + 2*noindex.
        pmeta = text.html_page_meta(
            docs.select(
                "doc_id",
                F.expr(
                    _PMETA_PAGE.format(
                        dn="cast(10 + doc_id % 20 as int)"
                    )
                ).alias("html"),
            )
        ).select(
            "doc_id",
            F.lit("pmet").alias("kind"),
            F.col("desc_len").alias("n_a"),
            (
                F.col("n_jsonld") + F.col("noindex").cast("long") * 2
            ).alias("n_b"),
            F.expr(
                "concat_ws('|', title, canonical, og_title, lang,"
                " coalesce(ld_type, '-'))"
            ).alias("out_text"),
        )
        # r13 unor leg: Unicode hygiene (text.unicode_clean) — the
        # zero-width/control strips and punctuation folds run in the
        # Arrow kernel, NFC composition collapses the combining acute
        # into the precomposed char, and the oracle runs the DuckDB
        # twin (utf8proc nfc_normalize) over the SAME construction —
        # TWO INDEPENDENT Unicode implementations pinned against each
        # other. n_a = zero-widths (id%4), n_b = controls (id%3).
        unor = text.unicode_clean(
            docs.select(
                "doc_id",
                F.expr(
                    _UNOR_PAGE.format(
                        dn="cast(doc_id % 4 as int)",
                        cn="cast(doc_id % 3 as int)",
                    )
                ).alias("text"),
            )
        ).select(
            "doc_id",
            F.lit("unor").alias("kind"),
            F.col("n_zero_width").alias("n_a"),
            F.col("n_controls").alias("n_b"),
            F.col("text_norm").alias("out_text"),
        )
        # r14 slid leg (VERDICT item 6): script-class language
        # bucketing over per-doc single-script constructions — the
        # non-Latin complement of the Latin-only stopword vote. The
        # oracle runs the GENERATED DuckDB twin of the same operator
        # over the same page (engine parity). n_a = n_scripted,
        # n_b = the construction mode.
        slid = text.script_lang_id(
            docs.select(
                "doc_id",
                F.expr(
                    _SLID_PAGE.format(rn="cast(1 + doc_id % 5 as int)")
                ).alias("text"),
            )
        ).select(
            "doc_id",
            F.lit("slid").alias("kind"),
            F.col("n_scripted").alias("n_a"),
            (F.col("doc_id") % 10).cast("long").alias("n_b"),
            F.col("slang").alias("out_text"),
        )
        # r14 moji leg: mojibake repair (the ftfy step) — the fixture
        # DOUBLE-ENCODES known text executor-side (utf-8 bytes read
        # back as cp1252, once for doc_id%3==1, twice for %3==2) and
        # the oracle restates the REPAIRED text closed-form; clean
        # ASCII docs (%3==0) must pass untouched with n_fixes=0.
        def build_moji(batches):
            import pandas as _pd

            def corrupt(x: str) -> str:
                return x.encode("utf-8").decode("cp1252")

            for bb in batches:
                if not len(bb):
                    continue
                ids, texts = [], []
                for did in bb["doc_id"]:
                    did = int(did)
                    m = did % 3
                    if m == 0:
                        t = f"Doc {did} plain ascii end"
                    elif m == 1:
                        t = corrupt(f"Doc {did} café — naïve end")
                    else:
                        t = corrupt(
                            corrupt(f"Doc {did} café naïve ünïted end")
                        )
                    ids.append(did)
                    texts.append(t)
                yield _pd.DataFrame({"doc_id": ids, "text": texts})

        moji_in = docs.select("doc_id").mapInPandas(
            build_moji, schema="doc_id long, text string"
        )
        # r15 pdfq leg (VERDICT item 1): the r14 opt-in PDF quarantine
        # under the gate — dirty assets cycle by doc_id%4: clean /
        # junk bytes (not a PDF) / USER-LOCKED (non-empty password,
        # opened without it) / valid structure whose content stream's
        # zlib header is zeroed (FlateDecode fails) — extraction runs
        # with quarantine=True and every damage class costs exactly
        # one classified row, the clean siblings' text hash-matched.
        # n_a = n_shows, n_b = quarantined flag, out_text = the text
        # or the damage CLASS (JUNK/LOCKED/CORRUPT — an unexpected
        # message falls through to OTHER: and flips the hash).
        def build_pdfq(batches):
            import pandas as _pd

            from timeseries_db_spark.operators import pdf as PD

            for bb in batches:
                if not len(bb):
                    continue
                ids, payloads = [], []
                for did in bb["doc_id"]:
                    did = int(did)
                    m = did % 4
                    if m == 1:
                        p = b"JUNKBYTES" * (3 + did % 5)
                    elif m == 2:
                        p = PD.pdf_build(
                            [[f"Locked {did}"]],
                            encrypt="rc4-128",
                            user_pwd=b"pdfq-secret",
                        )
                    else:
                        p = PD.pdf_build([[f"Doc {did} ok"]])
                        if m == 3:
                            p = bytearray(p)
                            at = p.find(b"stream\n") + 7
                            p[at : at + 2] = b"\x00\x00"
                            p = bytes(p)
                    ids.append(did)
                    payloads.append(p)
                yield _pd.DataFrame(
                    {"asset_id": ids, "kind": "pdf", "payload": payloads}
                )

        pdfq_assets = docs.select("doc_id").mapInPandas(
            build_pdfq, schema="asset_id long, kind string, payload binary"
        )
        pdfq = _pdfmod.pdf_extract_text(
            pdfq_assets, quarantine=True
        ).select(
            F.col("asset_id").alias("doc_id"),
            F.lit("pdfq").alias("kind"),
            F.col("n_shows").alias("n_a"),
            F.col("err").isNotNull().cast("long").alias("n_b"),
            F.expr(
                "CASE WHEN err IS NULL THEN text"
                " WHEN err LIKE '%not a PDF%' THEN 'JUNK'"
                " WHEN err LIKE '%password%' THEN 'LOCKED'"
                " WHEN err LIKE '%FlateDecode%' THEN 'CORRUPT'"
                " ELSE concat('OTHER:', err) END"
            ).alias("out_text"),
        )
        moji = text.mojibake_fix(moji_in).select(
            "doc_id",
            F.lit("moji").alias("kind"),
            F.col("n_fixes").alias("n_a"),
            F.expr("length(text_fixed)").cast("long").alias("n_b"),
            F.col("text_fixed").alias("out_text"),
        )
        return (
            pii.unionByName(hx)
            .unionByName(ux)
            .unionByName(wx)
            .unionByName(werr)
            .unionByName(wet)
            .unionByName(wat)
            .unionByName(pdfx)
            .unionByName(rob)
            .unionByName(c4)
            .unionByName(mce)
            .unionByName(smap)
            .unionByName(cdx)
            .unionByName(goph)
            .unionByName(pmeta)
            .unionByName(sidx)
            .unionByName(feed)
            .unionByName(unor)
            .unionByName(slid)
            .unionByName(moji)
            .unionByName(pdfq)
        )

    q["text_pii_scrub"] = text_pii_scrub
    from timeseries_db_spark.operators import warc as _warc_mod

    # r12 closed forms: the doc-dependent counter/text pieces —
    #   n_tags = 14 + 2*(doc_id%4)   (base template + <i></i> pairs)
    #   n_entities = 3 + doc_id%3    (base + repeated &#33;)
    #   text gains ' z'*(id%4), '!'*(id%3), and (warc, charset c=1
    #   latin-1 docs) a trailing ' café' — the token that utf-8-replace
    #   would garble, pinning the charset decode by value
    _extracted = (
        "trim(regexp_replace('Doc ' || doc_id || ' ' || "
        "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'), "
        "' +', ' ', 'g')) || repeat(' z', (doc_id % 4)::INT) || ' &tail!' || "
        "repeat('!', (doc_id % 3)::INT){extra}, ' +', ' ', 'g'))"
    )
    o["text_pii_scrub"] = (
        "SELECT doc_id, 'pii' AS kind, n_emails AS n_a, n_ips AS n_b, "
        "text_scrubbed AS out_text FROM (" + text.pii_scrub_sql() + ") "
        "UNION ALL "
        "SELECT doc_id, 'html' AS kind, (14 + 2*(doc_id % 4))::BIGINT AS n_a, "
        "(3 + doc_id % 3)::BIGINT AS n_b, "
        + _extracted.format(extra="")
        + " AS out_text FROM documents "
        "UNION ALL "
        "SELECT doc_id, 'warc' AS kind, (14 + 2*(doc_id % 4))::BIGINT AS n_a, "
        "(3 + doc_id % 3)::BIGINT AS n_b, "
        "'http://example' || (doc_id % 7) || '.com/doc' || doc_id || ' | ' || "
        + _extracted.format(
            extra=" || CASE WHEN doc_id % 3 = 1 THEN ' café' ELSE '' END"
        )
        + " AS out_text FROM documents "
        "UNION ALL "
        # werr (r13): dirty-segment closed forms — see the leg comment.
        "SELECT doc_id, 'werr' AS kind, (2 - doc_id % 2)::BIGINT AS n_a, "
        "(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END)::BIGINT AS n_b, "
        "'Good ' || doc_id || ' | sha1:REV' || doc_id || ' | 0 | ' || "
        "(CASE WHEN doc_id % 3 = 0 THEN 404 ELSE 301 END) || "
        "' | image/png:0' AS out_text "
        "FROM documents "
        "UNION ALL "
        "SELECT doc_id, 'wet' AS kind, length(cl)::BIGINT AS n_a, "
        "length(u)::BIGINT AS n_b, u || ' | ' || cl AS out_text FROM ("
        "SELECT doc_id, "
        "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'), "
        "' +', ' ', 'g')) AS cl, "
        "'http://example' || (doc_id % 7) || '.com/doc' || doc_id AS u "
        "FROM documents) "
        "UNION ALL "
        "SELECT doc_id, 'wat' AS kind, length(cl)::BIGINT AS n_a, "
        "length(u)::BIGINT AS n_b, u || ' | wat' AS out_text FROM ("
        "SELECT doc_id, "
        "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'), "
        "' +', ' ', 'g')) AS cl, "
        "'http://example' || (doc_id % 7) || '.com/doc' || doc_id AS u "
        "FROM documents) "
        "UNION ALL "
        # pdf n_b (r13 late): every doc now counts 2 base streams —
        # odd ids' second page OR even ids' image XObject — plus the
        # xref-layout docs' 2 infrastructure streams, plus the CID
        # docs' (id%3==1) ToUnicode CMap stream; even ids append
        # the image px_sum closed form 64*Σ (10*doc_id + 31k) % 256.
        # The TEXT closed form is UNCHANGED by cid_font — the codes
        # are offset so only a real CMap decode reproduces it.
        "SELECT doc_id, 'pdf' AS kind, "
        "(2 + doc_id % 3 + doc_id % 2)::BIGINT AS n_a, "
        "(2 + CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 0 END "
        "+ CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b, "
        "'Doc ' || doc_id || "
        "CASE WHEN cl <> '' THEN chr(10) || cl ELSE '' END || "
        "CASE doc_id % 3 WHEN 1 THEN chr(10) || 'L0' "
        "WHEN 2 THEN chr(10) || 'L0' || chr(10) || 'L1' ELSE '' END || "
        "CASE WHEN doc_id % 2 = 1 THEN chr(10) || 'End ' || doc_id "
        "ELSE '' END || "
        "CASE WHEN doc_id % 2 = 0 THEN ' | IMG:' || "
        "(64 * (((10 * doc_id) % 256) + ((10 * doc_id + 31) % 256) + "
        "((10 * doc_id + 62) % 256) + ((10 * doc_id + 93) % 256))) "
        "ELSE '' END AS out_text FROM ("
        "SELECT doc_id, "
        "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'), "
        "' +', ' ', 'g')) AS cl "
        "FROM documents) "
        "UNION ALL "
        "SELECT doc_id, 'rob' AS kind, "
        "CASE WHEN doc_id % 3 = 0 THEN "
        "  CASE WHEN (doc_id % 7) % 2 = 0 THEN 1 ELSE 0 END "
        "WHEN (doc_id % 7) % 2 = 0 THEN "
        "  CASE WHEN doc_id % 10 = 9 THEN 11 ELSE 1 END "
        "ELSE CASE WHEN doc_id % 10 = 3 THEN 11 ELSE 8 END END::BIGINT "
        "AS n_a, "
        "CASE WHEN doc_id % 3 <> 0 AND "
        "(((doc_id % 7) % 2 = 0 AND doc_id % 10 = 9) OR "
        "((doc_id % 7) % 2 = 1 AND doc_id % 10 = 3)) THEN 0 ELSE 1 END"
        "::BIGINT AS n_b, "
        "'example' || (doc_id % 7) || '.com' || "
        "CASE WHEN doc_id % 3 = 0 THEN '/' "
        "ELSE '/A/Path' || doc_id || '/End~' END || '|' || "
        "CASE WHEN doc_id % 3 <> 0 AND "
        "(((doc_id % 7) % 2 = 0 AND doc_id % 10 = 9) OR "
        "((doc_id % 7) % 2 = 1 AND doc_id % 10 = 3)) THEN 'F' ELSE 'T' END "
        "|| '|https://example' || (doc_id % 7) || '.com/sm.xml' "
        "|| '|d' || CASE WHEN (doc_id % 7) % 2 = 0 THEN 2 ELSE 3 END "
        "AS out_text FROM documents "
        "UNION ALL "
        "SELECT doc_id, 'c4' AS kind, n_kept AS n_a, n_sentences AS n_b, "
        "(CASE WHEN page_kept THEN 'K' ELSE 'D' END) || '|' || text_clean "
        "AS out_text FROM ("
        + text.c4_page_filter_sql(
            "SELECT doc_id, "
            "'This is a good long sentence number one for doc ' || doc_id "
            "|| '.' || chr(10) || "
            "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', "
            "'g'), ' +', ' ', 'g')) || '.' || chr(10) || "
            "CASE (doc_id % 3)::INT WHEN 0 THEN 'Too short.' "
            "WHEN 1 THEN 'This line mentions javascript so it drops.' "
            "ELSE 'Another proper sentence with enough words kept.' END "
            "|| chr(10) || 'A third proper sentence with enough words to "
            "pass.' || "
            "CASE WHEN doc_id % 5 = 0 THEN chr(10) || "
            "'Filler then lorem ipsum appears here with many words.' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || "
            "'This brace { poisons the whole page entirely now.' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 11 = 0 THEN chr(10) || "
            "'Sadly a badword appears in this long sentence.' "
            "ELSE '' END AS text FROM documents"
        )
        + ") "
        "UNION ALL "
        # mce (r13): main-content extraction closed forms — see the leg
        "SELECT doc_id, 'mce' AS kind, (4 + doc_id % 3)::BIGINT AS n_a, "
        "(1 + doc_id % 3)::BIGINT AS n_b, "
        "'Main content for doc ' || doc_id || '.' || "
        "CASE WHEN cl <> '' THEN ' ' || cl ELSE '' END || ' x & y' || "
        "CASE WHEN doc_id % 3 >= 1 THEN chr(10) || "
        "'Filler sentence number 0 for doc ' || doc_id || ' rides here.' "
        "ELSE '' END || "
        "CASE WHEN doc_id % 3 >= 2 THEN chr(10) || "
        "'Filler sentence number 1 for doc ' || doc_id || ' rides here.' "
        "ELSE '' END AS out_text FROM ("
        "SELECT doc_id, "
        "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'), "
        "' +', ' ', 'g')) AS cl "
        "FROM documents) "
        "UNION ALL "
        # smap (r13): the REAL sitemap parser on both engines
        "SELECT doc_id, 'smap' AS kind, lastmod_day AS n_a, "
        "length(loc)::BIGINT AS n_b, loc || ' @ ' || lastmod "
        "AS out_text FROM ("
        + _warc_mod.sitemap_urls_sql(
            "SELECT doc_id, '<urlset>' || "
            "'<url><loc>https://example' || (doc_id % 7) || '.com/doc' || "
            "doc_id || '</loc>' || '<lastmod>2024-01-' || "
            "lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || "
            "'</lastmod></url>' || "
            "CASE WHEN doc_id % 2 = 1 THEN "
            "'<url><loc>https://alt' || (doc_id % 5) || '.org/p' || "
            "doc_id || '</loc></url>' ELSE '' END || "
            "'</urlset>' AS xml FROM documents"
        )
        + ") "
        "UNION ALL "
        "SELECT doc_id, 'cdx' AS kind, ts_ms AS n_a, length AS n_b, "
        "surt || ' | ' || url || ' | ' || status || ' | ' || filename "
        "|| ' | ' || mime || ' | ' || digest AS out_text FROM ("
        + _warc_mod.cdx_parse_sql(
            "SELECT doc_id, "
            "'com,example' || (doc_id % 7) || ')/doc' || doc_id || ' ' || "
            "'202401' || lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || "
            "'10' || lpad((doc_id % 60)::VARCHAR, 2, '0') || "
            "lpad((doc_id % 59)::VARCHAR, 2, '0') || "
            "' {\"url\": \"http://example' || (doc_id % 7) || '.com/doc' || "
            "doc_id || '\", \"mime\": \"text/html\", \"status\": \"' || "
            "CASE WHEN doc_id % 9 = 0 THEN '404' ELSE '200' END || "
            "'\", \"digest\": \"D' || doc_id || '\", \"length\": \"' || "
            "(100 + doc_id % 900) || "
            "'\", \"filename\": \"crawl-data/seg-' || (doc_id % 4) || "
            "'.warc.gz\"}' AS line FROM documents"
        )
        + ") "
        "UNION ALL "
        "SELECT doc_id, 'url' AS kind, n_params AS n_a, "
        "length(host)::BIGINT AS n_b, url_norm || ' @ ' || surt "
        "AS out_text FROM ("
        + text.url_normalize_sql(
            "SELECT doc_id, 'HTTP://Example' || (doc_id % 7) || '.COM' || "
            "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END || "
            "CASE WHEN doc_id % 3 = 0 THEN '' "
            "ELSE '/A/./P%61th' || doc_id || '/x%2f/../End%7e' END || "
            "'?b=2&a=' || (doc_id % 5) || '&c=%4a#frag' AS url "
            "FROM documents"
        )
        + ") "
        "UNION ALL "
        # goph (r13): the generated DuckDB twin of the REAL operator
        # over the SAME constructed page (engine parity, not restated
        # constants); fractions travel as floor(x*1e4+0.5) BIGINTs
        "SELECT doc_id, 'goph' AS kind, n_words AS n_a, "
        "keep::BIGINT AS n_b, concat_ws('|', "
        + ", ".join(
            f"(floor({m} * 10000 + 0.5))::BIGINT::VARCHAR"
            for m in text._GOPHER_METRICS
        )
        + ") AS out_text FROM ("
        + text.gopher_quality_sql(
            "SELECT doc_id, "
            + _GOPH_PAGE.format(
                clean=(
                    "trim(regexp_replace(regexp_replace(text,"
                    " '[<>&]|[^ -~]', '', 'g'), ' +', ' ', 'g'))"
                ),
                bn="(doc_id % 3)::INT",
            )
            + " AS text FROM documents",
            **_GOPH_GATE,
        )
        + ") "
        "UNION ALL "
        # sidx (r13): the generated twin over the same index construction
        "SELECT doc_id, 'sidx' AS kind, lastmod_day AS n_a, "
        "length(loc)::BIGINT AS n_b, loc || ' @ ' || lastmod "
        "AS out_text FROM ("
        + _warc_mod.sitemap_index_urls_sql(
            "SELECT doc_id, '<sitemapindex>' || "
            "'<sitemap><loc>https://example' || (doc_id % 7) || "
            "'.com/sm-' || doc_id || '-1.xml</loc>' || "
            "'<lastmod>2024-02-' || "
            "lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || "
            "'</lastmod></sitemap>' || "
            "CASE WHEN doc_id % 2 = 1 THEN "
            "'<sitemap><loc>https://example' || (doc_id % 7) || "
            "'.com/sm-' || doc_id || '-2.xml</loc></sitemap>' "
            "ELSE '' END || '</sitemapindex>' AS xml FROM documents"
        )
        + ") "
        "UNION ALL "
        # feed (r13): RSS/Atom twin over the same construction
        "SELECT doc_id, 'feed' AS kind, length(link)::BIGINT AS n_a, "
        "length(title)::BIGINT AS n_b, link || ' | ' || title "
        "AS out_text FROM ("
        + _warc_mod.feed_urls_sql(
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN "
            "'<rss><channel><item><title>Post ' || doc_id || "
            "'</title>' || chr(10) || "
            "'<link>https://b' || (doc_id % 5) || '.com/p' || doc_id || "
            "'</link></item></channel></rss>' "
            "ELSE "
            "'<feed><entry><title type=\"text\">E' || doc_id || "
            "'</title><link rel=\"alternate\" href=\"https://a' || "
            "(doc_id % 5) || '.org/e' || doc_id || '\"/></entry></feed>' "
            "END AS xml FROM documents"
        )
        + ") "
        "UNION ALL "
        # unor (r13): the DuckDB twin (utf8proc nfc_normalize) over the
        # same construction — two independent Unicode implementations
        "SELECT doc_id, 'unor' AS kind, n_zero_width AS n_a, "
        "n_controls AS n_b, text_norm AS out_text FROM ("
        + text.unicode_clean_sql(
            "SELECT doc_id, "
            + _UNOR_PAGE.format(
                dn="(doc_id % 4)::INT", cn="(doc_id % 3)::INT"
            )
            + " AS text FROM documents"
        )
        + ") "
        "UNION ALL "
        # pmet (r13): the generated DuckDB twin of html_page_meta over
        # the SAME construction — engine parity incl. the JSON path
        "SELECT doc_id, 'pmet' AS kind, desc_len AS n_a, "
        "(n_jsonld + 2 * noindex::BIGINT)::BIGINT AS n_b, "
        "concat_ws('|', title, canonical, og_title, lang, "
        "coalesce(ld_type, '-')) AS out_text FROM ("
        + text.html_page_meta_sql(
            "SELECT doc_id, "
            + _PMETA_PAGE.format(dn="(10 + doc_id % 20)::INT")
            + " AS html FROM documents"
        )
        + ") "
        "UNION ALL "
        # slid (r14): the generated DuckDB twin of script_lang_id over
        # the same per-script construction — engine parity on the
        # script-range counts and the winner rule (incl. the kana→ja
        # override and the Latin stopword fallback)
        "SELECT doc_id, 'slid' AS kind, n_scripted AS n_a, "
        "(doc_id % 10)::BIGINT AS n_b, slang AS out_text FROM ("
        + text.script_lang_id_sql(
            "SELECT doc_id, "
            + _SLID_PAGE.format(rn="(1 + doc_id % 5)::INT")
            + " AS text FROM documents"
        )
        + ") "
        "UNION ALL "
        # moji (r14): the repaired text restated closed-form — the
        # corruption is the fixture's job, the REPAIR is what's pinned
        "SELECT doc_id, 'moji' AS kind, (doc_id % 3)::BIGINT AS n_a, "
        "length(fixed)::BIGINT AS n_b, fixed AS out_text FROM ("
        "SELECT doc_id, CASE (doc_id % 3) "
        "WHEN 0 THEN 'Doc ' || doc_id || ' plain ascii end' "
        "WHEN 1 THEN 'Doc ' || doc_id || ' café — naïve end' "
        "ELSE 'Doc ' || doc_id || ' café naïve ünïted end' END AS fixed "
        "FROM documents) "
        "UNION ALL "
        # pdfq (r15): the dirty-PDF quarantine closed forms — damage
        # class cycles by doc_id%4 (clean / junk / locked / corrupt
        # flate), clean text restated, every quarantine one flagged row
        "SELECT doc_id, 'pdfq' AS kind, "
        "(CASE WHEN doc_id % 4 IN (0) THEN 1 ELSE 0 END)::BIGINT AS n_a, "
        "(CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_b, "
        "CASE (doc_id % 4) WHEN 0 THEN 'Doc ' || doc_id || ' ok' "
        "WHEN 1 THEN 'JUNK' WHEN 2 THEN 'LOCKED' "
        "ELSE 'CORRUPT' END AS out_text "
        "FROM documents"
    )

    # semi-structured JSON extraction (from_json, JVM codegen) composed
    # with aggregation — the extracted field is both an aggregate input
    # (by_type leg) and a group key (by_k_decile leg); slot freed by
    # folding the A8 shape into agg_by_tag_all
    q["events_props_stats"] = lambda s, d: semistructured.props_stats(
        load_table(s, d, "events")
    )
    o["events_props_stats"] = semistructured.props_stats_sql()

    # vocab application: token-id sequences under the top-100 vocabulary
    # (the step between text_vocab_topn and corpus_pack). r8 fold: the
    # BPE segmentation summary joins as a `kind` leg — the chained
    # greedy-replace apply (operators/bpe.py) under the fixed
    # DEFAULT_MERGES tokenizer, same per-doc summary shape. r9 `bpet`
    # leg (VERDICT r8 item 5): the distributed TRAINER itself — the
    # iterative argmax loop is not SQL-expressible, so the Spark side
    # TRAINS on the closed-form corpus and applies its learned merges,
    # while the oracle replays the merge list an independent pure-Python
    # trainer (bpe.train_gate_merges, no Spark) derives from the same
    # closed form: any trainer divergence flips the hash.
    # r14 (VERDICT item 2) — the avfmt/csvfmt legs gate-pin the Avro
    # and CSV/TSV corpus arrival paths that were pytest-only: the
    # entry WRITES a closed-form corpus as real .avro container files
    # (deflate + null codecs) and headered .csv shards — each with one
    # deliberate corruption (a junk Avro file; a type-broken CSV line)
    # — reads them back through read_corpus_any's quarantine mode, and
    # publishes per-doc summaries in the entry's token-summary schema
    # (n_oov doubles as the is-quarantined flag, exactly one per
    # format by construction).
    def _format_roundtrip_legs(s: SparkSession, d: str) -> DataFrame:
        import os
        import shutil
        import tempfile

        from timeseries_db_spark.sources import avro as AV
        from timeseries_db_spark.sources.tables import read_corpus_any

        base = os.path.join(
            tempfile.gettempdir(), f"tsdb_fmt_{os.getpid()}"
        )
        shutil.rmtree(base, ignore_errors=True)
        av_dir = os.path.join(base, "avro")
        csv_dir = os.path.join(base, "csv")
        os.makedirs(av_dir)
        os.makedirs(csv_dir)
        ids = sorted(
            int(r["doc_id"])
            for r in _docs(s, d).select("doc_id").collect()
        )
        half = len(ids) // 2
        # r15 (VERDICT item 2) + r16 (item 6): the avro shards cycle
        # ALL SIX spec codecs — deflate / null / from-spec SNAPPY (the
        # de-facto default of real Avro drops, framing CRC-32
        # verified) / ZSTANDARD (pyarrow's bundled zstd) / BZIP2 / XZ
        # (stdlib decoders; the xz frame carries its own CRC64) —
        # each decode path under the value oracle
        av_codecs = (
            "deflate", "null", "snappy", "zstandard", "bzip2", "xz",
        )
        sixth = max(1, len(ids) // len(av_codecs))
        av_chunks = [
            ids[k * sixth : (k + 1) * sixth if k < 5 else len(ids)]
            for k in range(len(av_codecs))
        ]
        for k, chunk in enumerate(av_chunks):
            recs = [
                {"doc_id": i, "text": f"Avro doc {i}"} for i in chunk
            ]
            with open(os.path.join(av_dir, f"part-{k}.avro"), "wb") as f:
                f.write(
                    AV.avro_build(
                        recs,
                        AV.CORPUS_AVRO_SCHEMA,
                        codec=av_codecs[k],
                        block_records=50,
                    )
                )
        for k, chunk in enumerate((ids[:half], ids[half:])):
            lines = ["doc_id,text,lang,source,n_chars\n"] + [
                f"{i},Csv doc {i},en,web,{len(f'Csv doc {i}')}\n"
                for i in chunk
            ]
            if k == 0:
                lines.append("-77,broken line,en,web,NOPE\n")
            with open(os.path.join(csv_dir, f"part-{k}.csv"), "w") as f:
                f.write("".join(lines))
        with open(os.path.join(av_dir, "junk.avro"), "wb") as f:
            f.write(b"NOTANAVROFILE" * 4)
        # r14 late: an EMBEDDINGS export rides the same entry — the
        # array<float> schema surface under the value oracle (values
        # are small integers, exact in float32)
        emb_dir = os.path.join(base, "emb")
        os.makedirs(emb_dir)
        for k, chunk in enumerate((ids[:half], ids[half:])):
            recs = [
                {"doc_id": i,
                 "emb": [float(i), float(2 * i), float(i % 7)]}
                for i in chunk
            ]
            with open(os.path.join(emb_dir, f"part-{k}.avro"), "wb") as f:
                f.write(
                    AV.avro_build(
                        recs,
                        AV.EMBEDDINGS_AVRO_SCHEMA,
                        # r15: the second emb shard pins array<float>
                        # under the snappy codec too
                        codec="snappy" if k else "null",
                        block_records=64,
                    )
                )

        def coerce(df: DataFrame) -> DataFrame:
            bad = F.col("_corrupt").isNotNull()
            return df.select(
                F.when(bad, F.lit(-1))
                .otherwise(F.col("doc_id"))
                .cast("long")
                .alias("doc_id"),
                F.when(bad, F.lit(-1))
                .otherwise(F.length("text"))
                .cast("long")
                .alias("n_tokens"),
                bad.cast("long").alias("n_oov"),
                F.when(bad, F.md5(F.lit("")))
                .otherwise(F.md5(F.col("text")))
                .alias("ids_fp"),
                F.when(bad, F.lit(-1))
                .otherwise(F.col("doc_id") + F.length("text"))
                .cast("long")
                .alias("ids_sum"),
            )

        # r15 (VERDICT item 3): a GENERAL-union shard — the tag column
        # is [null, long, string], branch cycling by doc_id % 3; the
        # union surfaces as typed columns so the DuckDB twin restates
        # every branch closed-form. Snappy-coded: both r15 surfaces
        # pin each other.
        un_dir = os.path.join(base, "union")
        os.makedirs(un_dir)
        with open(os.path.join(un_dir, "part-0.avro"), "wb") as f:
            f.write(
                AV.avro_build(
                    [
                        {
                            "doc_id": i,
                            "tag": (None, 7 * i, f"tag{i}")[i % 3],
                        }
                        for i in ids
                    ],
                    AV.TAGGED_AVRO_SCHEMA,
                    codec="snappy",
                    block_records=50,
                )
            )
        unfmt = AV.read_tagged_avro(s, un_dir).select(
            "doc_id",
            F.col("tag_branch").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_oov"),
            F.md5(
                F.coalesce(
                    F.col("tag_str"),
                    F.col("tag_long").cast("string"),
                    F.lit(""),
                )
            ).alias("ids_fp"),
            F.coalesce(
                F.col("tag_long"),
                F.length("tag_str").cast("long"),
                F.lit(0),
            ).alias("ids_sum"),
            F.lit("unfmt").alias("kind"),
        )
        # r15 lgfmt leg: logical types + named-type references —
        # timestamp-micros / date / decimal(10,2) (incl. negatives)
        # surface as exact numerics, the enum defined once and
        # referenced twice (short + namespace-qualified) resolves
        # through the names registry; every value restated closed-form
        import decimal as _decimal

        lg_dir = os.path.join(base, "logical")
        os.makedirs(lg_dir)
        syms = ("RED", "GREEN", "BLUE")
        with open(os.path.join(lg_dir, "part-0.avro"), "wb") as f:
            f.write(
                AV.avro_build(
                    [
                        {
                            "doc_id": i,
                            "ts": 1_700_000_000_000_000 + i,
                            "day": 19_000 + i % 365,
                            "amount": _decimal.Decimal(
                                12_345 + 7 * i - 20_000
                            ).scaleb(-2),
                            "c1": syms[i % 3],
                            "c2": syms[(i + 1) % 3],
                            "c3": syms[(i + 2) % 3],
                        }
                        for i in ids
                    ],
                    AV.LOGICAL_AVRO_SCHEMA,
                    codec="deflate",
                    block_records=50,
                )
            )
        lgfmt = AV.read_logical_avro(s, lg_dir).select(
            "doc_id",
            F.col("day").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_oov"),
            F.expr(
                "md5(concat(cast(ts_us as string), ':',"
                " cast(amount_cents as string), ':', c1, ':', c2,"
                " ':', c3))"
            ).alias("ids_fp"),
            (F.col("amount_cents") + F.col("day")).alias("ids_sum"),
            F.lit("lgfmt").alias("kind"),
        )
        embfmt = AV.read_embeddings_avro(s, emb_dir).select(
            "doc_id",
            F.expr("size(emb)").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_oov"),
            F.expr(
                "md5(array_join(transform(emb,"
                " x -> cast(cast(x as bigint) as string)), ','))"
            ).alias("ids_fp"),
            F.expr(
                "cast(aggregate(emb, cast(0 as double),"
                " (a, x) -> a + x) as bigint)"
            ).alias("ids_sum"),
            F.lit("embfmt").alias("kind"),
        )
        # r16 evfmt leg (VERDICT item 1): SCHEMA EVOLUTION — even docs
        # arrive in shards written under the years-old v1 writer
        # schema (``body`` instead of ``text``, 32-bit ``score``, a
        # ``legacy_blob`` the reader dropped, no ``lang``), odd docs
        # arrive v2-native, and today's consumer pins ONE reader
        # schema (CORPUS_V2_READER_SCHEMA) over the whole directory:
        # spec §Schema Resolution applies the alias rename, the
        # int→long promotion, the 'und' default fill, and the
        # writer-field skip per record. A shard whose writer schema is
        # UNRESOLVABLE (missing a defaultless reader field)
        # quarantines as one container-level row while its siblings
        # decode. v1 shards ride deflate, v2 snappy — evolution and
        # codec paths compose.
        ev_dir = os.path.join(base, "evolved")
        os.makedirs(ev_dir)
        evens = [i for i in ids if i % 2 == 0]
        odds = [i for i in ids if i % 2 == 1]
        with open(os.path.join(ev_dir, "part-v1.avro"), "wb") as f:
            f.write(
                AV.avro_build(
                    [
                        {
                            "doc_id": i,
                            "body": (
                                None if i % 6 == 0 else f"Evo doc {i}"
                            ),
                            "score": 2 * i,
                            "legacy_blob": b"\x00\x01",
                        }
                        for i in evens
                    ],
                    AV.CORPUS_V1_AVRO_SCHEMA,
                    codec="deflate",
                    block_records=50,
                )
            )
        with open(os.path.join(ev_dir, "part-v2.avro"), "wb") as f:
            f.write(
                AV.avro_build(
                    [
                        {
                            "doc_id": i,
                            "text": f"Evo doc {i}",
                            "score": 3 * i,
                            "lang": "en",
                        }
                        for i in odds
                    ],
                    AV.CORPUS_V2_READER_SCHEMA,
                    codec="snappy",
                    block_records=50,
                )
            )
        with open(os.path.join(ev_dir, "part-bad.avro"), "wb") as f:
            f.write(
                AV.avro_build(
                    [{"doc_id": -9}],
                    {
                        "type": "record",
                        "name": "document",
                        "fields": [{"name": "doc_id", "type": "long"}],
                    },
                )
            )
        # r16 szfmt leg: SNAPPY-FRAMED shards (.jsonl.sz — the framing
        # format with per-chunk masked CRC-32C) — two clean shards of
        # jsonl lines plus one with a flipped byte: the CRC rejects
        # the damaged chunk, the shard prices ONE sentinel row, and
        # the verified prefix (empty here — chunk 0 is the flipped
        # one) survives
        from timeseries_db_spark.functions.snappy import (
            snappy_framed_compress,
        )

        sz_dir = os.path.join(base, "szfmt")
        os.makedirs(sz_dir)
        import json as _json

        # r17: first-party shards carry sidecar manifests
        # (sources/manifest.py) — clean shards verify row+byte
        # counts in-gate; the flipped shard's manifest exercises the
        # "already priced, skip the check" path
        from timeseries_db_spark.sources.manifest import (
            write_shard_with_manifest,
        )

        for k, chunk in enumerate((ids[:half], ids[half:])):
            body = b"".join(
                _json.dumps(
                    {"doc_id": i, "text": f"Sz doc {i}"}
                ).encode() + b"\n"
                for i in chunk
            )
            write_shard_with_manifest(
                os.path.join(sz_dir, f"part-{k}.jsonl.sz"),
                snappy_framed_compress(body),
                len(chunk),
            )
        flipped = bytearray(
            snappy_framed_compress(b'{"doc_id": -5, "text": "gone"}\n')
        )
        flipped[14] ^= 0x01  # inside chunk 0's body
        write_shard_with_manifest(
            os.path.join(sz_dir, "part-bad.jsonl.sz"),
            bytes(flipped),
            1,
        )
        szfmt = coerce(
            read_corpus_any(s, sz_dir, fmt="jsonl.sz")
        ).withColumn("kind", F.lit("szfmt"))
        # r16 sofmt leg: SINGLE-OBJECT ENCODING — the raw Kafka-archive
        # arrival unit (C3 01 marker + CRC-64-AVRO fingerprint of the
        # writer schema's Parsing Canonical Form per MESSAGE, no
        # container). Mixed producer versions ride one directory:
        # evens in a v1-written segment, odds v2-native, both
        # registry-resolved and decoded under the pinned v2 reader
        # (same §Schema Resolution moves as evfmt); a markerless junk
        # segment prices one quarantine row.
        so_dir = os.path.join(base, "sobj")
        os.makedirs(so_dir)
        # r17: first-party segments ship sidecar manifests (the junk
        # segment below stays manifest-less — the foreign-shard path)
        write_shard_with_manifest(
            os.path.join(so_dir, "old.sobj"),
            AV.single_object_encode(
                [
                    {
                        "doc_id": i,
                        "body": (
                            None if i % 6 == 0 else f"So doc {i}"
                        ),
                        "score": 2 * i,
                        "legacy_blob": b"\x00",
                    }
                    for i in evens
                ],
                AV.CORPUS_V1_AVRO_SCHEMA,
            ),
            len(evens),
        )
        write_shard_with_manifest(
            os.path.join(so_dir, "new.sobj"),
            AV.single_object_encode(
                [
                    {
                        "doc_id": i,
                        "text": f"So doc {i}",
                        "score": 3 * i,
                        "lang": "en",
                    }
                    for i in odds
                ],
                AV.CORPUS_V2_READER_SCHEMA,
            ),
            len(odds),
        )
        with open(os.path.join(so_dir, "junk.sobj"), "wb") as f:
            f.write(b"\x00no marker here at all\x00")
        so_bad = F.col("_corrupt").isNotNull()
        sofmt = AV.read_single_object_corpus(
            s,
            so_dir,
            [AV.CORPUS_V1_AVRO_SCHEMA, AV.CORPUS_V2_READER_SCHEMA],
            reader_schema=AV.CORPUS_V2_READER_SCHEMA,
        ).select(
            F.when(so_bad, F.lit(-1))
            .otherwise(F.col("doc_id"))
            .cast("long")
            .alias("doc_id"),
            F.when(so_bad, F.lit(-1))
            .otherwise(F.col("score"))
            .cast("long")
            .alias("n_tokens"),
            so_bad.cast("long").alias("n_oov"),
            F.when(so_bad, F.md5(F.lit("")))
            .otherwise(
                F.md5(
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(":"),
                        F.col("lang"),
                    )
                )
            )
            .alias("ids_fp"),
            F.when(so_bad, F.lit(-1))
            .otherwise(
                F.col("doc_id") + F.col("score") + F.length("lang")
            )
            .cast("long")
            .alias("ids_sum"),
            F.lit("sofmt").alias("kind"),
        )
        # r17 cwfmt leg (VERDICT item 3): CONFLUENT WIRE FORMAT — the
        # most common Kafka framing in the wild (magic 0x00 + 4-byte
        # BE schema id + Avro body, ids resolved against a Schema
        # Registry). The registry snapshot is vendored as
        # <id>_<name>.avsc files (load_confluent_registry); evens
        # arrive under the v1 writer's id, odds under v2's, both
        # resolved to the pinned v2 reader — the same evolution
        # closed form as sofmt with the envelope swapped. A shard
        # with no magic prices one quarantine row.
        cw_dir = os.path.join(base, "cwire")
        cw_reg_dir = os.path.join(base, "cwire_registry")
        os.makedirs(cw_dir)
        os.makedirs(cw_reg_dir)
        import json as _json

        with open(
            os.path.join(cw_reg_dir, "7_document_v1.avsc"), "w"
        ) as f:
            f.write(_json.dumps(AV.CORPUS_V1_AVRO_SCHEMA))
        with open(
            os.path.join(cw_reg_dir, "9_document_v2.avsc"), "w"
        ) as f:
            f.write(_json.dumps(AV.CORPUS_V2_READER_SCHEMA))
        cw_registry = AV.load_confluent_registry(cw_reg_dir)
        write_shard_with_manifest(
            os.path.join(cw_dir, "old.cwire"),
            AV.confluent_encode(
                [
                    {
                        "doc_id": i,
                        "body": (
                            None if i % 6 == 0 else f"Cw doc {i}"
                        ),
                        "score": 2 * i,
                        "legacy_blob": b"\x00",
                    }
                    for i in evens
                ],
                AV.CORPUS_V1_AVRO_SCHEMA,
                7,
            ),
            len(evens),
        )
        write_shard_with_manifest(
            os.path.join(cw_dir, "new.cwire"),
            AV.confluent_encode(
                [
                    {
                        "doc_id": i,
                        "text": f"Cw doc {i}",
                        "score": 3 * i,
                        "lang": "en",
                    }
                    for i in odds
                ],
                AV.CORPUS_V2_READER_SCHEMA,
                9,
            ),
            len(odds),
        )
        with open(os.path.join(cw_dir, "junk.cwire"), "wb") as f:
            f.write(b"\x7fno confluent magic here")
        cw_bad = F.col("_corrupt").isNotNull()
        cwfmt = AV.read_confluent_corpus(
            s,
            cw_dir,
            cw_registry,
            reader_schema=AV.CORPUS_V2_READER_SCHEMA,
        ).select(
            F.when(cw_bad, F.lit(-1))
            .otherwise(F.col("doc_id"))
            .cast("long")
            .alias("doc_id"),
            F.when(cw_bad, F.lit(-1))
            .otherwise(F.col("score"))
            .cast("long")
            .alias("n_tokens"),
            cw_bad.cast("long").alias("n_oov"),
            F.when(cw_bad, F.md5(F.lit("")))
            .otherwise(
                F.md5(
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(":"),
                        F.col("lang"),
                    )
                )
            )
            .alias("ids_fp"),
            F.when(cw_bad, F.lit(-1))
            .otherwise(
                F.col("doc_id") + F.col("score") + F.length("lang")
            )
            .cast("long")
            .alias("ids_sum"),
            F.lit("cwfmt").alias("kind"),
        )
        # r17 kafmt leg: KAFKA LOG SEGMENTS — the files a broker-dir
        # archive actually contains. RecordBatch v2 (CRC-32C-verified
        # per batch) whose record VALUES are Confluent-framed under
        # the v1/v2 producer ids, segments cycling ALL FIVE protocol
        # codecs (none/gzip/snappy-java-stream/lz4-frame/zstd — the
        # r17 LZ4 decoder and snappy-java stream format under the
        # value oracle); one junk segment prices one quarantine row.
        # Same evolution closed form as cwfmt with 'Ka doc' texts.
        from timeseries_db_spark.sources import kafka_log as KL

        ka_dir = os.path.join(base, "kafka")
        os.makedirs(ka_dir)
        ka_codecs = ("none", "gzip", "snappy", "lz4", "zstd")
        fifth = max(1, len(ids) // len(ka_codecs))
        ka_chunks = [
            ids[k * fifth : (k + 1) * fifth if k < 4 else len(ids)]
            for k in range(len(ka_codecs))
        ]
        for k, chunk in enumerate(ka_chunks):
            msgs = []
            for i in chunk:
                if i % 2 == 0:
                    v = AV.confluent_encode(
                        [
                            {
                                "doc_id": i,
                                "body": (
                                    None if i % 6 == 0
                                    else f"Ka doc {i}"
                                ),
                                "score": 2 * i,
                                "legacy_blob": b"\x00",
                            }
                        ],
                        AV.CORPUS_V1_AVRO_SCHEMA,
                        7,
                    )
                else:
                    v = AV.confluent_encode(
                        [
                            {
                                "doc_id": i,
                                "text": f"Ka doc {i}",
                                "score": 3 * i,
                                "lang": "en",
                            }
                        ],
                        AV.CORPUS_V2_READER_SCHEMA,
                        9,
                    )
                msgs.append((str(i).encode(), v))
            with open(
                os.path.join(ka_dir, f"{k:08d}.log"), "wb"
            ) as f:
                f.write(
                    KL.kafka_log_build(
                        msgs,
                        base_offset=k * 10_000,
                        compression=ka_codecs[k],
                        batch_records=50,
                    )
                )
        with open(os.path.join(ka_dir, "junk.log"), "wb") as f:
            f.write(b"\x02not a segment\x02")
        ka_bad = F.col("_corrupt").isNotNull()
        kafmt = KL.read_kafka_avro_corpus(
            s,
            ka_dir,
            registry=cw_registry,
            reader_schema=AV.CORPUS_V2_READER_SCHEMA,
        ).select(
            F.when(ka_bad, F.lit(-1))
            .otherwise(F.col("doc_id"))
            .cast("long")
            .alias("doc_id"),
            F.when(ka_bad, F.lit(-1))
            .otherwise(F.col("score"))
            .cast("long")
            .alias("n_tokens"),
            ka_bad.cast("long").alias("n_oov"),
            F.when(ka_bad, F.md5(F.lit("")))
            .otherwise(
                F.md5(
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(":"),
                        F.col("lang"),
                    )
                )
            )
            .alias("ids_fp"),
            F.when(ka_bad, F.lit(-1))
            .otherwise(
                F.col("doc_id") + F.col("score") + F.length("lang")
            )
            .cast("long")
            .alias("ids_sum"),
            F.lit("kafmt").alias("kind"),
        )
        ev_bad = F.col("_corrupt").isNotNull()
        evfmt = AV.read_evolved_corpus_avro(s, ev_dir).select(
            F.when(ev_bad, F.lit(-1))
            .otherwise(F.col("doc_id"))
            .cast("long")
            .alias("doc_id"),
            F.when(ev_bad, F.lit(-1))
            .otherwise(F.col("score"))
            .cast("long")
            .alias("n_tokens"),
            ev_bad.cast("long").alias("n_oov"),
            F.when(ev_bad, F.md5(F.lit("")))
            .otherwise(
                F.md5(
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(":"),
                        F.col("lang"),
                    )
                )
            )
            .alias("ids_fp"),
            F.when(ev_bad, F.lit(-1))
            .otherwise(
                F.col("doc_id") + F.col("score") + F.length("lang")
            )
            .cast("long")
            .alias("ids_sum"),
            F.lit("evfmt").alias("kind"),
        )
        return coerce(read_corpus_any(s, av_dir, fmt="avro")).withColumn(
            "kind", F.lit("avfmt")
        ).unionByName(
            coerce(read_corpus_any(s, csv_dir, fmt="csv")).withColumn(
                "kind", F.lit("csvfmt")
            )
        ).unionByName(embfmt).unionByName(unfmt).unionByName(
            lgfmt
        ).unionByName(evfmt).unionByName(sofmt).unionByName(
            szfmt
        ).unionByName(cwfmt).unionByName(kafmt)

    def tokenize_both(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators import bpe

        vocab = text.tokenize_with_vocab(_docs(s, d), 100).withColumn(
            "kind", F.lit("vocab")
        )
        bpe_leg = bpe.bpe_doc_summary(_docs(s, d)).withColumn(
            "kind", F.lit("bpe")
        )
        tc = bpe.train_corpus(s)
        trained = bpe.bpe_doc_summary(tc, bpe.bpe_train(tc, num_merges=8))
        return (
            vocab.unionByName(bpe_leg)
            .unionByName(trained.withColumn("kind", F.lit("bpet")))
            .unionByName(_format_roundtrip_legs(s, d))
        )

    q["corpus_tokenize"] = tokenize_both
    from timeseries_db_spark.operators import bpe as _bpe

    o["corpus_tokenize"] = (
        f"SELECT *, 'vocab' AS kind FROM ({text.tokenize_with_vocab_sql(100)})"
        " UNION ALL "
        f"SELECT *, 'bpe' AS kind FROM ({_bpe.bpe_doc_summary_sql()})"
        " UNION ALL "
        "SELECT *, 'bpet' AS kind FROM ("
        + _bpe.bpe_doc_summary_sql(
            _bpe.train_gate_merges(8), from_sql=f"({_bpe.train_corpus_sql()})"
        )
        + ")"
        # r14 avfmt/csvfmt: the format-roundtrip closed forms — every
        # doc once per format plus exactly one quarantined corruption
        # per format (n_oov=1 sentinel rows)
        + """
        UNION ALL
        SELECT doc_id,
               length('Avro doc ' || doc_id)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5('Avro doc ' || doc_id) AS ids_fp,
               (doc_id + length('Avro doc ' || doc_id))::BIGINT AS ids_sum,
               'avfmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'avfmt'
        UNION ALL
        SELECT doc_id,
               length('Csv doc ' || doc_id)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5('Csv doc ' || doc_id) AS ids_fp,
               (doc_id + length('Csv doc ' || doc_id))::BIGINT AS ids_sum,
               'csvfmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'csvfmt'
        UNION ALL
        SELECT doc_id, 3::BIGINT AS n_tokens, 0::BIGINT AS n_oov,
               md5(doc_id || ',' || (2 * doc_id) || ',' || (doc_id % 7))
                   AS ids_fp,
               (3 * doc_id + doc_id % 7)::BIGINT AS ids_sum,
               'embfmt' AS kind
        FROM documents
        UNION ALL
        -- unfmt (r15): the general-union column restated per branch —
        -- null / 7*doc_id / 'tag'||doc_id cycling by doc_id % 3
        SELECT doc_id, (doc_id % 3)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5(CASE (doc_id % 3)
                   WHEN 1 THEN (7 * doc_id)::VARCHAR
                   WHEN 2 THEN 'tag' || doc_id ELSE '' END) AS ids_fp,
               (CASE (doc_id % 3)
                WHEN 1 THEN 7 * doc_id
                WHEN 2 THEN length('tag' || doc_id) ELSE 0 END)::BIGINT
                   AS ids_sum,
               'unfmt' AS kind
        FROM documents
        UNION ALL
        -- lgfmt (r15): logical types restated exactly — epoch-micros
        -- timestamp, epoch-day date, decimal(10,2) as unscaled cents
        -- (negative below doc_id 1094), the thrice-referenced enum
        SELECT doc_id, (19000 + doc_id % 365)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5((1700000000000000 + doc_id) || ':'
                   || (12345 + 7 * doc_id - 20000) || ':'
                   || (CASE (doc_id % 3) WHEN 0 THEN 'RED'
                       WHEN 1 THEN 'GREEN' ELSE 'BLUE' END) || ':'
                   || (CASE ((doc_id + 1) % 3) WHEN 0 THEN 'RED'
                       WHEN 1 THEN 'GREEN' ELSE 'BLUE' END) || ':'
                   || (CASE ((doc_id + 2) % 3) WHEN 0 THEN 'RED'
                       WHEN 1 THEN 'GREEN' ELSE 'BLUE' END)) AS ids_fp,
               (12345 + 7 * doc_id - 20000
                + 19000 + doc_id % 365)::BIGINT AS ids_sum,
               'lgfmt' AS kind
        FROM documents
        UNION ALL
        -- evfmt (r16): schema evolution restated — even docs were
        -- written v1 (score 2*id widened int->long, body aliased to
        -- text and NULL every 6th, lang filled from the 'und'
        -- default), odd docs v2-native (score 3*id, lang 'en'), plus
        -- one container-level quarantine for the unresolvable shard
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                     ELSE 3 * doc_id END)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5(CASE WHEN doc_id % 6 = 0 THEN ':und'
                        WHEN doc_id % 2 = 0
                            THEN 'Evo doc ' || doc_id || ':und'
                        ELSE 'Evo doc ' || doc_id || ':en' END) AS ids_fp,
               (doc_id
                + CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                       ELSE 3 * doc_id END
                + CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
                   AS ids_sum,
               'evfmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'evfmt'
        UNION ALL
        -- sofmt (r16): single-object encoding restated — the SAME
        -- evolution closed form as evfmt ('So doc' texts) since the
        -- envelope (per-message fingerprint header vs container) is
        -- transparent to the decoded values, plus one quarantine row
        -- for the markerless segment
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                     ELSE 3 * doc_id END)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5(CASE WHEN doc_id % 6 = 0 THEN ':und'
                        WHEN doc_id % 2 = 0
                            THEN 'So doc ' || doc_id || ':und'
                        ELSE 'So doc ' || doc_id || ':en' END) AS ids_fp,
               (doc_id
                + CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                       ELSE 3 * doc_id END
                + CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
                   AS ids_sum,
               'sofmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'sofmt'
        UNION ALL
        -- szfmt (r16): snappy-framed .jsonl.sz shards — every doc
        -- once plus one CRC-rejected shard's sentinel
        SELECT doc_id,
               length('Sz doc ' || doc_id)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5('Sz doc ' || doc_id) AS ids_fp,
               (doc_id + length('Sz doc ' || doc_id))::BIGINT AS ids_sum,
               'szfmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'szfmt'
        UNION ALL
        -- cwfmt (r17): Confluent wire format restated — the SAME
        -- evolution closed form as sofmt ('Cw doc' texts): the
        -- envelope (magic+schema-id header vs fingerprint header) is
        -- transparent to the decoded values, plus one quarantine row
        -- for the magic-less segment
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                     ELSE 3 * doc_id END)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5(CASE WHEN doc_id % 6 = 0 THEN ':und'
                        WHEN doc_id % 2 = 0
                            THEN 'Cw doc ' || doc_id || ':und'
                        ELSE 'Cw doc ' || doc_id || ':en' END) AS ids_fp,
               (doc_id
                + CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                       ELSE 3 * doc_id END
                + CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
                   AS ids_sum,
               'cwfmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'cwfmt'
        UNION ALL
        -- kafmt (r17): Kafka log segments restated — RecordBatch v2
        -- walk + Confluent-framed values under the same v1/v2
        -- registry, so the closed form is the cwfmt evolution shape
        -- with 'Ka doc' texts (the batch envelope and all five
        -- protocol codecs are transparent to the decoded values);
        -- the junk segment prices one quarantine row
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                     ELSE 3 * doc_id END)::BIGINT AS n_tokens,
               0::BIGINT AS n_oov,
               md5(CASE WHEN doc_id % 6 = 0 THEN ':und'
                        WHEN doc_id % 2 = 0
                            THEN 'Ka doc ' || doc_id || ':und'
                        ELSE 'Ka doc ' || doc_id || ':en' END) AS ids_fp,
               (doc_id
                + CASE WHEN doc_id % 2 = 0 THEN 2 * doc_id
                       ELSE 3 * doc_id END
                + CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
                   AS ids_sum,
               'kafmt' AS kind
        FROM documents
        UNION ALL
        SELECT -1, -1, 1, md5(''), -1, 'kafmt'
    """
    )

    # ---- dedup ----
    q["dedup_exact"] = lambda s, d: dedup.exact_dedup(_docs(s, d))
    o["dedup_exact"] = dedup.exact_dedup_sql()

    # exact + stop-shingle-capped (df_limit — the skew guard that makes
    # the inverted-index join survive at scale) union-folded into one
    # gate entry with a `variant` discriminator; each branch keeps its
    # own physical plan
    def ngram_jaccard_both(s: SparkSession, d: str) -> DataFrame:
        exact = dedup.ngram_jaccard_pairs(_docs(s, d), JACCARD_T).select(
            F.lit("exact").alias("variant"), "id_a", "id_b", "jaccard"
        )
        capped = dedup.ngram_jaccard_pairs(
            _docs(s, d), JACCARD_T, df_limit=50
        ).select(F.lit("capped").alias("variant"), "id_a", "id_b", "jaccard")
        # late-r8 leg: cross-document duplicated-shingle fraction
        # (RefinedWeb boilerplate signal), coerced to the entry's pair
        # schema as (doc_id, n_common, frac)
        dupfrac = dedup.duplicated_ngram_fraction(_docs(s, d)).select(
            F.lit("dupfrac").alias("variant"),
            F.col("doc_id").alias("id_a"),
            F.col("n_common").alias("id_b"),
            F.col("dup_frac").alias("jaccard"),
        )
        # r8 leg: exact-substring scrub (Lee et al. duplicated-span
        # removal). The rewritten TEXT itself is what needs verifying, so
        # the coercion carries its 60-bit md5-long fingerprint as id_b —
        # one flipped surviving token on either engine flips the hash —
        # and the removed-token fraction as the value column
        scrub = dedup.scrub_duplicated_spans(_docs(s, d)).select(
            F.lit("scrub").alias("variant"),
            F.col("doc_id").alias("id_a"),
            F.expr(
                "CAST(conv(substring(md5(clean_text), 1, 15), 16, 10) AS BIGINT)"
            ).alias("id_b"),
            numeric.duck_round(
                F.col("n_removed")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                4,
            ).alias("jaccard"),
        )
        # late-r8 leg: DIRECTED containment (|A∩B|/|A| — the
        # quote/excerpt signal Jaccard misses when sizes differ)
        contain = dedup.ngram_containment_pairs(_docs(s, d), 0.8).select(
            F.lit("contain").alias("variant"),
            "id_a",
            "id_b",
            F.col("containment").alias("jaccard"),
        )
        # r14 paradd leg: GLOBAL exact paragraph dedup with document
        # rewrite (RefinedWeb/FineWeb's step between whole-doc dedup
        # and span scrub) over constructed pages — a corpus-shared
        # intro, the doc body, and a promo block shared by doc_id%3 —
        # so the first doc keeps everything and later docs lose the
        # shared paragraphs. id_b carries the md5-long fingerprint of
        # the REWRITTEN text (one flipped surviving paragraph flips
        # the hash), jaccard the dropped fraction; the oracle runs the
        # generated DuckDB twin over the same construction.
        pclean = (
            "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]',"
            " ''), ' +', ' '))"
        )
        para_docs = _docs(s, d).select(
            "doc_id",
            F.expr(
                "'Shared intro paragraph.' || chr(10) || chr(10) ||"
                f" 'Doc ' || doc_id || ' body: ' || {pclean} ||"
                " chr(10) || chr(10) || 'Promo block ' || (doc_id % 3)"
            ).alias("text"),
        )
        paradd = dedup.paragraph_dedup(para_docs).select(
            F.lit("paradd").alias("variant"),
            F.col("doc_id").alias("id_a"),
            F.expr(
                "CAST(conv(substring(md5(clean_text), 1, 15), 16, 10)"
                " AS BIGINT)"
            ).alias("id_b"),
            numeric.duck_round(
                F.col("n_dropped")
                / F.greatest(F.col("n_paras"), F.lit(1)).cast("double"),
                4,
            ).alias("jaccard"),
        )
        return (
            exact.unionByName(capped)
            .unionByName(dupfrac)
            .unionByName(scrub)
            .unionByName(contain)
            .unionByName(paradd)
        )

    q["dedup_ngram_jaccard"] = ngram_jaccard_both
    o["dedup_ngram_jaccard"] = f"""
        SELECT 'exact' AS variant, *
        FROM ({dedup.ngram_jaccard_pairs_sql(JACCARD_T)})
        UNION ALL
        SELECT 'capped' AS variant, *
        FROM ({dedup.ngram_jaccard_pairs_sql(JACCARD_T, df_limit=50)})
        UNION ALL
        SELECT 'dupfrac' AS variant, doc_id AS id_a, n_common AS id_b,
               dup_frac AS jaccard
        FROM ({dedup.duplicated_ngram_fraction_sql()})
        UNION ALL
        SELECT 'scrub' AS variant, doc_id AS id_a,
               ('0x' || substr(md5(clean_text), 1, 15))::BIGINT AS id_b,
               round(n_removed / greatest(n_tokens, 1)::DOUBLE, 4) AS jaccard
        FROM ({dedup.scrub_duplicated_spans_sql()})
        UNION ALL
        SELECT 'contain' AS variant, id_a, id_b, containment AS jaccard
        FROM ({dedup.ngram_containment_pairs_sql(0.8)})
        UNION ALL
        SELECT 'paradd' AS variant, doc_id AS id_a,
               ('0x' || substr(md5(clean_text), 1, 15))::BIGINT AS id_b,
               round(n_dropped / greatest(n_paras, 1)::DOUBLE, 4)
                   AS jaccard
        FROM ({dedup.paragraph_dedup_sql(
            "SELECT doc_id,"
            " 'Shared intro paragraph.' || chr(10) || chr(10) ||"
            " 'Doc ' || doc_id || ' body: ' ||"
            " trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]',"
            " '', 'g'), ' +', ' ', 'g')) ||"
            " chr(10) || chr(10) || 'Promo block ' || (doc_id % 3)"
            " AS text FROM documents"
        )})
    """

    # persist_pairs=False (r18, ADVICE r17): the entry recomputes the
    # band self-join + exact-Jaccard verify on every invocation; only the
    # signature table (an index artifact shared with dedup_clusters /
    # curation) stays persist-tracked.
    q["dedup_minhash_lsh"] = lambda s, d: dedup.minhash_lsh_pairs(
        _docs(s, d), JACCARD_T, persist_pairs=False
    )
    o["dedup_minhash_lsh"] = dedup.minhash_lsh_pairs_sql(JACCARD_T)

    # pairs → clusters: connected components over the LSH pair graph
    # (min-label propagation + pointer jumping; recursive-CTE oracle)
    from timeseries_db_spark.operators import graph

    # late-r8 fold: min-id canonical + quality-aware keep-best as two
    # legs on a shared (kind, doc_id, cluster_id, val, keep) schema —
    # val carries cluster_size (minid) or the quality score (best).
    # Both legs share the persist-tracked LSH pair set and the
    # checkpointed components run.
    def clusters_both(s: SparkSession, d: str) -> DataFrame:
        # r17 note: an earlier draft of this round cached the components
        # LABELS across invocations (plan_key = docs hash + threshold),
        # which made bench repeats time a cache read instead of the
        # iterative loop. Reverted: the labels are the entry's computed
        # result, and every invocation must recompute from the parquet
        # inputs. Within ONE invocation the loop already runs once — the
        # checkpointed `comp` frame below is shared by both legs.
        comp = graph.lsh_components(_docs(s, d), JACCARD_T)
        minid = graph.dedup_clusters(_docs(s, d), JACCARD_T, comp=comp).select(
            F.lit("minid").alias("kind"),
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("double").alias("val"),
            "keep",
        )
        best = graph.dedup_keep_best(_docs(s, d), JACCARD_T, comp=comp).select(
            F.lit("best").alias("kind"),
            "doc_id",
            "cluster_id",
            F.col("quality").alias("val"),
            "keep",
        )
        return minid.unionByName(best)

    q["dedup_clusters"] = clusters_both
    o["dedup_clusters"] = f"""
        SELECT 'minid' AS kind, doc_id, cluster_id,
               CAST(cluster_size AS DOUBLE) AS val, keep
        FROM ({graph.dedup_clusters_sql(JACCARD_T)})
        UNION ALL
        SELECT 'best' AS kind, doc_id, cluster_id, quality AS val, keep
        FROM ({graph.dedup_keep_best_sql(JACCARD_T)})
    """

    # --- dedup_simhash: r7 fold of dedup_simhash_sig + dedup_simhash_pairs
    # into ONE union entry (freed a gate slot for text_lm_score). Branches
    # coerce to a shared (kind, a, b, v) long schema: sig rows carry
    # (doc_id, 0, simhash), pair rows (id_a, id_b, hamming). Kinds stay
    # disjoint, so the driver's value hash still covers every signature
    # bit and every surviving pair. ---
    def dedup_simhash(s, d):
        # the persist-tracked signature table serves BOTH legs: the sig
        # rows here and the pair join's self-join below share one
        # 60-monoid aggregation pass per invocation
        sig = dedup.simhash_signatures_cached(_docs(s, d)).select(
            F.lit("sig").alias("kind"),
            F.col("doc_id").alias("a"),
            F.lit(0).cast("long").alias("b"),
            F.col("simhash").alias("v"),
        )
        pairs = dedup.simhash_pairs(_docs(s, d), SIMHASH_MAX_HAMMING).select(
            F.lit("pair").alias("kind"),
            F.col("id_a").alias("a"),
            F.col("id_b").alias("b"),
            F.col("hamming").alias("v"),
        )
        return sig.unionByName(pairs)

    q["dedup_simhash"] = dedup_simhash
    o["dedup_simhash"] = f"""
        SELECT 'sig' AS kind, doc_id AS a, 0::BIGINT AS b, simhash AS v
        FROM ({dedup.simhash_signatures_sql()})
        UNION ALL
        SELECT 'pair' AS kind, id_a AS a, id_b AS b, hamming AS v
        FROM ({dedup.simhash_pairs_sql(SIMHASH_MAX_HAMMING)})
    """

    # CCNet-style LM quality scoring: char-trigram model fitted on the
    # corpus itself, mean log-prob per document; fixed-point BIGINT sums
    # keep the cross-engine comparison exact (operators/lm.py docstring)
    from timeseries_db_spark.operators import lm

    # r8 (VERDICT r7 item 2): the self-scoring leg never fires the
    # unseen-trigram backoff (every scored trigram is in the model by
    # construction); the `xcorpus` leg is the actual CCNet use — fit on
    # the deterministic train split, score the valid split — where the
    # smoothed floor path IS exercised and value-hashed
    from timeseries_db_spark.operators.corpus import _split_col, _split_sql

    def text_lm_score(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        scored = lm.lm_score(docs)
        self_leg = scored.withColumn("kind", F.lit("self"))
        split = _split_col(F.col("doc_id"))
        x_leg = lm.lm_score(
            docs.filter(split == "valid"), ref=docs.filter(split == "train")
        ).withColumn("kind", F.lit("xcorpus"))

        def _bucket_leg(part: DataFrame, kind: str) -> DataFrame:
            # bucket rides in n_tri; other cols NULL
            return part.select(
                "doc_id",
                F.col("bucket").cast("long").alias("n_tri"),
                F.lit(None).cast("long").alias("score_fp"),
                F.lit(None).cast("double").alias("avg_logprob"),
                F.lit(None).cast("double").alias("bits_per_char"),
                F.lit(kind).alias("kind"),
            )

        # r8: CCNet head/middle/tail — rank-based terciles over the
        # exact fixed-point scores
        terciles = _bucket_leg(lm.lm_partition(scored), "tercile")
        # r10 (VERDICT r9 item 2): lm_partition_approx's map-only
        # threshold-assignment path, driven by rank-exact boundary
        # literals both engines reproduce (the percentile_approx
        # boundary itself stays pytest-pinned — operators/lm.py)
        approx = _bucket_leg(
            lm.lm_partition_approx(
                scored, bounds=lm.lm_partition_rank_bounds(scored)
            ),
            "approx",
        )
        return (
            self_leg.unionByName(x_leg)
            .unionByName(terciles)
            .unionByName(approx)
        )

    q["text_lm_score"] = text_lm_score
    _split_doc = _split_sql("doc_id")
    o["text_lm_score"] = (
        f"SELECT *, 'self' AS kind FROM ({lm.lm_score_sql()})"
        " UNION ALL "
        "SELECT *, 'xcorpus' AS kind FROM ("
        + lm.lm_score_xcorpus_sql(
            f"(SELECT * FROM documents WHERE {_split_doc} = 'train')",
            f"(SELECT * FROM documents WHERE {_split_doc} = 'valid')",
        )
        + ") UNION ALL "
        "SELECT doc_id, CAST(bucket AS BIGINT) AS n_tri,"
        " NULL::BIGINT AS score_fp, NULL::DOUBLE AS avg_logprob,"
        " NULL::DOUBLE AS bits_per_char, 'tercile' AS kind FROM ("
        + lm.lm_partition_sql(lm.lm_score_sql())
        + ") UNION ALL "
        "SELECT doc_id, CAST(bucket AS BIGINT) AS n_tri,"
        " NULL::BIGINT AS score_fp, NULL::DOUBLE AS avg_logprob,"
        " NULL::DOUBLE AS bits_per_char, 'approx' AS kind FROM ("
        + lm.lm_partition_approx_sql(lm.lm_score_sql())
        + ")"
    )

    # ---- corpus management: deterministic split + decontamination ----
    from timeseries_db_spark.operators import corpus

    q["corpus_split"] = lambda s, d: corpus.assign_splits(_docs(s, d))
    o["corpus_split"] = corpus.assign_splits_sql()

    q["corpus_contamination"] = lambda s, d: corpus.benchmark_contamination(
        _docs(s, d)
    )
    o["corpus_contamination"] = corpus.benchmark_contamination_sql()

    # r7 fold: the two pretraining layout ops — concat-and-cut sequence
    # packing and sliding context-window chunking — share one entry.
    # NOT a union of the two operators: that shape re-tokenizes the
    # corpus once per leg (Catalyst does not dedupe scans across union
    # branches — the same artifact the agg families were rebuilt to
    # avoid). Instead ONE tokenize scan feeds the pack window, and each
    # windowed row explodes into its pack row plus its chunk rows —
    # single scan, single (shard-key) shuffle. Leg→column mapping:
    # pack: a=shard, b=n_tokens, c=seq_id, d=tok_offset; chunk:
    # a=chunk_idx, b=tok_start, c=tok_len, d=NULL. 100-doc shards at
    # fixture scale → several shards even at sf0.001.
    def corpus_pack(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators.text import TOKENS_SPARK

        budget, shard_docs, max_tokens, stride = 512, 100, 128, 96
        docs = _docs(s, d)
        t = docs.select(
            "doc_id",
            F.expr(f"size({TOKENS_SPARK})").cast("long").alias("n_tokens"),
        ).withColumn("shard", F.expr(f"doc_id div {shard_docs}"))
        from pyspark.sql import Window

        w = Window.partitionBy("shard").orderBy("doc_id")
        t = t.withColumn(
            "_start", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        )
        rows = F.expr(
            "explode(concat("
            # the pack row
            f" array(struct('pack' AS kind, shard AS a, n_tokens AS b,"
            f"   _start div {budget} AS c, _start % {budget} AS d)),"
            # the chunk rows (none for empty docs)
            " IF(n_tokens > 0,"
            f"  transform(sequence(0L, n_tokens - 1, CAST({stride} AS LONG)),"
            f"   st -> struct('chunk' AS kind, st div {stride} AS a, st AS b,"
            f"     least(CAST({max_tokens} AS LONG), n_tokens - st) AS c,"
            "      CAST(NULL AS LONG) AS d)),"
            "  CAST(array() AS array<struct<kind:string,a:bigint,b:bigint,"
            "c:bigint,d:bigint>>))"
            "))"
        ).alias("r")
        return t.select("doc_id", rows).select(
            "doc_id", "r.kind", "r.a", "r.b", "r.c", "r.d"
        )

    q["corpus_pack"] = corpus_pack
    o["corpus_pack"] = f"""
        SELECT doc_id, 'pack' AS kind, shard AS a, n_tokens AS b,
               seq_id AS c, tok_offset AS d
        FROM ({corpus.pack_sequences_sql(budget_tokens=512, shard_docs=100)}) p
        UNION ALL
        SELECT doc_id, 'chunk' AS kind, chunk_idx AS a, tok_start AS b,
               tok_len AS c, NULL::BIGINT AS d
        FROM ({corpus.chunk_documents_sql()}) c
    """

    # per-stratum rebalance (en kept at 60%, es boosted to 100%, the
    # rest thinned to 25%) — fractions chosen so every branch of the
    # CASE, including the >=1.0 keep-all edge, is exercised by the gate
    # r8 fold: rate-based + length-weighted (Efraimidis-Spirakis)
    # sampling as `kind` legs of one entry — both are deterministic
    # hash-randomness membership selections with a (doc_id, lang) shape
    # late-r8 mix leg: resample toward a TARGET language mixture with
    # data-derived keep-rates (vs the rate leg's configured fractions)
    MIX_TARGETS = {"en": 300_000, "de": 200_000, "es": 200_000,
                   "fr": 150_000, "zh": 150_000}

    def sample_both(s: SparkSession, d: str) -> DataFrame:
        rate = corpus.stratified_sample(
            _docs(s, d), {"en": 0.6, "es": 1.0}, default_fraction=0.25
        ).withColumn("kind", F.lit("rate"))
        weighted = corpus.weighted_sample(_docs(s, d), 25).withColumn(
            "kind", F.lit("weighted")
        )
        mix = corpus.mixture_resample(_docs(s, d), MIX_TARGETS).withColumn(
            "kind", F.lit("mix")
        )
        return rate.unionByName(weighted).unionByName(mix)

    q["corpus_sample_stratified"] = sample_both
    _rate_sql = corpus.stratified_sample_sql(
        {"en": 0.6, "es": 1.0}, default_fraction=0.25
    )
    o["corpus_sample_stratified"] = (
        f"SELECT *, 'rate' AS kind FROM ({_rate_sql})"
        " UNION ALL "
        f"SELECT *, 'weighted' AS kind FROM ({corpus.weighted_sample_sql(25)})"
        " UNION ALL "
        f"SELECT *, 'mix' AS kind FROM ({corpus.mixture_resample_sql(MIX_TARGETS)})"
    )

    # r7 fold (VERDICT item 4): the per-stratum quality top-k AND the
    # end-to-end curation composition (split → contamination → dedup-keep
    # → quality → verdict) share one union entry, discriminated by
    # `kind`. Leg→column mapping: topk: stratum=lang, v=rnk, dup_loser/
    # kept NULL; curate: stratum=split, v=n_shared, booleans real. The
    # curate leg's oracle is composed from the component stages' own SQL
    # twins, so the integration seams get a driver row of their own.
    def corpus_curation(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        nb = F.lit(None).cast("boolean")
        topk = corpus.curation_topk(docs, 10).select(
            "doc_id",
            F.lit("topk").alias("kind"),
            F.col("lang").alias("stratum"),
            "quality",
            F.col("rnk").alias("v"),
            nb.alias("dup_loser"),
            nb.alias("kept"),
        )
        cur = corpus.curate_corpus(docs).select(
            "doc_id",
            F.lit("curate").alias("kind"),
            F.col("split").alias("stratum"),
            "quality",
            F.col("n_shared").alias("v"),
            F.col("is_dup_loser").alias("dup_loser"),
            "kept",
        )
        # r8: source-level (domain) filtering — the mean rides in `v` as
        # an exact fixed-point long (the rounded double × 10⁴)
        src = corpus.source_reputation(docs).select(
            "doc_id",
            F.lit("source").alias("kind"),
            F.col("source").alias("stratum"),
            "quality",
            numeric.duck_round(F.col("src_mean") * 10_000, 0)
            .cast("long")
            .alias("v"),
            nb.alias("dup_loser"),
            "kept",
        )
        return topk.unionByName(cur).unionByName(src)

    q["corpus_curation_topk"] = corpus_curation
    o["corpus_curation_topk"] = f"""
        SELECT doc_id, 'topk' AS kind, lang AS stratum, quality,
               rnk AS v, NULL::BOOLEAN AS dup_loser, NULL::BOOLEAN AS kept
        FROM ({corpus.curation_topk_sql(10)}) t
        UNION ALL
        SELECT doc_id, 'curate' AS kind, split AS stratum, quality,
               n_shared AS v, is_dup_loser AS dup_loser, kept
        FROM ({corpus.curate_corpus_sql()}) c
        UNION ALL
        SELECT doc_id, 'source' AS kind, source AS stratum, quality,
               round(src_mean * 10000)::BIGINT AS v,
               NULL::BOOLEAN AS dup_loser, kept
        FROM ({corpus.source_reputation_sql()}) s
    """

    # ---- similarity search ----
    # r8 fold: int8 quantization + Johnson-Lindenstrauss random-projection
    # summary (64 -> 16 dims) as `kind` legs of ONE entry — both are
    # per-vector, map-only embedding transforms with the same summary
    # shape, and the rp leg's fixed-point sums / rounded norms are
    # engine-exact (strict left-fold dots against shared plane literals)
    def quantize_and_rp(s: SparkSession, d: str) -> DataFrame:
        e = _emb(s, d)
        int8 = similarity.quantize_int8(e).withColumn("kind", F.lit("int8"))
        rp = similarity.rp_summary(e, EMB_DIM).withColumn("kind", F.lit("rp"))
        # late-r8 leg: feature-hashed TEXT vectors (the hashing trick) —
        # documents get a real derived embedding with no external model,
        # summarized in the entry's shared (vec_id, n_dims, scale,
        # sum_q, max_err) shape
        tvec = text.text_vec_summary(_docs(s, d)).withColumn(
            "kind", F.lit("tvec")
        )
        return int8.unionByName(rp).unionByName(tvec)

    q["sim_quantize_int8"] = quantize_and_rp
    o["sim_quantize_int8"] = (
        f"SELECT *, 'int8' AS kind FROM ({similarity.quantize_int8_sql()})"
        " UNION ALL "
        f"SELECT *, 'rp' AS kind FROM ({similarity.rp_summary_sql(EMB_DIM)})"
        " UNION ALL "
        f"SELECT *, 'tvec' AS kind FROM ({text.text_vec_summary_sql()})"
    )

    q["sim_cosine_topk"] = lambda s, d: similarity.cosine_topk(
        s, _emb(s, d).filter(F.expr(TOPK_QUERY_PRED)), _emb(s, d), TOPK_K
    )
    o["sim_cosine_topk"] = similarity.cosine_topk_sql(TOPK_QUERY_PRED, TOPK_K)

    # --- sim_embedding_dedup: late-r7 fold of the exact near-dup pair
    # detector with the NEW SemDeDup-style semantic dedup (cluster →
    # within-cluster pairs → components → canonical keep). Branches
    # coerce to (kind, a, b, v): pair rows (id_a, id_b, cos), sem rows
    # (vec_id, rep_id, list_id) — keep is derivable as a = b. Kinds stay
    # disjoint, so the value hash covers both the exact pair set and the
    # full per-vector semantic keep/representative decision. ---
    def sim_embedding_dedup(s, d):
        pairs = similarity.near_dup_pairs(_emb(s, d), NEAR_DUP_COS).select(
            F.lit("pair").alias("kind"),
            F.col("id_a").alias("a"),
            F.col("id_b").alias("b"),
            F.col("cos").alias("v"),
        )
        sem = similarity.semantic_dedup(_emb(s, d), NEAR_DUP_COS).select(
            F.lit("sem").alias("kind"),
            F.col("vec_id").alias("a"),
            F.col("rep_id").alias("b"),
            F.col("list_id").cast("double").alias("v"),
        )
        return pairs.unionByName(sem)

    q["sim_embedding_dedup"] = sim_embedding_dedup
    o["sim_embedding_dedup"] = f"""
        SELECT 'pair' AS kind, id_a AS a, id_b AS b, cos AS v
        FROM ({similarity.near_dup_pairs_sql(NEAR_DUP_COS)})
        UNION ALL
        SELECT 'sem' AS kind, vec_id AS a, rep_id AS b, list_id::DOUBLE AS v
        FROM ({similarity.semantic_dedup_sql(NEAR_DUP_COS)})
    """

    # approximate paths. SRP carries a FULL value oracle: its bucket
    # signatures are strict-left-fold dot products against inlined plane
    # literals, bit-identical across engines (similarity.srp_signatures),
    # so approximate-but-deterministic output is exactly reproducible in
    # SQL. (Recall vs brute force is still asserted in pytest.)
    q["ann_topk_srp"] = lambda s, d: similarity.ann_topk_srp(
        s, _emb(s, d).filter(F.expr(TOPK_QUERY_PRED)), _emb(s, d), TOPK_K, EMB_DIM
    )
    o["ann_topk_srp"] = similarity.ann_topk_srp_sql(TOPK_QUERY_PRED, TOPK_K, EMB_DIM)
    # IVF also carries a full oracle: the centroid sample is a portable
    # hash top-N, and assignment/probing rank on ROUNDED similarity with
    # vec_id tiebreak — the same rule a SQL window computes. r9 `pq`
    # leg: product-quantization ADC top-k (the compression half of the
    # faiss IVF-PQ scale recipe) — per-dimension fixed-point integer
    # subdistances make encode AND query ranking pure integer math,
    # bit-identical across engines by construction. Shared
    # (qid, nid, score, kind) schema: ivf carries rounded cosine, pq the
    # exact integer ADC distance as a double.
    def ann_ivf_and_pq(s: SparkSession, d: str) -> DataFrame:
        from timeseries_db_spark.operators.dedup import _persist_tracked

        emb = _emb(s, d)
        qs = emb.filter(F.expr(TOPK_QUERY_PRED))
        # r12 fold: the three IVF consumers (ivf, ivfpq, ivfp8) share
        # ONE persisted centroid sample and (for the two PQ legs) ONE
        # persisted corpus assignment — each used to recompute its own
        # corpus top-k scan / assignment pass; values are identical,
        # only the plan dedupes (fold note in bench.py)
        cents = _persist_tracked(
            "ann_cents", similarity.ivf_centroids(emb)
        )
        # r17 (guide §5, driver work): collect + broadcast the
        # quantizer ONCE for every consumer, the codebook once, and the
        # gate query set once — the six legs used to pay ~10 bounded
        # driver round trips re-collecting identical frames per
        # invocation. Values are unchanged (same sort, same payloads).
        # r17b (guide §2.6, overlap independent jobs): the four bounded
        # artifact collects (quantizer, codebook, refined codebook,
        # query set) are INDEPENDENT driver round trips — run them on a
        # small thread pool so their job latencies overlap instead of
        # summing (measured ~0.30 s serial → ~0.11 s). Same values:
        # each task runs the exact same call as the serial form.
        from concurrent.futures import ThreadPoolExecutor

        pqr_sample = _persist_tracked(
            "ann_pqr_sample", similarity.pq_refine_sample(emb)
        )
        with ThreadPoolExecutor(max_workers=4) as pool:
            f_cents = pool.submit(similarity.PreparedCentroids, s, cents)
            f_qpdf = pool.submit(
                lambda: qs.select("vec_id", "embedding").toPandas()
            )
            # r15: the DEFAULT codebook donor sample joins the shared
            # set — pq/ivfpq/ivfp8/ivfr each used to recompute it;
            # values are identical (same deterministic sample), only
            # the plan dedupes
            cb = _persist_tracked("ann_cb", similarity.pq_codebook(emb))
            f_cb = pool.submit(similarity.PreparedCodebook, cb)
            # r10 pqr codebook (VERDICT r9 item 8): the Lloyd-REFINED
            # codebook, made oracle-safe by all-integer refinement
            # (micro-unit quantized sample, integer means, unrolled
            # fixed iters) — prepared here so its sample collect rides
            # the pool too
            f_pqr_cb = pool.submit(
                lambda: similarity.pq_codebook_refined_int_prepared(
                    emb, sample_source=pqr_sample
                )
            )
            cents_p = f_cents.result()
            qpdf = f_qpdf.result()
            cb_p = f_cb.result()
            pqr_cb = f_pqr_cb.result()
        # stable cache identity for plans whose closures embed
        # per-invocation broadcast ids (their semanticHash changes every
        # build, so the persist cache silently missed — the r12/r15
        # sharing intent now actually holds across invocations): inputs'
        # semantic hashes + the literal parameters pin the plan.
        emb_h, cents_h = emb.semanticHash(), cents.semanticHash()
        assign = _persist_tracked(
            "ann_assign",
            similarity.ivf_assign_with_vectors(s, emb, cents_p),
            plan_key=f"{emb_h}:{cents_h}",
            pins=(cents_p,),
        )
        # r17b: the leg plan builds are independent given the shared
        # artifacts above — each is ~0.1-0.25 s of py4j round trips plus
        # a small driver probe kernel, so they overlap on the same pool
        # (the ivfpq/ivfr pair keeps its ordering inside one task).
        def _leg_ivf() -> DataFrame:
            return similarity.ann_topk_ivf(
                s, qs, emb, TOPK_K, centroid_source=cents_p, queries_pdf=qpdf
            ).select(
                "qid",
                "nid",
                F.col("cos").alias("score"),
                F.lit("ivf").alias("kind"),
            )

        def _leg_pq() -> DataFrame:
            return similarity.ann_topk_pq(
                s, qs, emb, TOPK_K, codebook_source=cb_p, queries_pdf=qpdf
            ).select(
                "qid",
                "nid",
                F.col("dist").cast("double").alias("score"),
                F.lit("pq").alias("kind"),
            )

        def _leg_pqr() -> DataFrame:
            return similarity.ann_topk_pq(
                s, qs, emb, TOPK_K, codebook_source=pqr_cb, queries_pdf=qpdf
            ).select(
                "qid",
                "nid",
                F.col("dist").cast("double").alias("score"),
                F.lit("pqr").alias("kind"),
            )
        # r10 ivfpq leg: the FULL faiss recipe — coarse-list pruning AND
        # PQ compression composed; only probed-list candidates are ADC-
        # scored. Deterministic end-to-end, so the composition itself
        # carries a full value oracle. r15: ONE depth-3k pass serves
        # both this leg (its global top-k is the prefix of the ranked
        # shortlist — the per-shard cap is >= k, so nothing is lost)
        # and the ivfr exact-rerank refine below.
        from pyspark.sql import Window as _W

        def _leg_ivfpq_and_rerank() -> "tuple[DataFrame, DataFrame]":
            _sink: list = []
            short3k = _persist_tracked(
                "ann_short3k",
                similarity.ann_topk_ivfpq(
                    s, qs, emb, 3 * TOPK_K,
                    centroid_source=cents_p, assign_source=assign,
                    codebook_source=cb_p, queries_pdf=qpdf, bc_sink=_sink,
                ),
                plan_key=(
                    f"{emb_h}:{cents_h}:{cb.semanticHash()}"
                    f":{qs.semanticHash()}:{3 * TOPK_K}"
                ),
                pins=(cents_p, cb_p, tuple(_sink)),
            )
            _wq = _W.partitionBy("qid").orderBy(
                F.col("dist").asc(), F.col("nid").asc()
            )
            ivfpq = (
                short3k.withColumn("rn", F.row_number().over(_wq))
                .filter(F.col("rn") <= TOPK_K)
                .select(
                    "qid",
                    "nid",
                    F.col("dist").cast("double").alias("score"),
                    F.lit("ivfpq").alias("kind"),
                )
            )
            # r15 ivfr leg: the EXACT-RERANK refine stage — the SAME
            # depth-3k shortlist re-scored with true vectors under the
            # cosine_topk rule; the score column is directly comparable
            # to the exact scan (recall asserted >= plain ivfpq in
            # pytest)
            ivfr = similarity.exact_rerank(
                s, qs, emb, short3k, TOPK_K, queries_pdf=qpdf
            ).select(
                "qid",
                "nid",
                F.col("cos").alias("score"),
                F.lit("ivfr").alias("kind"),
            )
            return ivfpq, ivfr
        # r12 ivfp8 leg (VERDICT r11 item 5): the PRUNED shape under the
        # gate. The main-leg query set grows with the corpus (the sf0.1
        # bench shape probes every list), so its CORRECTNESS rows never
        # see a real prune; this leg pins |Q| = 8 queries independent of
        # scale (vec_id < 480 ∧ %60) at nprobe = 2 ≪ nlist = 128 —
        # measured 15/128 lists → 65/500 vectors at sf0.01 and 16/128 →
        # 254/2000 at sf0.1, i.e. ~87% of the corpus pruned BEFORE any
        # PQ work at BOTH scales. Mis-pruning (wrong/over-pruned lists
        # in the probes→needed_ids→isin chain) changes the candidate
        # set and flips this leg's value hash.
        def _leg_ivfp8() -> DataFrame:
            qs8 = emb.filter(F.expr(PRUNE_QUERY_PRED))
            return similarity.ann_topk_ivfpq(
                s, qs8, emb, TOPK_K, nprobe=2,
                centroid_source=cents_p, assign_source=assign,
                codebook_source=cb_p,
            ).select(
                "qid",
                "nid",
                F.col("dist").cast("double").alias("score"),
                F.lit("ivfp8").alias("kind"),
            )

        with ThreadPoolExecutor(max_workers=5) as pool:
            f_ivf = pool.submit(_leg_ivf)
            f_pq = pool.submit(_leg_pq)
            f_pqr = pool.submit(_leg_pqr)
            f_ivfpq_r = pool.submit(_leg_ivfpq_and_rerank)
            f_ivfp8 = pool.submit(_leg_ivfp8)
            ivf, pq, pqr = f_ivf.result(), f_pq.result(), f_pqr.result()
            ivfpq, ivfr = f_ivfpq_r.result()
            ivfp8 = f_ivfp8.result()
        return (
            ivf.unionByName(pq)
            .unionByName(pqr)
            .unionByName(ivfpq)
            .unionByName(ivfp8)
            .unionByName(ivfr)
        )

    q["ann_topk_ivf"] = ann_ivf_and_pq
    o["ann_topk_ivf"] = (
        "SELECT qid, nid, cos AS score, 'ivf' AS kind FROM ("
        + similarity.ann_topk_ivf_sql(TOPK_QUERY_PRED, TOPK_K)
        + ") UNION ALL SELECT qid, nid, dist::DOUBLE AS score, 'pq' AS kind FROM ("
        + similarity.ann_topk_pq_sql(TOPK_QUERY_PRED, TOPK_K, dim=EMB_DIM)
        + ") UNION ALL SELECT qid, nid, dist::DOUBLE AS score, 'pqr' AS kind FROM ("
        + similarity.ann_topk_pq_refined_sql(TOPK_QUERY_PRED, TOPK_K, dim=EMB_DIM)
        + ") UNION ALL SELECT qid, nid, dist::DOUBLE AS score, 'ivfpq' AS kind FROM ("
        + similarity.ann_topk_ivfpq_sql(TOPK_QUERY_PRED, TOPK_K, dim=EMB_DIM)
        + ") UNION ALL SELECT qid, nid, dist::DOUBLE AS score, 'ivfp8' AS kind FROM ("
        + similarity.ann_topk_ivfpq_sql(
            PRUNE_QUERY_PRED, TOPK_K, nprobe=2, dim=EMB_DIM
        )
        + ") UNION ALL SELECT qid, nid, cos AS score, 'ivfr' AS kind FROM ("
        + similarity.ann_topk_ivfpq_rerank_sql(
            TOPK_QUERY_PRED, TOPK_K, dim=EMB_DIM
        )
        + ")"
    )

    # ---- multimodal (payload plumbing; decode stage is a deterministic
    # fake — see operators/multimodal.py) ----
    q["multimodal_image_features"] = lambda s, d: multimodal.decode_image_features(
        multimodal.documents_as_assets(_docs(s, d))
    )
    o["multimodal_image_features"] = """
        SELECT doc_id AS asset_id,
               (16 + ('0x' || substr(sha256(text), 1, 2))::INT % 240)::INT AS width,
               (16 + ('0x' || substr(sha256(text), 3, 2))::INT % 240)::INT AS height,
               octet_length(text::BLOB)::BIGINT AS n_bytes,
               sha256(text) AS sha256
        FROM documents WHERE doc_id % 3 = 0
    """

    # r7 fold: the frame plan joins the resize entry as a union leg
    # (freed the gate slot stream_ingest_dedup now occupies), and the
    # resize leg upgraded from header-plan-only to the REAL pixel path —
    # synthesized PNG payloads (all five row filters) are zlib-inflated,
    # unfiltered, and NN-downsampled for real; `v5` is the exact integer
    # sum of the resized pixel bytes, which the oracle recomputes
    # closed-form from the synthetic pattern. Leg→column mapping:
    # resize: v1=width v2=height v3=target_w v4=target_h v5=px_sum;
    # frame:  v1=frame_idx, v2-v5 NULL;
    # dhash:  v1=56-bit perceptual hash over the REAL decoded pixels
    #         (late r7 — 8×8 NN downsample, 7 row comparisons; oracle
    #         restates it closed-form from the synthetic gradient);
    # jresize (r8): the resize mapping over REAL baseline-JPEG decode
    #         (huffman + IDCT + restart intervals), pixel-exact on the
    #         per-block-constant fixture;
    # dpair:  asset_id=id_a, v1=id_b, v2=hamming ≤ 3 (banded-Hamming
    #         self-join, same pigeonhole bound as text SimHash).
    def multimodal_resize_plan(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        png_assets = multimodal.documents_as_png_assets(docs)
        nulls = lambda *cs: [F.lit(None).cast("long").alias(c) for c in cs]  # noqa: E731
        dhash = multimodal.dhash_signatures_cached(png_assets).select(
            "asset_id",
            F.lit("dhash").alias("kind"),
            F.col("dhash").alias("v1"),
            *nulls("v2", "v3", "v4", "v5"),
        )
        dpairs = multimodal.dhash_pairs(png_assets, 3).select(
            F.col("id_a").alias("asset_id"),
            F.lit("dpair").alias("kind"),
            F.col("id_b").alias("v1"),
            F.col("hamming").cast("long").alias("v2"),
            *nulls("v3", "v4", "v5"),
        )
        resize = multimodal.decode_resize_png(
            png_assets, max_side=24
        ).select(
            "asset_id",
            F.lit("resize").alias("kind"),
            F.col("width").cast("long").alias("v1"),
            F.col("height").cast("long").alias("v2"),
            F.col("target_w").cast("long").alias("v3"),
            F.col("target_h").cast("long").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # late r7: the frame leg upgraded from the payload-size fake to
        # REAL parsed AVI containers — v1=frame_idx (every 10th of the
        # avih dwTotalFrames), v2=width, v3=height from the main header
        frames = multimodal.frame_sample_plan_avi(
            multimodal.documents_as_avi_assets(docs)
        ).select(
            "asset_id",
            F.lit("frame").alias("kind"),
            F.col("frame_idx").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            *nulls("v4", "v5"),
        )
        # r8: baseline-JPEG decode under the gate — the SAME real
        # decode+resize stage over per-block-constant JPEG payloads
        # (pixel-exact by construction, restart intervals on odd ids),
        # px_sum restated closed-form by the oracle
        jresize = multimodal.decode_resize_png(
            multimodal.documents_as_jpeg_assets(docs), max_side=24
        ).select(
            "asset_id",
            F.lit("jresize").alias("kind"),
            F.col("width").cast("long").alias("v1"),
            F.col("height").cast("long").alias("v2"),
            F.col("target_w").cast("long").alias("v3"),
            F.col("target_h").cast("long").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r10 gresize leg: REAL GIF decode (LZW inflate + palette
        # expansion; odd ids interlaced) through the same resize stage;
        # identity grayscale palette makes px_sum = 3x the index sum,
        # closed-form in doc_id
        gresize = multimodal.decode_resize_png(
            multimodal.documents_as_gif_assets(docs), max_side=24
        ).select(
            "asset_id",
            F.lit("gresize").alias("kind"),
            F.col("width").cast("long").alias("v1"),
            F.col("height").cast("long").alias("v2"),
            F.col("target_w").cast("long").alias("v3"),
            F.col("target_h").cast("long").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r10 tresize leg: REAL TIFF decode (strips, PackBits on odd
        # ids, both byte orders by doc_id%4) through the same resize
        # stage; the synth_png gradient, so the oracle reuses its form
        tresize = multimodal.decode_resize_png(
            multimodal.documents_as_tiff_assets(docs), max_side=24
        ).select(
            "asset_id",
            F.lit("tresize").alias("kind"),
            F.col("width").cast("long").alias("v1"),
            F.col("height").cast("long").alias("v2"),
            F.col("target_w").cast("long").alias("v3"),
            F.col("target_h").cast("long").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r10 (VERDICT r9 item 5): REAL video frame pixels — MJPEG AVIs
        # with per-block-constant frames decode pixel-exact through the
        # movi walk + full JPEG decoder; v5 = exact decoded-byte sum,
        # restated closed-form in (doc_id, frame) by the oracle
        vframe = multimodal.decode_video_frames(
            multimodal.documents_as_mjpeg_assets(docs), every_n=2
        ).select(
            "asset_id",
            F.lit("vframe").alias("kind"),
            F.col("frame_idx").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            F.col("channels").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r11 ganim leg: ANIMATED GIF as a video source — the full
        # composition state machine (transparency + disposal 1/2) runs
        # under the gate via the same decode_video_frames surface as
        # MJPEG; the fixture's composed pixel sums are closed-form
        ganim = multimodal.decode_video_frames(
            multimodal.documents_as_gifanim_assets(docs), every_n=1
        ).select(
            "asset_id",
            F.lit("ganim").alias("kind"),
            F.col("frame_idx").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            F.col("channels").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r13 panim leg: APNG as the THIRD frame-sequence container —
        # acTL/fcTL/fdAT walk, frame decode through the shared PNG
        # path, SOURCE/OVER blending (alpha flips by doc_id%2) and all
        # three dispose ops (cycling by (doc_id//3)%3) — under the
        # same decode_video_frames surface; solid-color frames make
        # the composed RGBA px sums closed forms (synth_apng_anim)
        panim = multimodal.decode_video_frames(
            multimodal.documents_as_apng_assets(docs), every_n=1
        ).select(
            "asset_id",
            F.lit("panim").alias("kind"),
            F.col("frame_idx").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            F.col("channels").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r13 ico leg: favicon container — ICONDIR walk, a masked BMP
        # entry (AND-mask transparency through the complete BMP
        # decoder) and a PNG entry per icon; solid colors + the
        # constant-count diagonal mask make both entries' RGBA px
        # sums closed forms (synth_ico). v1=entry_idx v5=px_sum
        ico = multimodal.decode_ico_features(
            multimodal.documents_as_ico_assets(docs)
        ).select(
            "asset_id",
            F.lit("ico").alias("kind"),
            F.col("entry_idx").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            F.col("channels").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r11 exif leg: the upright-image stage — APP1/EXIF orientation
        # read (embedded-TIFF IFD walk, both byte orders) + the 8
        # standard transforms applied; dims swap for 5-8, px_sum is
        # rotation-invariant. v1=orientation v2=w v3=h v5=px_sum
        exif = multimodal.decode_oriented_features(
            multimodal.documents_as_exif_assets(docs)
        ).select(
            "asset_id",
            F.lit("exif").alias("kind"),
            F.col("orientation").alias("v1"),
            F.col("width").alias("v2"),
            F.col("height").alias("v3"),
            F.lit(None).cast("long").alias("v4"),
            F.col("px_sum").alias("v5"),
        )
        # r13 gmeta leg: the FULL EXIF field set — DateTimeOriginal
        # (Exif sub-IFD) and GPS rationals (GPS IFD, sign-carrying
        # exact integers) from the SAME fixture as the exif leg; every
        # value a doc_id closed form. v1=lat_num v2=lon_num v3=lat_den
        # v4=orientation v5=the timestamp's 14-digit numeral
        gmeta = multimodal.decode_exif_meta(
            multimodal.documents_as_exif_assets(docs)
        ).select(
            "asset_id",
            F.lit("gmeta").alias("kind"),
            F.col("lat_num").alias("v1"),
            F.col("lon_num").alias("v2"),
            F.col("lat_den").alias("v3"),
            F.col("orientation").alias("v4"),
            F.col("dtnum").alias("v5"),
        )
        # r13 arcx leg: ARCHIVE ingestion — tar / zip-deflate /
        # zip-stored cycle by (id//3)%3, members route by magic and
        # the PNG members decode through image_decode (archive ×
        # image composition); every summary a doc_id closed form
        # (archive.synth_archive). v1=n_members v2=n_images v3=img_px
        # v4=text_len
        from timeseries_db_spark.operators import archive as _archive

        arcx = _archive.decode_archive_features(
            _archive.documents_as_archive_assets(docs)
        ).select(
            "asset_id",
            F.lit("arcx").alias("kind"),
            F.col("n_members").alias("v1"),
            F.col("n_images").alias("v2"),
            F.col("img_px").alias("v3"),
            F.col("text_len").alias("v4"),
            F.lit(None).cast("long").alias("v5"),
        )
        # r14 arcq leg: DIRTY archives under the gate (VERDICT item 1)
        # — defect kind cycles by (id//3)%6 (tar bad checksum with r15
        # mid-archive resync / bad member CRC / junk container /
        # ZipCrypto zip with a garbage PNG / WinZip-AES tampered HMAC
        # / r15 TRUNCATED zip recovered via the local-header walk), so
        # per-member quarantine, tar resync, container-level
        # isolation, both decryption paths AND truncation recovery are
        # all value-checked: good siblings keep contributing, every
        # error is counted.
        # v1..v4 as arcx, v5=n_errors (1 per archive by construction)
        arcq = _archive.decode_archive_features(
            _archive.documents_as_dirty_archive_assets(docs),
            password=_archive.DIRTY_ARCHIVE_PASSWORD,
        ).select(
            "asset_id",
            F.lit("arcq").alias("kind"),
            F.col("n_members").alias("v1"),
            F.col("n_images").alias("v2"),
            F.col("img_px").alias("v3"),
            F.col("text_len").alias("v4"),
            F.col("n_errors").alias("v5"),
        )
        # r15 imgq leg (VERDICT item 1): the r14 opt-in IMAGE decode
        # quarantine under the gate — even ids are real 4×4 PNGs whose
        # dimensions publish, odd ids are junk behind the PNG magic
        # whose decode quarantines (one flagged row each, siblings
        # unaffected). v1=width v2=height v3=n_bytes of the JUNK (its
        # closed form; NULL for clean — a real PNG's byte length is
        # zlib-dependent) v4=quarantined flag
        imgq = multimodal.decode_image_features(
            multimodal.documents_as_dirty_image_assets(docs),
            fake=False,
            quarantine=True,
        ).select(
            "asset_id",
            F.lit("imgq").alias("kind"),
            F.col("width").cast("long").alias("v1"),
            F.col("height").cast("long").alias("v2"),
            F.expr(
                "CASE WHEN err IS NULL THEN NULL ELSE n_bytes END"
            ).cast("long").alias("v3"),
            F.col("err").isNotNull().cast("long").alias("v4"),
            F.lit(None).cast("long").alias("v5"),
        )
        # r13 wmeta leg: WebM/Matroska — the remaining web container
        # family — EBML VINT walk to Info + Tracks metadata; every
        # field a doc_id closed form (synth_mkv)
        wmeta = multimodal.decode_mkv_meta(
            multimodal.documents_as_mkv_assets(docs)
        ).select(
            "asset_id",
            F.lit("wmeta").alias("kind"),
            F.col("width").alias("v1"),
            F.col("height").alias("v2"),
            F.col("duration_ms").alias("v3"),
            F.col("channels").alias("v4"),
            F.col("sample_rate").alias("v5"),
        )
        return (
            resize.unionByName(frames)
            .unionByName(dhash)
            .unionByName(dpairs)
            .unionByName(jresize)
            .unionByName(gresize)
            .unionByName(tresize)
            .unionByName(vframe)
            .unionByName(ganim)
            .unionByName(panim)
            .unionByName(ico)
            .unionByName(exif)
            .unionByName(gmeta)
            .unionByName(wmeta)
            .unionByName(arcx)
            .unionByName(arcq)
            .unionByName(imgq)
        )

    q["multimodal_resize_plan"] = multimodal_resize_plan
    o["multimodal_resize_plan"] = """
        WITH d AS (
            SELECT doc_id,
                   (16 + (doc_id * 7) % 48)::INT AS w,
                   (16 + (doc_id * 11) % 48)::INT AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        t AS (
            SELECT doc_id, w, h,
                   (CASE WHEN greatest(w, h) > 24
                         THEN (w::BIGINT * 24) // greatest(w, h)
                         ELSE w END)::INT AS tw,
                   (CASE WHEN greatest(w, h) > 24
                         THEN (h::BIGINT * 24) // greatest(w, h)
                         ELSE h END)::INT AS th
            FROM d
        ),
        nums AS (SELECT unnest(range(64)) AS n),
        px AS (
            SELECT t.doc_id,
                   SUM((((j.n * t.w) // t.tw) * 7
                        + ((i.n * t.h) // t.th) * 13
                        + t.doc_id) % 256)::BIGINT AS px_sum
            FROM t
            JOIN nums i ON i.n < t.th
            JOIN nums j ON j.n < t.tw
            GROUP BY t.doc_id
        )
        SELECT t.doc_id AS asset_id, 'resize' AS kind,
               t.w::BIGINT AS v1, t.h::BIGINT AS v2,
               t.tw::BIGINT AS v3, t.th::BIGINT AS v4, px.px_sum AS v5
        FROM t JOIN px ON px.doc_id = t.doc_id
        UNION ALL
        -- frame leg restated closed-form from the synthetic AVI header:
        -- dwTotalFrames = 30 + (id*7)%120, dwWidth = 320 + (id%4)*80,
        -- dwHeight = 240 + (id%3)*60, sampled every 10th frame
        SELECT doc_id AS asset_id, 'frame' AS kind,
               unnest(range(0, (30 + (doc_id * 7) % 120)::INT, 10))::BIGINT AS v1,
               (320 + (doc_id % 4) * 80)::BIGINT AS v2,
               (240 + (doc_id % 3) * 60)::BIGINT AS v3,
               NULL::BIGINT AS v4, NULL::BIGINT AS v5
        FROM documents WHERE doc_id % 3 = 2
        UNION ALL
        -- dhash leg: the 56-bit difference hash restated closed-form.
        -- The synthetic pixel at (x, y) is (x*7 + y*13 + id) % 256 and
        -- the 8x8 NN downsample takes x = j*w//8, y = i*h//8, so bit
        -- (i*7 + j) compares columns j and j+1 of the downsample.
        SELECT asset_id, 'dhash' AS kind, dhash AS v1,
               NULL::BIGINT AS v2, NULL::BIGINT AS v3,
               NULL::BIGINT AS v4, NULL::BIGINT AS v5
        FROM (
            WITH dh_d AS (
                SELECT doc_id,
                       (16 + (doc_id * 7) % 48)::BIGINT AS w,
                       (16 + (doc_id * 11) % 48)::BIGINT AS h
                FROM documents WHERE doc_id % 3 = 0
            ),
            n8 AS (SELECT unnest(range(8)) AS n)
            SELECT d.doc_id AS asset_id,
                   sum(CASE WHEN (((j.n * d.w) // 8) * 7
                                  + ((i.n * d.h) // 8) * 13 + d.doc_id) % 256
                              > ((((j.n + 1) * d.w) // 8) * 7
                                  + ((i.n * d.h) // 8) * 13 + d.doc_id) % 256
                            THEN (1::BIGINT << (i.n * 7 + j.n)::INT)
                            ELSE 0 END)::BIGINT AS dhash
            FROM dh_d d JOIN n8 i ON i.n < 8 JOIN n8 j ON j.n < 7
            GROUP BY d.doc_id
        )
        UNION ALL
        -- dpair leg: exact O(n^2) Hamming join over the closed-form
        -- hashes (the Spark side uses the banded join; at Hamming <= 3
        -- with 4 bands both find exactly the same pairs)
        SELECT id_a AS asset_id, 'dpair' AS kind, id_b AS v1, ham AS v2,
               NULL::BIGINT AS v3, NULL::BIGINT AS v4, NULL::BIGINT AS v5
        FROM (
            WITH dh_d AS (
                SELECT doc_id,
                       (16 + (doc_id * 7) % 48)::BIGINT AS w,
                       (16 + (doc_id * 11) % 48)::BIGINT AS h
                FROM documents WHERE doc_id % 3 = 0
            ),
            n8 AS (SELECT unnest(range(8)) AS n),
            dh AS (
                SELECT d.doc_id,
                       sum(CASE WHEN (((j.n * d.w) // 8) * 7
                                      + ((i.n * d.h) // 8) * 13 + d.doc_id) % 256
                                  > ((((j.n + 1) * d.w) // 8) * 7
                                      + ((i.n * d.h) // 8) * 13 + d.doc_id) % 256
                                THEN (1::BIGINT << (i.n * 7 + j.n)::INT)
                                ELSE 0 END)::BIGINT AS dhash
                FROM dh_d d JOIN n8 i ON i.n < 8 JOIN n8 j ON j.n < 7
                GROUP BY d.doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.dhash, b.dhash))::BIGINT AS ham
            FROM dh a JOIN dh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
        )
        UNION ALL
        -- jresize leg (r8): real baseline-JPEG decode restated
        -- closed-form — per-block-constant pixels decode EXACTLY
        -- (DC-only blocks, all-ones quant), so the resized-pixel sum is
        -- pure integer arithmetic: source pixel (x, y) of doc d holds
        -- (d + (y//8)*31 + (x//8)*17) % 256, NN resample takes
        -- x = j*w//tw, y = i*h//th
        SELECT jt.doc_id AS asset_id, 'jresize' AS kind,
               jt.w AS v1, jt.h AS v2, jt.tw AS v3, jt.th AS v4,
               jpx.px_sum AS v5
        FROM (
            SELECT doc_id, w, h,
                   CASE WHEN greatest(w, h) > 24
                        THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                   CASE WHEN greatest(w, h) > 24
                        THEN (h * 24) // greatest(w, h) ELSE h END AS th
            FROM (
                SELECT doc_id,
                       ((2 + doc_id % 3) * 8)::BIGINT AS w,
                       ((2 + (doc_id // 3) % 3) * 8)::BIGINT AS h
                FROM documents WHERE doc_id % 3 = 0
            )
        ) jt
        JOIN (
            SELECT t.doc_id,
                   SUM((t.doc_id + (((i.n * t.h) // t.th) // 8) * 31
                        + (((j.n * t.w) // t.tw) // 8) * 17) % 256)::BIGINT
                       AS px_sum
            FROM (
                SELECT doc_id, w, h,
                       CASE WHEN greatest(w, h) > 24
                            THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                       CASE WHEN greatest(w, h) > 24
                            THEN (h * 24) // greatest(w, h) ELSE h END AS th
                FROM (
                    SELECT doc_id,
                           ((2 + doc_id % 3) * 8)::BIGINT AS w,
                           ((2 + (doc_id // 3) % 3) * 8)::BIGINT AS h
                    FROM documents WHERE doc_id % 3 = 0
                )
            ) t
            JOIN (SELECT unnest(range(64)) AS n) i ON i.n < t.th
            JOIN (SELECT unnest(range(64)) AS n) j ON j.n < t.tw
            GROUP BY t.doc_id
        ) jpx ON jpx.doc_id = jt.doc_id
        UNION ALL
        -- gresize leg (r10): REAL GIF decode restated closed-form —
        -- identity grayscale palette, so each RGB pixel sums to 3x the
        -- index (x*7 + y*13 + d) % 256; same NN-resize mapping
        SELECT gt.doc_id AS asset_id, 'gresize' AS kind,
               gt.w AS v1, gt.h AS v2, gt.tw AS v3, gt.th AS v4,
               gpx.px_sum AS v5
        FROM (
            SELECT doc_id, w, h,
                   CASE WHEN greatest(w, h) > 24
                        THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                   CASE WHEN greatest(w, h) > 24
                        THEN (h * 24) // greatest(w, h) ELSE h END AS th
            FROM (
                SELECT doc_id,
                       (16 + (doc_id * 5) % 40)::BIGINT AS w,
                       (16 + (doc_id * 9) % 40)::BIGINT AS h
                FROM documents WHERE doc_id % 3 = 0
            )
        ) gt
        JOIN (
            SELECT t.doc_id,
                   3 * SUM((((j.n * t.w) // t.tw) * 7
                            + ((i.n * t.h) // t.th) * 13
                            + t.doc_id) % 256)::BIGINT AS px_sum
            FROM (
                SELECT doc_id, w, h,
                       CASE WHEN greatest(w, h) > 24
                            THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                       CASE WHEN greatest(w, h) > 24
                            THEN (h * 24) // greatest(w, h) ELSE h END AS th
                FROM (
                    SELECT doc_id,
                           (16 + (doc_id * 5) % 40)::BIGINT AS w,
                           (16 + (doc_id * 9) % 40)::BIGINT AS h
                    FROM documents WHERE doc_id % 3 = 0
                )
            ) t
            JOIN (SELECT unnest(range(56)) AS n) i ON i.n < t.th
            JOIN (SELECT unnest(range(56)) AS n) j ON j.n < t.tw
            GROUP BY t.doc_id
        ) gpx ON gpx.doc_id = gt.doc_id
        UNION ALL
        -- tresize leg (r10): REAL TIFF decode restated closed-form —
        -- the synth_png gradient over TIFF dims, 1-channel
        SELECT tt.doc_id AS asset_id, 'tresize' AS kind,
               tt.w AS v1, tt.h AS v2, tt.tw AS v3, tt.th AS v4,
               tpx.px_sum AS v5
        FROM (
            SELECT doc_id, w, h,
                   CASE WHEN greatest(w, h) > 24
                        THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                   CASE WHEN greatest(w, h) > 24
                        THEN (h * 24) // greatest(w, h) ELSE h END AS th
            FROM (
                SELECT doc_id,
                       (16 + (doc_id * 3) % 40)::BIGINT AS w,
                       (16 + (doc_id * 7) % 40)::BIGINT AS h
                FROM documents WHERE doc_id % 3 = 0
            )
        ) tt
        JOIN (
            SELECT t.doc_id,
                   SUM((((j.n * t.w) // t.tw) * 7
                        + ((i.n * t.h) // t.th) * 13
                        + t.doc_id) % 256)::BIGINT AS px_sum
            FROM (
                SELECT doc_id, w, h,
                       CASE WHEN greatest(w, h) > 24
                            THEN (w * 24) // greatest(w, h) ELSE w END AS tw,
                       CASE WHEN greatest(w, h) > 24
                            THEN (h * 24) // greatest(w, h) ELSE h END AS th
                FROM (
                    SELECT doc_id,
                           (16 + (doc_id * 3) % 40)::BIGINT AS w,
                           (16 + (doc_id * 7) % 40)::BIGINT AS h
                    FROM documents WHERE doc_id % 3 = 0
                )
            ) t
            JOIN (SELECT unnest(range(56)) AS n) i ON i.n < t.th
            JOIN (SELECT unnest(range(56)) AS n) j ON j.n < t.tw
            GROUP BY t.doc_id
        ) tpx ON tpx.doc_id = tt.doc_id
        UNION ALL
        -- vframe leg (r10): REAL MJPEG frame pixels restated
        -- closed-form — frame f of video doc d has per-block-constant
        -- pixels (d + f*53 + r*31 + c*17) % 256 over a (bh x bw) block
        -- grid (bw = 2 + d%3, bh = 2 + (d//3)%3), 3 + d%3 frames,
        -- sampled every 2nd; each block contributes 64x its value
        SELECT v.doc_id AS asset_id, 'vframe' AS kind,
               fr.f AS v1, v.bw * 8 AS v2, v.bh * 8 AS v3,
               1::BIGINT AS v4,
               (SELECT 64 * SUM((v.doc_id + fr.f * 53
                                 + r.n * 31 + c.n * 17) % 256)
                FROM (SELECT unnest(range(5)) AS n) r,
                     (SELECT unnest(range(5)) AS n) c
                WHERE r.n < v.bh AND c.n < v.bw)::BIGINT AS v5
        FROM (
            SELECT doc_id,
                   (2 + doc_id % 3)::BIGINT AS bw,
                   (2 + (doc_id // 3) % 3)::BIGINT AS bh,
                   (3 + doc_id % 3)::BIGINT AS nf
            FROM documents WHERE doc_id % 3 = 2
        ) v
        JOIN LATERAL (
            SELECT unnest(range(0, v.nf, 2))::BIGINT AS f
        ) fr ON true
        UNION ALL
        -- ganim leg (r11): animated-GIF composition restated
        -- closed-form. Grayscale palette (k -> (k,k,k)) makes px_sum
        -- 3x the composed index sum; the three frames are:
        -- f0 = (d + 3x + 5y) % 64 everywhere; f1 = f0 where
        -- (x+y+d)%3=0 (transparent shows frame 0) else
        -- (2d + x + 2y) % 63; f2 = background 1 outside the inset
        -- rect, (d + (x-2) + (y-2)) % 64 inside (frame 1 disposed to
        -- background before frame 2 draws)
        SELECT s.doc_id AS asset_id, 'ganim' AS kind,
               fr.f AS v1, s.sw AS v2, s.sh AS v3, 3::BIGINT AS v4,
               (CASE fr.f WHEN 0 THEN s.s0 WHEN 1 THEN s.s1
                          ELSE s.s2 END)::BIGINT AS v5
        FROM (
            WITH w AS (
                SELECT doc_id,
                       (8 + doc_id % 5)::BIGINT AS sw,
                       (8 + (doc_id // 5) % 5)::BIGINT AS sh
                FROM documents WHERE doc_id % 3 = 2
            ),
            xs AS (SELECT unnest(range(13)) AS x),
            ys AS (SELECT unnest(range(13)) AS y),
            px AS (
                SELECT w.doc_id, w.sw, w.sh,
                       (w.doc_id + 3 * xs.x + 5 * ys.y) % 64 AS p0,
                       CASE WHEN (xs.x + ys.y + w.doc_id) % 3 = 0
                            THEN (w.doc_id + 3 * xs.x + 5 * ys.y) % 64
                            ELSE (2 * w.doc_id + xs.x + 2 * ys.y) % 63
                       END AS p1,
                       CASE WHEN xs.x >= 2 AND xs.x < w.sw - 2
                             AND ys.y >= 2 AND ys.y < w.sh - 2
                            THEN (w.doc_id + (xs.x - 2) + (ys.y - 2)) % 64
                            ELSE 1 END AS p2
                FROM w
                JOIN xs ON xs.x < w.sw
                JOIN ys ON ys.y < w.sh
            )
            SELECT doc_id, sw, sh,
                   3 * sum(p0) AS s0, 3 * sum(p1) AS s1, 3 * sum(p2) AS s2
            FROM px GROUP BY doc_id, sw, sh
        ) s
        JOIN LATERAL (SELECT unnest(range(3))::BIGINT AS f) fr ON true
        UNION ALL
        -- panim leg (r13): APNG composition restated closed-form —
        -- solid RGBA frames: f0 = 64*s0; f1 = (48*s0 if frame-0
        -- dispose NONE else 0) + 16*s1 (dispose cycles (id//3)%3;
        -- BACKGROUND and first-frame PREVIOUS both clear); f2 adds
        -- the 2x2 OVER block only when its alpha is 255 (even ids),
        -- replacing whatever the disposed canvas held at (0,0)
        SELECT p.doc_id AS asset_id, 'panim' AS kind,
               fr.f AS v1, 8::BIGINT AS v2, 8::BIGINT AS v3,
               4::BIGINT AS v4,
               (CASE fr.f
                  WHEN 0 THEN 64 * s0
                  WHEN 1 THEN base1
                  ELSE base1 + CASE WHEN p.doc_id % 2 = 0
                       THEN 4 * s2 - CASE WHEN (p.doc_id // 3) % 3 = 0
                            THEN 4 * s0 ELSE 0 END
                       ELSE 0 END
                END)::BIGINT AS v5
        FROM (
            SELECT doc_id,
                   (doc_id % 256) + ((doc_id * 3) % 256)
                     + ((doc_id * 5) % 256) + 255 AS s0,
                   ((doc_id + 40) % 256) + ((doc_id + 80) % 256)
                     + ((doc_id + 120) % 256) + 255 AS s1,
                   ((doc_id + 7) % 256) + ((doc_id + 14) % 256)
                     + ((doc_id + 21) % 256)
                     + CASE WHEN doc_id % 2 = 0 THEN 255 ELSE 0 END AS s2,
                   CASE WHEN (doc_id // 3) % 3 = 0
                        THEN 48 * ((doc_id % 256) + ((doc_id * 3) % 256)
                             + ((doc_id * 5) % 256) + 255) ELSE 0 END
                     + 16 * (((doc_id + 40) % 256) + ((doc_id + 80) % 256)
                             + ((doc_id + 120) % 256) + 255) AS base1
            FROM documents WHERE doc_id % 3 = 2
        ) p
        JOIN LATERAL (SELECT unnest(range(3))::BIGINT AS f) fr ON true
        UNION ALL
        -- ico leg (r13): favicon closed forms — entry 0 is the 4x4
        -- masked BMP (16*sum(c0) + 12*255: the diagonal AND mask
        -- clears exactly 4 of 16 pixels for ANY doc_id), entry 1 the
        -- 8x8 opaque PNG (64*sum(c1) + 64*255)
        SELECT doc_id AS asset_id, 'ico' AS kind,
               e.k AS v1,
               (CASE e.k WHEN 0 THEN 4 ELSE 8 END)::BIGINT AS v2,
               (CASE e.k WHEN 0 THEN 4 ELSE 8 END)::BIGINT AS v3,
               4::BIGINT AS v4,
               (CASE e.k
                  WHEN 0 THEN 16 * (((doc_id * 3) % 256)
                       + ((doc_id * 5) % 256) + ((doc_id * 7) % 256))
                       + 12 * 255
                  ELSE 64 * (((doc_id + 60) % 256)
                       + ((doc_id + 130) % 256) + ((doc_id + 200) % 256))
                       + 64 * 255
                END)::BIGINT AS v5
        FROM documents
        JOIN LATERAL (SELECT unnest(range(2))::BIGINT AS k) e ON true
        WHERE doc_id % 3 = 0
        UNION ALL
        -- exif leg (r11): orientation 1 + id%8; block (r,c) of the
        -- w=8*(2+id%3) x h=8*(3+(id//3)%3) gray holds
        -- (id + r*29 + c*13) % 256; dims swap for orientations 5-8,
        -- px_sum (64x the block sum) is rotation-invariant
        SELECT e.doc_id AS asset_id, 'exif' AS kind,
               (1 + e.doc_id % 8)::BIGINT AS v1,
               (CASE WHEN 1 + e.doc_id % 8 >= 5 THEN e.h ELSE e.w
                END)::BIGINT AS v2,
               (CASE WHEN 1 + e.doc_id % 8 >= 5 THEN e.w ELSE e.h
                END)::BIGINT AS v3,
               NULL::BIGINT AS v4,
               (SELECT 64 * SUM((e.doc_id + r.n * 29 + c.n * 13) % 256)
                FROM (SELECT unnest(range(5)) AS n) r,
                     (SELECT unnest(range(4)) AS n) c
                WHERE r.n < e.bh AND c.n < e.bw)::BIGINT AS v5
        FROM (
            SELECT doc_id,
                   (2 + doc_id % 3)::BIGINT AS bw,
                   (3 + (doc_id // 3) % 3)::BIGINT AS bh,
                   (8 * (2 + doc_id % 3))::BIGINT AS w,
                   (8 * (3 + (doc_id // 3) % 3))::BIGINT AS h
            FROM documents WHERE doc_id % 3 = 0
        ) e
        UNION ALL
        -- arcx leg (r13): archive summary restated closed-form —
        -- 2 + id%2 members, 1 + id%2 images, pixel sums of the
        -- constant 4x4 PNGs, text 'Doc {id} text'. r15: the TAR
        -- cycle ((id//3)%3 = 0) adds a pax-long-named 'Pax {id}'
        -- text member (+1 member, +its length)
        SELECT doc_id AS asset_id, 'arcx' AS kind,
               (2 + doc_id % 2
                + CASE WHEN (doc_id // 3) % 3 = 0 THEN 1 ELSE 0
                  END)::BIGINT AS v1,
               (1 + doc_id % 2)::BIGINT AS v2,
               (16 * ((3 * doc_id + 11) % 256)
                + (doc_id % 2) * 16 * ((5 * doc_id + 7) % 256))::BIGINT
                 AS v3,
               (length('Doc ' || doc_id || ' text')
                + CASE WHEN (doc_id // 3) % 3 = 0
                       THEN length('Pax ' || doc_id) ELSE 0
                  END)::BIGINT AS v4,
               NULL::BIGINT AS v5
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        -- arcq leg (r14): the dirty-archive quarantine closed forms —
        -- defect kind cycles by (id//3)%6: 0 = tar bad checksum
        -- MID-ARCHIVE (r15: the 512-aligned resync recovers the TWO
        -- trailing text members, so all 3 members survive), 1 = zip
        -- bad member CRC (middle text lost, siblings survive), 2 =
        -- junk container (nothing survives), 3 = ZipCrypto zip whose
        -- PNG is garbage (text survives the decryption, the image
        -- decode quarantines), 4 = WinZip AES-256 zip with one
        -- HMAC-tampered member (good members decrypt+verify, the
        -- tampered one fails authentication), 5 (r15) = TRUNCATED zip
        -- (cut at the central directory — the local-header recovery
        -- walk keeps all three members). Exactly one error each.
        SELECT doc_id AS asset_id, 'arcq' AS kind,
               (CASE (doc_id // 3) % 6
                     WHEN 2 THEN 0 WHEN 0 THEN 3 WHEN 5 THEN 3 ELSE 2
                END)::BIGINT AS v1,
               (CASE WHEN (doc_id // 3) % 6 IN (0, 1, 4, 5) THEN 1
                     ELSE 0 END)::BIGINT AS v2,
               (CASE WHEN (doc_id // 3) % 6 IN (0, 1, 4, 5)
                     THEN 16 * ((3 * doc_id + 11) % 256) ELSE 0
                END)::BIGINT AS v3,
               (CASE (doc_id // 3) % 6
                     WHEN 0 THEN length('Doc ' || doc_id || ' text')
                                 + length('Tail ' || doc_id)
                     WHEN 1 THEN length('Extra ' || doc_id)
                     WHEN 2 THEN 0
                     WHEN 5 THEN length('Doc ' || doc_id || ' text')
                                 + length('End ' || doc_id)
                     ELSE length('Doc ' || doc_id || ' text')
                END)::BIGINT AS v4,
               1::BIGINT AS v5
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- wmeta leg (r13): WebM/Matroska EBML metadata restated
        SELECT doc_id AS asset_id, 'wmeta' AS kind,
               (320 + (doc_id % 5) * 64)::BIGINT AS v1,
               (180 + (doc_id % 4) * 90)::BIGINT AS v2,
               (1000 + doc_id * 10)::BIGINT AS v3,
               (1 + doc_id % 2)::BIGINT AS v4,
               (8000 + (doc_id % 5) * 4000)::BIGINT AS v5
        FROM documents WHERE doc_id % 3 = 2
        UNION ALL
        -- gmeta leg (r13): the full EXIF field set restated — GPS as
        -- sign-carrying exact rationals over den 360000 (d*3600*100 +
        -- m*60*100 + snum), timestamp as its 14-digit numeral
        SELECT doc_id AS asset_id, 'gmeta' AS kind,
               (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END
                * ((doc_id % 90) * 360000 + ((doc_id * 7) % 60) * 6000
                   + (doc_id * 13) % 6000))::BIGINT AS v1,
               (CASE WHEN (doc_id // 3) % 2 = 1 THEN -1 ELSE 1 END
                * ((doc_id % 180) * 360000 + ((doc_id * 11) % 60) * 6000
                   + (doc_id * 17) % 6000))::BIGINT AS v2,
               360000::BIGINT AS v3,
               (1 + doc_id % 8)::BIGINT AS v4,
               ((2000 + doc_id % 30) * 10000000000
                + (1 + doc_id % 12) * 100000000
                + (1 + doc_id % 28) * 1000000
                + (doc_id % 24) * 10000
                + ((doc_id * 3) % 60) * 100
                + (doc_id * 5) % 60)::BIGINT AS v5
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        -- imgq leg (r15): the dirty-image quarantine closed forms —
        -- even ids decode (4x4), odd ids quarantine (junk of
        -- 9 + id%7 bytes behind the PNG magic)
        SELECT doc_id AS asset_id, 'imgq' AS kind,
               (CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 0 END)::BIGINT AS v1,
               (CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 0 END)::BIGINT AS v2,
               (CASE WHEN doc_id % 2 = 0 THEN NULL
                     ELSE 9 + doc_id % 7 END)::BIGINT AS v3,
               (doc_id % 2)::BIGINT AS v4,
               NULL::BIGINT AS v5
        FROM documents
    """

    # late r7: the chunk plan gains a REAL-PCM union leg — synthesized
    # 16-bit mono WAVs are actually parsed and their samples decoded;
    # every pcm feature is an exact integer the oracle restates
    # closed-form from the synthetic sawtooth. Leg→column mapping:
    # chunk: v1=chunk_start_ms v2=chunk_len_ms v3,v4 NULL;
    # pcm:   v1=n_samples v2=sum_abs v3=sum_sq v4=zero_crossings.
    def multimodal_audio_chunks(s: SparkSession, d: str) -> DataFrame:
        docs = _docs(s, d)
        nulls = lambda *cs: [F.lit(None).cast("long").alias(c) for c in cs]  # noqa: E731
        chunks = multimodal.audio_chunk_plan(
            multimodal.documents_as_assets(docs), chunk_ms=100
        ).select(
            "asset_id",
            F.lit("chunk").alias("kind"),
            F.col("chunk_start_ms").alias("v1"),
            F.col("chunk_len_ms").alias("v2"),
            *nulls("v3", "v4"),
        )
        pcm = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_wav_assets(docs)
        ).select(
            "asset_id",
            F.lit("pcm").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r10 g711 leg: COMPRESSED audio under the gate — the fixture's
        # data bytes are a closed-form µ-law code stream, so the REAL
        # G.711 expand runs and the oracle restates every decoded
        # sample as a spec-table lookup
        g711 = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_g711_assets(docs)
        ).select(
            "asset_id",
            F.lit("g711").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r13 wfl leg: IEEE-float WAV (fmt tag 3, 32-bit even ids /
        # 64-bit odd) — the same sawtooth as the pcm leg stored as
        # x/32767 floats; rint(x*32767) recovers every sample exactly,
        # so the pcm closed form doubles as this leg's oracle
        wfl = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_wfloat_assets(docs)
        ).select(
            "asset_id",
            F.lit("wfl").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r11 msadpcm leg: the OTHER wild ADPCM (fmt 0x02) under the
        # gate — the fixture's code stream keeps delta at the 16 floor
        # (every code's adaptation factor < 1), so the REAL stateful
        # decode collapses to a prefix sum the oracle restates with a
        # window function
        msadpcm = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_msadpcm_assets(docs)
        ).select(
            "asset_id",
            F.lit("msadpcm").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r11 aiff leg: the big-endian PCM container through the SAME
        # feature surface (aiff_pcm dispatch inside
        # decode_audio_pcm_features) — its own sawtooth closed form
        aiff = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_aiff_assets(docs)
        ).select(
            "asset_id",
            F.lit("aiff").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r12 fpcm leg: FLAC with REAL coded audio — the fixture runs
        # the repo's own fixed-predictor encoder over a sawtooth, so
        # the REAL frame-walk decode (warmup + Rice residual restore,
        # CRC-8/16 verified, several frames per asset at blocksize 256)
        # feeds the same feature surface; its own closed form
        fpcm = multimodal.decode_audio_pcm_features(
            multimodal.documents_as_flacpcm_assets(docs)
        ).select(
            "asset_id",
            F.lit("fpcm").alias("kind"),
            F.col("n_samples").alias("v1"),
            F.col("sum_abs").alias("v2"),
            F.col("sum_sq").alias("v3"),
            F.col("zero_crossings").alias("v4"),
        )
        # r11 fmeta/mmeta legs: FLAC STREAMINFO and MP3 frame-header
        # metadata through the audio_meta dispatch — hand-packed
        # closed-form fixtures; v1=sample_rate v2=channels
        # v3=bits(flac)/bitrate_kbps(mp3) v4=duration_ms
        def meta_leg(which: str, kind: str) -> DataFrame:
            return multimodal.decode_audio_meta(
                multimodal.documents_as_meta_audio_assets(docs, which)
            ).select(
                "asset_id",
                F.lit(kind).alias("kind"),
                F.col("sample_rate").alias("v1"),
                F.col("channels").alias("v2"),
                F.col("bits").alias("v3"),
                F.col("duration_ms").alias("v4"),
            )

        def tag_leg(which: str, kind: str) -> DataFrame:
            return multimodal.decode_audio_tags(
                multimodal.documents_as_meta_audio_assets(docs, which)
            ).select(
                "asset_id",
                F.lit(kind).alias("kind"),
                F.col("n_comments").alias("v1"),
                F.expr("length(vendor)").cast("long").alias("v2"),
                F.expr(
                    "cast(regexp_extract(title, '([0-9]+)$', 1) as long)"
                ).alias("v3"),
                F.col("tags_len").alias("v4"),
            )

        # r13 late fpic/mpic legs: embedded COVER ART — the FLAC
        # PICTURE block and the ID3v2 APIC frame each carry a 4×4
        # closed-form PNG that decode_cover_art routes through the
        # repo's own PNG decoder (audio container × image codec, one
        # kernel). v1=w v2=h v3=px_sum v4=mime length
        def pic_leg(which: str, kind: str) -> DataFrame:
            return multimodal.decode_cover_art(
                multimodal.documents_as_meta_audio_assets(docs, which)
            ).select(
                "asset_id",
                F.lit(kind).alias("kind"),
                F.col("width").alias("v1"),
                F.col("height").alias("v2"),
                F.col("px_sum").alias("v3"),
                F.expr("length(mime)").cast("long").alias("v4"),
            )

        return (
            chunks.unionByName(pcm)
            .unionByName(wfl)
            .unionByName(g711)
            .unionByName(msadpcm)
            .unionByName(pic_leg("flac", "fpic"))
            .unionByName(pic_leg("mp3", "mpic"))
            .unionByName(aiff)
            .unionByName(fpcm)
            .unionByName(meta_leg("flac", "fmeta"))
            .unionByName(meta_leg("mp3", "mmeta"))
            # r12 ometa leg: Ogg/Opus page walk (CRC-verified) +
            # OpusHead through the same audio_meta dispatch;
            # v3 = pre_skip (the bits slot, documented convention)
            .unionByName(meta_leg("opus", "ometa"))
            # r13 otag/ftag/mtag legs (VERDICT item 6 + the tag triad):
            # audio tag extraction across all three real-world tag
            # surfaces — OpusTags (RFC 7845 §5.2), FLAC VORBIS_COMMENT
            # (same body layout, different container walk), MP3 ID3v2
            # text frames (synchsafe sizes, latin-1/utf-16/utf-8
            # encodings cycled by the fixture) — v1=n_comments
            # (2 + id%2), v2=vendor length (0 for ID3: no vendor),
            # v3=the id parsed back out of the TITLE/TIT2 value (pins
            # tag CONTENT roundtrip, not just counts), v4=summed
            # comment length
            .unionByName(tag_leg("opus", "otag"))
            .unionByName(tag_leg("flac", "ftag"))
            .unionByName(tag_leg("mp3", "mtag"))
            # r13 late vmeta/vtag legs: Ogg VORBIS joins the Ogg
            # surface — \x01vorbis ident header (native-rate granule
            # duration) + \x03vorbis comment header through the SAME
            # dispatches; the tag closed form is shared with otag/ftag
            .unionByName(meta_leg("vorbis", "vmeta"))
            .unionByName(tag_leg("vorbis", "vtag"))
            # r12 4meta leg: M4A (audio-only ISO-BMFF) — mvhd timing +
            # the soun track's mp4a AudioSampleEntry
            .unionByName(meta_leg("m4a", "4meta"))
        )

    q["multimodal_audio_chunks"] = multimodal_audio_chunks
    o["multimodal_audio_chunks"] = """
        WITH a AS (
            SELECT doc_id AS asset_id, octet_length(text::BLOB)::BIGINT AS dur_ms
            FROM documents WHERE doc_id % 3 = 1
        )
        SELECT asset_id, 'chunk' AS kind,
               unnest(range(0, dur_ms, 100))::BIGINT AS v1,
               least(100, dur_ms - unnest(range(0, dur_ms, 100)))::BIGINT AS v2,
               NULL::BIGINT AS v3, NULL::BIGINT AS v4
        FROM a
        UNION ALL
        -- pcm leg restated closed-form from the synthetic sawtooth:
        -- sample k of asset id is ((k*7 + id*13) % 2048) - 1024
        SELECT asset_id, 'pcm' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id, (400 + (doc_id * 13) % 600)::BIGINT AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(1000)) AS k),
            smp AS (
                SELECT w.doc_id, ks.k,
                       ((ks.k * 7 + w.doc_id * 13) % 2048) - 1024 AS v
                FROM w JOIN ks ON ks.k < w.n
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY k) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- wfl leg (r13): IEEE-float WAV of the SAME sawtooth — the
        -- rint(x*32767) mapping is exact, one shared closed form
        SELECT asset_id, 'wfl' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id, (400 + (doc_id * 13) % 600)::BIGINT AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(1000)) AS k),
            smp AS (
                SELECT w.doc_id, ks.k,
                       ((ks.k * 7 + w.doc_id * 13) % 2048) - 1024 AS v
                FROM w JOIN ks ON ks.k < w.n
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY k) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- g711 leg (r10): compressed mu-law audio restated closed-form
        -- — code k of asset id is (k*7 + id*11) % 256, decoded sample =
        -- the ITU expand table (spec constants) at that code
        SELECT asset_id, 'g711' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id, (300 + (doc_id * 7) % 400)::BIGINT AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(700)) AS k),
            smp AS (
                SELECT w.doc_id, ks.k, g711.lin AS v
                FROM w JOIN ks ON ks.k < w.n
                JOIN {MULAW_TABLE} ON g711.code = (ks.k * 7 + w.doc_id * 11) % 256
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY k) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- msadpcm leg (r11): MS ADPCM (fmt 0x02) restated closed-form.
        -- The fixture pins predictor 0 + delta at the 16 floor, so
        -- sample j>=2 of asset id is s1 + 16 * prefix_sum of the code
        -- stream c_i = ((i*3 + id) % 5) - 2; samples 0/1 are the
        -- verbatim block-header pair (s2, s1).
        SELECT asset_id, 'msadpcm' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id,
                       (300 + 2 * ((doc_id * 9) % 150))::BIGINT AS n,
                       ((doc_id * 13) % 500)::BIGINT AS s1,
                       ((doc_id * 7) % 300 - 150)::BIGINT AS s2
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(598)) AS i),
            codes AS (
                SELECT w.doc_id, ks.i + 2 AS j,
                       sum(((ks.i * 3 + w.doc_id) % 5) - 2) OVER (
                           PARTITION BY w.doc_id ORDER BY ks.i) AS ps
                FROM w JOIN ks ON ks.i < w.n - 2
            ),
            smp AS (
                SELECT doc_id, 0 AS j, s2 AS v FROM w
                UNION ALL
                SELECT doc_id, 1 AS j, s1 AS v FROM w
                UNION ALL
                SELECT c.doc_id, c.j, w.s1 + 16 * c.ps AS v
                FROM codes c JOIN w ON w.doc_id = c.doc_id
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY j) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- aiff leg (r11): big-endian container, same feature surface;
        -- sample k of asset id is ((k*5 + id*17) % 2048) - 1024
        SELECT asset_id, 'aiff' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id, (350 + (doc_id * 11) % 500)::BIGINT AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(850)) AS k),
            smp AS (
                SELECT w.doc_id, ks.k,
                       ((ks.k * 5 + w.doc_id * 17) % 2048) - 1024 AS v
                FROM w JOIN ks ON ks.k < w.n
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY k) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- fpcm leg (r12): FLAC fixed-predictor decode — the fixture
        -- encodes sample k = ((k*3 + id*19) % 2048) - 1024 with the
        -- repo's own spec encoder, so the REAL Rice/warmup/CRC decode
        -- must reproduce exactly these samples
        SELECT asset_id, 'fpcm' AS kind, n_samples AS v1,
               sum_abs AS v2, sum_sq AS v3, zero_crossings AS v4
        FROM (
            WITH w AS (
                SELECT doc_id, (300 + (doc_id * 7) % 500)::BIGINT AS n
                FROM documents WHERE doc_id % 3 = 1
            ),
            ks AS (SELECT unnest(range(800)) AS k),
            smp AS (
                SELECT w.doc_id, ks.k,
                       ((ks.k * 3 + w.doc_id * 19) % 2048) - 1024 AS v
                FROM w JOIN ks ON ks.k < w.n
            ),
            flg AS (
                SELECT doc_id, v,
                       CASE WHEN (v < 0) <> (lag(v) OVER (
                                PARTITION BY doc_id ORDER BY k) < 0)
                            THEN 1 ELSE 0 END AS zf
                FROM smp
            )
            SELECT doc_id AS asset_id,
                   count(*)::BIGINT AS n_samples,
                   sum(abs(v))::BIGINT AS sum_abs,
                   sum(v * v)::BIGINT AS sum_sq,
                   coalesce(sum(zf), 0)::BIGINT AS zero_crossings
            FROM flg GROUP BY doc_id
        )
        UNION ALL
        -- fmeta leg (r11): FLAC STREAMINFO restated closed-form
        SELECT doc_id AS asset_id, 'fmeta' AS kind,
               (8000 + (doc_id % 5) * 1000)::BIGINT AS v1,
               (1 + doc_id % 2)::BIGINT AS v2,
               16::BIGINT AS v3,
               ((1000 + doc_id * 10) * 1000
                // (8000 + (doc_id % 5) * 1000))::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- ometa leg (r12): Ogg/Opus restated closed-form (duration =
        -- 48kHz granule minus pre-skip; v3 = pre_skip)
        SELECT doc_id AS asset_id, 'ometa' AS kind,
               (8000 + (doc_id % 5) * 4000)::BIGINT AS v1,
               (1 + doc_id % 2)::BIGINT AS v2,
               (312 + doc_id % 100)::BIGINT AS v3,
               ((4800 + doc_id * 10) * 1000 // 48000)::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- otag/ftag legs (r13): OpusTags + FLAC VORBIS_COMMENT restated
        -- closed-form (same fixture tag set; v3 = the doc id parsed
        -- back out of TITLE='Doc {id}')
        SELECT doc_id AS asset_id, unnest(['otag', 'ftag', 'vtag']) AS kind,
               (2 + doc_id % 2)::BIGINT AS v1,
               length('tsdb-' || (doc_id % 3))::BIGINT AS v2,
               doc_id::BIGINT AS v3,
               (length('TITLE=Doc ' || doc_id)
                + length('ARTIST=A' || (doc_id % 5))
                + CASE WHEN doc_id % 2 = 1
                       THEN length('ALBUM=Al' || doc_id)
                       ELSE 0 END)::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- mtag leg (r13): ID3v2 text frames (no vendor; TIT2/TPE1 +
        -- TALB on odd ids, encodings cycled by the fixture)
        SELECT doc_id AS asset_id, 'mtag' AS kind,
               (2 + doc_id % 2)::BIGINT AS v1,
               0::BIGINT AS v2,
               doc_id::BIGINT AS v3,
               (length('TIT2=Doc ' || doc_id)
                + length('TPE1=A' || (doc_id % 5))
                + CASE WHEN doc_id % 2 = 1
                       THEN length('TALB=Al' || doc_id)
                       ELSE 0 END)::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- vmeta leg (r13): Ogg Vorbis ident header restated
        -- closed-form (native-rate granule duration; bits slot 0)
        SELECT doc_id AS asset_id, 'vmeta' AS kind,
               (22050 + (doc_id % 4) * 11025)::BIGINT AS v1,
               (1 + doc_id % 2)::BIGINT AS v2,
               0::BIGINT AS v3,
               ((1000 + doc_id * 10) * 1000
                // (22050 + (doc_id % 4) * 11025))::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- fpic/mpic legs (r13): cover art restated closed-form — the
        -- 4x4 constant-gray PNG decodes to 16*((id*7+3)%256); mime
        -- 'image/png' has length 9
        SELECT doc_id AS asset_id, unnest(['fpic', 'mpic']) AS kind,
               4::BIGINT AS v1, 4::BIGINT AS v2,
               (16 * ((doc_id * 7 + 3) % 256))::BIGINT AS v3,
               9::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- 4meta leg (r12): M4A restated closed-form (media timescale =
        -- rate, so duration is exact half-seconds)
        SELECT doc_id AS asset_id, '4meta' AS kind,
               (8000 + (doc_id % 4) * 8000)::BIGINT AS v1,
               (1 + doc_id % 2)::BIGINT AS v2,
               16::BIGINT AS v3,
               ((2 + doc_id % 5) * 500)::BIGINT AS v4
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        -- mmeta leg (r11, r13 VBR): MP3 frame header restated
        -- closed-form; the MPEG1 Layer III bitrate table rides as
        -- literals. Duration: docs with doc_id%5 <= 2 carry a
        -- Xing (0/1) or VBRI (2) frame-count header — duration =
        -- frames * 1152 / rate; the rest are plain CBR with the byte
        -- estimate over the bytes from the frame sync on
        SELECT doc_id AS asset_id, 'mmeta' AS kind,
               rate::BIGINT AS v1,
               (CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END)::BIGINT AS v2,
               br::BIGINT AS v3,
               (CASE WHEN doc_id % 5 <= 2
                     THEN (40 + doc_id % 60) * 1152 * 1000 // rate
                     ELSE (20004 + (doc_id % 7) * 4000) * 8
                          // (br * 1000) * 1000 END)::BIGINT AS v4
        FROM (
            SELECT doc_id,
                   (CASE 1 + doc_id % 14
                        WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                        WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                        WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                        WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                        WHEN 13 THEN 256 ELSE 320 END) AS br,
                   (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                                    ELSE 32000 END) AS rate
            FROM documents WHERE doc_id % 3 = 1
        )
    """.replace("{MULAW_TABLE}", multimodal.mulaw_table_sql())
