"""Data-quality report — Deequ-style expectation metrics over the warehouse
tables: completeness (null fractions), uniqueness (duplicate keys),
referential integrity (orphan foreign keys), and domain ranges. The
standard pre-flight of any 100 TB pipeline run: compute the metrics,
compare against thresholds, fail the run before garbage propagates.

Scale shape: ONE conditional-aggregate scan per table (every metric of a
table folds into a single agg — count/sum-of-CASE monoids with map-side
partials), plus one shuffle anti-join for the referential check. Metrics
are emitted as (metric, value) rows via the stack unpivot, so adding a
metric never adds a scan. All values are exact integer counts (or
round-4 fractions of them) — cross-engine deterministic.

Reference scope: the reference engine validates per-request (the ≤10-error
DML contract, `Queries.hs:76-99`); corpus-level quality METRICS are
north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round
from timeseries_db_spark.sources.tables import load_table, ts_to_millis


def _unpivot(df: DataFrame, metrics: list[str]) -> DataFrame:
    """One-row frame of metric columns → (metric, value) rows."""
    pairs = ", ".join(f"'{m}', {m}" for m in metrics)
    return df.selectExpr(
        f"stack({len(metrics)}, {pairs}) AS (metric, value)"
    )


def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, value) — the warehouse data-quality report:

    * ``rows_<t>`` — row counts (orders, lineitem, events);
    * ``null_frac_o_custkey`` — completeness of the orders FK;
    * ``dup_pk_orders`` / ``dup_key_events`` — uniqueness of the orders
      PK and the events (ts, event_type) key;
    * ``orphan_lineitems`` — referential integrity: lineitems whose
      order does not exist;
    * ``range_viol_l_quantity`` / ``range_viol_l_discount`` — domain
      checks (quantity > 0; discount ∈ [0, 1]).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    o = _unpivot(
        orders.agg(
            F.count(F.lit(1)).cast("double").alias("rows_orders"),
            duck_round(
                F.sum(
                    F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("null_frac_o_custkey"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .cast("double")
            .alias("dup_pk_orders"),
        ),
        ["rows_orders", "null_frac_o_custkey", "dup_pk_orders"],
    )
    l = _unpivot(
        li.agg(
            F.count(F.lit(1)).cast("double").alias("rows_lineitem"),
            F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
            .cast("double")
            .alias("range_viol_l_quantity"),
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                ).otherwise(0)
            )
            .cast("double")
            .alias("range_viol_l_discount"),
        ),
        ["rows_lineitem", "range_viol_l_quantity", "range_viol_l_discount"],
    )
    e = _unpivot(
        ev.select(
            "value", ts_to_millis(ev, "ts").alias("tms"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("double").alias("rows_events"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("double")
            .alias("null_events_value"),
            # NULL-key rows must count as distinct keys on BOTH engines:
            # Spark's count(DISTINCT a, b) silently drops NULL-containing
            # tuples while DuckDB's SELECT DISTINCT keeps them — coalesce
            # to sentinels so the dirty-data metric itself is not the
            # thing that diverges on dirty data (code-review r8)
            (
                F.count(F.lit(1))
                - F.countDistinct(
                    F.coalesce(F.col("tms"), F.lit(-(2**62))),
                    F.coalesce(F.col("event_type"), F.lit("\x00null")),
                )
            )
            .cast("double")
            .alias("dup_key_events"),
        ),
        ["rows_events", "null_events_value", "dup_key_events"],
    )
    orphans = (
        li.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("orphan_lineitems"))
    )
    return (
        o.unionByName(l)
        .unionByName(e)
        .unionByName(_unpivot(orphans, ["orphan_lineitems"]))
    )


def dq_report_sql() -> str:
    """DuckDB twin — the same metrics as scalar selects."""
    return f"""
        SELECT 'rows_orders' AS metric, count(*)::DOUBLE AS value FROM orders
        UNION ALL
        SELECT 'null_frac_o_custkey',
               round(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 4)
        FROM orders
        UNION ALL
        SELECT 'dup_pk_orders',
               (count(*) - count(DISTINCT o_orderkey))::DOUBLE FROM orders
        UNION ALL
        SELECT 'rows_lineitem', count(*)::DOUBLE FROM lineitem
        UNION ALL
        SELECT 'range_viol_l_quantity',
               sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)::DOUBLE
        FROM lineitem
        UNION ALL
        SELECT 'range_viol_l_discount',
               sum(CASE WHEN l_discount < 0 OR l_discount > 1
                        THEN 1 ELSE 0 END)::DOUBLE
        FROM lineitem
        UNION ALL
        SELECT 'rows_events', count(*)::DOUBLE FROM events
        UNION ALL
        SELECT 'null_events_value',
               sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::DOUBLE
        FROM events
        UNION ALL
        SELECT 'dup_key_events',
               (count(*) - (SELECT count(*) FROM (
                   SELECT DISTINCT
                          COALESCE(epoch_ms(ts), {-(2**62)}),
                          COALESCE(event_type, chr(0) || 'null')
                   FROM events
               )))::DOUBLE
        FROM events
        UNION ALL
        SELECT 'orphan_lineitems',
               count(*)::DOUBLE
        FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    """
