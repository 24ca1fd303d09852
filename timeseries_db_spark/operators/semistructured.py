"""Semi-structured (JSON) column operators.

The reference's record is fully typed (SURVEY §1.1; reference
``Model.hs`` TimeSeries = timestamp/tag/value), but the synthetic
``events`` table carries a ``props`` JSON-string column — the classic
semi-structured payload an analytics engine must handle natively. This
module is the typed-extraction surface over it:

* ``props_extract`` — ``F.from_json`` with an explicit schema. JVM-side,
  whole-stage-codegen, no Python; one map-only projection (no shuffle).
* ``props_stats`` — extraction composed with aggregation, with the
  extracted field appearing BOTH as an aggregate input (avg/min/max of
  ``k``) and as a grouping key (``k`` deciles), union-folded into one
  ``(grp, n, avg_value, avg_k, min_k, max_k, leg)`` result.

100 TB posture: ``from_json`` runs inside codegen next to the scan, so
extraction never materializes an intermediate and never leaves the JVM.
The aggregation is a standard partial-agg shuffle on the group key.
A string-typed ``props`` column cannot push extracted-field predicates
into the parquet scan — at scale, frequently-filtered JSON fields
should be hoisted to typed columns at ingest (exactly what
``props_extract`` produces; write THAT and filter on the real column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round

PROPS_SCHEMA = "k INT"


def props_extract(events: DataFrame) -> DataFrame:
    """(event_id, event_type, value, k) — typed extraction of the JSON
    ``props`` payload. Malformed JSON yields NULL k (PERMISSIVE mode),
    never a failed job."""
    return events.select(
        "event_id",
        "event_type",
        "value",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("k"),
    )


def props_extract_sql() -> str:
    return """
        SELECT event_id, event_type, value,
               CAST(props->>'k' AS INT) AS k
        FROM events
    """


def props_stats(events: DataFrame) -> DataFrame:
    """Grouped stats over the extracted field, two legs:

    * ``by_type`` — grp = event_type (extracted field as aggregate input)
    * ``by_k_decile`` — grp = k DIV 10 (extracted field as GROUP KEY)

    Schema: (grp string, n double, avg_value, avg_k, min_k, max_k, leg).
    """
    ex = props_extract(events)

    def agg_of(df: DataFrame, grp, leg: str) -> DataFrame:
        return (
            df.groupBy(grp.alias("grp"))
            .agg(
                F.count("*").cast("double").alias("n"),
                duck_round(F.avg("value"), 4).alias("avg_value"),
                duck_round(F.avg("k"), 4).alias("avg_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
            .withColumn("leg", F.lit(leg))
        )

    by_type = agg_of(ex, F.col("event_type"), "by_type")
    by_decile = agg_of(
        ex, F.expr("CAST(k div 10 AS STRING)"), "by_k_decile"
    )
    return by_type.unionByName(by_decile)


def props_stats_sql() -> str:
    return """
        WITH ex AS (
            SELECT event_type, value, CAST(props->>'k' AS INT) AS k
            FROM events
        )
        SELECT event_type AS grp, CAST(count(*) AS DOUBLE) AS n,
               round(avg(value), 4) AS avg_value,
               round(avg(k), 4) AS avg_k,
               min(k) AS min_k, max(k) AS max_k,
               'by_type' AS leg
        FROM ex GROUP BY event_type
        UNION ALL
        SELECT CAST(k // 10 AS VARCHAR) AS grp, CAST(count(*) AS DOUBLE) AS n,
               round(avg(value), 4) AS avg_value,
               round(avg(k), 4) AS avg_k,
               min(k) AS min_k, max(k) AS max_k,
               'by_k_decile' AS leg
        FROM ex GROUP BY CAST(k // 10 AS VARCHAR)
    """
