"""Semi-structured JSON operators: oracle parity, malformed-input
behavior, and the no-Python / map-only plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE
from tests.oracle import check_against_duckdb
from timeseries_db_spark.operators import semistructured
from timeseries_db_spark.sources.tables import load_table


def test_props_extract_matches_oracle(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    check_against_duckdb(
        semistructured.props_extract(ev),
        semistructured.props_extract_sql(),
        SF_DIR_ORACLE,
    )


def test_props_stats_matches_oracle(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    check_against_duckdb(
        semistructured.props_stats(ev),
        semistructured.props_stats_sql(),
        SF_DIR_ORACLE,
    )


def test_malformed_json_yields_null_not_failure(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.0, '{"k": 7}'),
            (2, "a", 2.0, "not json at all"),
            (3, "b", 3.0, '{"other": 1}'),
            (4, "b", 4.0, None),
        ],
        "event_id long, event_type string, value double, props string",
    )
    rows = {r["event_id"]: r["k"] for r in semistructured.props_extract(df).collect()}
    assert rows == {1: 7, 2: None, 3: None, 4: None}


def test_extraction_is_jvm_map_only(spark):
    """from_json stays in codegen: no Exchange, no Python eval node in
    the extraction plan."""
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    plan = semistructured.props_extract(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_stats_single_shuffle_per_leg(spark):
    """Each union leg is one partial-agg shuffle on its group key —
    2 legs, so at most 2 Exchanges (AQE may reuse the scan)."""
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    plan = (
        semistructured.props_stats(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Python" not in plan
