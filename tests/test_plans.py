"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
"built-in" must actually show up in the executed plan — filters reaching
the parquet scan, column pruning to the referenced columns, and top-k
instead of a global sort."""

from __future__ import annotations

from timeseries_db_spark.plans.compiler import compile_query
from timeseries_db_spark.schema import Agg, GroupBy, QueryModel, Sort
from timeseries_db_spark.sources.tables import events_as_tsdb


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_range_bounds_reach_the_scan(spark, sf_dir):
    qm = QueryModel(agg_func=Agg.AVG, group_by=GroupBy.TAG, gt=1704500000000, le=1706000000000)
    plan = _formatted_plan(spark, compile_query(events_as_tsdb(spark, sf_dir, qm), qm))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    # gt/le translated into the raw ns domain (sources.push_ts_bounds)
    assert "GreaterThanOrEqual(ts,1704500000001000000)" in pushed[0]
    assert "LessThan(ts,1706000000001000000)" in pushed[0]


def test_scalar_agg_prunes_to_value_column(spark, sf_dir):
    qm = QueryModel(agg_func=Agg.SUM)
    plan = _formatted_plan(spark, compile_query(events_as_tsdb(spark, sf_dir), qm))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    assert "value:double" in read[0]
    # the only-agg fast path must not drag the tag or key columns through
    assert "event_type" not in read[0] and "event_id" not in read[0]


def test_sort_limit_compiles_to_top_k(spark, sf_dir):
    qm = QueryModel(sort=Sort.DESC, limit=10)
    plan = _formatted_plan(spark, compile_query(events_as_tsdb(spark, sf_dir), qm))
    assert "TakeOrderedAndProject" in plan, plan


def test_dimension_joins_broadcast(spark, sf_dir):
    from timeseries_db_spark.operators.joins import revenue_by_nation

    plan = _formatted_plan(spark, revenue_by_nation(spark, sf_dir))
    # customer and nation must build broadcast sides; the only exchange of
    # fact data is the orderkey join / group-by shuffle
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_tag_filter_pushes_to_scan(spark, sf_dir):
    qm = QueryModel(tag_eq="click", agg_func=Agg.COUNT)
    plan = _formatted_plan(spark, compile_query(events_as_tsdb(spark, sf_dir, qm), qm))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "EqualTo(event_type,click)" in pushed[0], plan
