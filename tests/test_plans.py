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


def _nodes(plan: str, name: str) -> list[str]:
    """Physical nodes from the formatted details section ('(N) Name')."""
    import re

    return re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.MULTILINE)


def test_range_bounds_reach_the_scan(spark, sf_dir):
    qm = QueryModel(agg_func=Agg.AVG, group_by=GroupBy.TAG, gt=1704500000000, le=1706000000000)
    plan = _formatted_plan(spark, compile_query(events_as_tsdb(spark, sf_dir, qm), qm))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    # gt/le translated into the raw scan domain (sources.push_ts_bounds).
    # Spark renders the pushed literal either as raw nanos or as an ISO
    # instant depending on version/session — accept both spellings; the
    # ms values are gt+1 = 1704500000001 and le+1 = 1706000000001.
    assert (
        "GreaterThanOrEqual(ts,1704500000001000000)" in pushed[0]
        or "GreaterThanOrEqual(ts,2024-01-06T00:13:20.001" in pushed[0]
    ), pushed[0]
    assert (
        "LessThan(ts,1706000000001000000)" in pushed[0]
        or "LessThan(ts,2024-01-23T08:53:20.001" in pushed[0]
    ), pushed[0]


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


def test_sharded_cosine_topk_plan(spark, sf_dir):
    """The exact top-k plan: corpus streams through MapInPandas (no
    driver-side corpus), a single exchange keys the window merge by qid,
    and the corpus scan is pruned to (vec_id, embedding)."""
    from pyspark.sql import functions as F

    from timeseries_db_spark.operators.similarity import cosine_topk
    from timeseries_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = cosine_topk(spark, emb.filter(F.expr("vec_id % 100 = 0")), emb, 5)
    plan = _formatted_plan(spark, df)
    assert "MapInPandas" in plan, plan
    # exactly one shuffle: the qid window merge of per-shard winners
    # (formatted mode prints each node in the tree AND the details list,
    # so count physical nodes via the numbered details entries)
    assert len(_nodes(plan, "Exchange")) == 1, plan


def test_near_dup_block_join_single_shuffle(spark, sf_dir):
    """Block self-join: one exchange on the (lo, hi) block-pair key into
    FlatMapGroupsInPandas — no cartesian, no broadcast of the corpus."""
    from timeseries_db_spark.operators.similarity import near_dup_pairs
    from timeseries_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _formatted_plan(spark, near_dup_pairs(emb, 0.4))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert len(_nodes(plan, "Exchange")) == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_union_branches_push_their_own_bounds(spark, sf_dir):
    """Each branch of the folded 9-combo range entry must push ITS
    bounds to its scan (the fold must not defeat per-branch pushdown)."""
    from timeseries_db_spark.registry import build_registry

    q, _ = build_registry()
    plan = _formatted_plan(spark, q["range_scan_9combos"](spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    # 8 bounded branches each push their own ts bounds; the unbounded
    # branch scans with no filter section at all
    assert len(pushed) == 8, plan
    assert all("ts," in l for l in pushed), pushed


def test_running_totals_scalable_broadcasts_offsets(spark):
    """The two-pass running total must broadcast the tiny offsets table
    back onto the data (no shuffle of the fact side for the join)."""
    from timeseries_db_spark.operators.analytics import running_totals_scalable
    from timeseries_db_spark.sources.fixture import timeseries_fixture

    plan = _formatted_plan(
        spark, running_totals_scalable(timeseries_fixture(spark, 10_000))
    )
    assert "BroadcastHashJoin" in plan, plan
