"""Partitioned storage layout: writing date-partitioned and reading with
derived dt predicates must (a) actually prune partitions in the plan and
(b) return exactly what the unpartitioned path returns."""

from __future__ import annotations

import pytest

from timeseries_db_spark.plans.compiler import compile_query
from timeseries_db_spark.schema import Agg, GroupBy, QueryModel
from timeseries_db_spark.sources.fixture import BASE_TS, timeseries_fixture
from timeseries_db_spark.sources.tables import (
    read_tsdb_partitioned,
    write_tsdb_partitioned,
)

DAY_MS = 86_400_000
N = 300_000  # at 1 row/second → ~3.5 days → 4-5 date partitions


def _spread_fixture(spark):
    """Fixture rescaled from 1 row/ms to 1 row/s so N rows span days
    (tag/value rules keep their original dense-ms derivation)."""
    from pyspark.sql import functions as F

    return timeseries_fixture(spark, N).withColumn(
        "timestamp", F.lit(BASE_TS) + (F.col("timestamp") - BASE_TS) * 1000
    )


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "tsdb")
    write_tsdb_partitioned(_spread_fixture(spark), path)
    return path


def test_partition_pruning_in_plan(spark, part_path):
    qm = QueryModel(ge=BASE_TS, lt=BASE_TS + DAY_MS // 2, agg_func=Agg.SUM)
    df = compile_query(read_tsdb_partitioned(spark, part_path, qm), qm)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "dt" in pf[0], plan
    # half-day range over ~4.5 days: the scan must see a strict subset of
    # partitions (files pruned before any row is read)
    import re

    m = re.search(r"partitions read: (\d+)", plan)
    if m:  # formatted plans include the count once the scan is resolved
        assert int(m.group(1)) <= 2, plan


def test_partitioned_read_matches_unpartitioned(spark, part_path):
    qm = QueryModel(
        ge=BASE_TS + DAY_MS, lt=BASE_TS + 2 * DAY_MS + 5000,
        agg_func=Agg.AVG, group_by=GroupBy.TAG,
    )
    got = {
        (r["grp"], round(r["result"], 6))
        for r in compile_query(read_tsdb_partitioned(spark, part_path, qm), qm).collect()
    }
    exp = {
        (r["grp"], round(r["result"], 6))
        for r in compile_query(_spread_fixture(spark), qm).collect()
    }
    assert got == exp and got


def test_unfiltered_partitioned_read_is_complete(spark, part_path):
    assert read_tsdb_partitioned(spark, part_path).count() == N
