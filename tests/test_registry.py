"""Driver-contract mirror: every queries() entry hash-matches its
oracle_sql() twin at sf0.01 (the driver's t2 gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR_ORACLE
from tests.oracle import check_against_duckdb

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    # all reference-surface queries must have oracles; extension queries
    # may be rows-only (explicitly listed here when that is deliberate)
    rows_only_ok = {k for k in QUERIES if k not in ORACLES}
    for k in rows_only_ok:
        assert k.startswith(("stream_", "ann_")), (
            f"{k} lacks an oracle and is not a declared non-SQL-expressible op"
        )


def test_oracles_have_matching_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    check_against_duckdb(df, ORACLES[name], SF_DIR_ORACLE)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert [f.name for f in df.schema.fields] == ["grp", "result"]


def test_priority_block_registers_first_within_budget():
    from timeseries_db_spark.registry import _PRIORITY, GATE_BUDGET

    names = list(QUERIES)
    assert names[: len(_PRIORITY)] == _PRIORITY
    assert len(names) <= GATE_BUDGET
