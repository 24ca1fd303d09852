"""Byte-exact error-text parity with the reference under
``wire.set_reference_wire(True)`` — literals transcribed from
``Model.hs:126-134``, ``Queries/Utils.hs:47-49``, ``Queries.hs:60-65``
(including the reference's ``provie`` typo)."""

from __future__ import annotations

import pytest

from timeseries_db_spark import wire
from timeseries_db_spark.operators.dml import DmlError, TsTable
from timeseries_db_spark.plans.compiler import run_query
from timeseries_db_spark.schema import (
    Agg,
    IllegalQueryError,
    QueryError,
    QueryModel,
    TS_SCHEMA,
)


@pytest.fixture()
def ref_wire():
    wire.set_reference_wire(True)
    yield
    wire.set_reference_wire(False)


def _msg(excinfo) -> str:
    return str(excinfo.value)


def test_illegalqm_reference_strings(ref_wire):
    with pytest.raises(IllegalQueryError) as e:
        QueryModel(group_by="tag")
    assert _msg(e) == "You must provie 'aggFunc' with 'groupBy'."
    with pytest.raises(IllegalQueryError) as e:
        QueryModel(gt=1, ge=1)
    assert _msg(e) == "Can't query 'gt' and 'ge' at the same time."
    with pytest.raises(IllegalQueryError) as e:
        QueryModel(lt=1, le=1)
    assert _msg(e) == "Can't query 'lt' and 'le' at the same time."
    with pytest.raises(IllegalQueryError) as e:
        QueryModel(ts_eq=1, gt=0)
    assert _msg(e) == "Can't query 'tsEq' with any other timestamp condition."


def test_no_data_and_avg_reference_strings(ref_wire, spark):
    tsdb = spark.createDataFrame([(1, "gold", 2.0)], TS_SCHEMA)
    with pytest.raises(QueryError) as e:
        run_query(tsdb, QueryModel(tag_eq="nope"))
    assert _msg(e) == 'No data for tag "nope".'
    with pytest.raises(QueryError) as e:
        run_query(tsdb, QueryModel(ts_eq=42))
    assert _msg(e) == "No data for timestamp 42."
    with pytest.raises(QueryError) as e:
        run_query(tsdb, QueryModel(agg_func=Agg.AVG, gt=10))
    assert _msg(e) == "Average failed."


def test_dml_reference_strings(ref_wire, spark, tmp_path):
    t = TsTable.create(spark, str(tmp_path / "wire"))
    t.insert(spark.createDataFrame([(1, "gold", 2.0)], TS_SCHEMA))
    with pytest.raises(DmlError) as e:
        t.insert(spark.createDataFrame([(1, "gold", 9.0)], TS_SCHEMA))
    assert e.value.errors == ['Timestamp = 1 and tag = "gold" already exists.']
    with pytest.raises(DmlError) as e:
        t.update(spark.createDataFrame([(2, "gold", 9.0)], TS_SCHEMA))
    assert e.value.errors == ['Timestamp = 2 and tag = "gold" not found.']
    with pytest.raises(DmlError) as e:
        t.delete(spark.createDataFrame([(3, "iron")], "timestamp long, tag string"))
    assert e.value.errors == ['Timestamp = 3 and tag = "iron" not found.']


def test_modern_strings_are_default(spark):
    assert not wire.is_reference_wire()
    tsdb = spark.createDataFrame([(1, "gold", 2.0)], TS_SCHEMA)
    with pytest.raises(QueryError) as e:
        run_query(tsdb, QueryModel(tag_eq="nope"))
    assert _msg(e) == "No data for tag nope."


def test_show_tag_escaping():
    wire.set_reference_wire(True)
    try:
        assert wire.no_data_tag('a"b\\c') == 'No data for tag "a\\"b\\\\c".'
    finally:
        wire.set_reference_wire(False)
