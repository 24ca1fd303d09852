"""Format-flexible tsdb sources: parquet, JSON-lines (the reference's
wire format), and CSV must produce identical query results."""

from __future__ import annotations

import pytest

from timeseries_db_spark.plans.compiler import compile_query
from timeseries_db_spark.schema import Agg, GroupBy, QueryModel, IllegalQueryError
from timeseries_db_spark.sources.fixture import timeseries_fixture
from timeseries_db_spark.sources.tables import read_tsdb_any

N = 2_000


@pytest.fixture(scope="module")
def three_formats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fmt")
    pdf = timeseries_fixture(spark, N).toPandas()
    pq_path = str(base / "t.parquet")
    json_path = str(base / "t.jsonl")
    csv_path = str(base / "t.csv")
    pdf.to_parquet(pq_path)
    pdf.to_json(json_path, orient="records", lines=True)
    pdf.to_csv(csv_path, index=False)
    return pq_path, json_path, csv_path


def test_all_formats_agree(spark, three_formats):
    qm = QueryModel(agg_func=Agg.SUM, group_by=GroupBy.TAG)
    results = []
    for path in three_formats:
        df = compile_query(read_tsdb_any(spark, path), qm)
        results.append(sorted((r["grp"], round(r["result"], 4)) for r in df.collect()))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) == 4


def test_bad_enum_is_illegal_query():
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"aggFunc": "median"})
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"sort": "sideways"})
