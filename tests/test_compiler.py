"""Compiler correctness vs DuckDB oracle on the sf0.001 fixtures.

Covers the reference read surface (SURVEY.md §2.1-2.3): range combos,
point lookups, scalar/grouped aggregates, sort, limit, error contract.
"""

from __future__ import annotations

import pytest

from timeseries_db_spark.plans.compiler import compile_query, run_query
from timeseries_db_spark.schema import (
    Agg,
    GroupBy,
    IllegalQueryError,
    QueryError,
    QueryModel,
    Sort,
)
from timeseries_db_spark.sources.tables import events_as_tsdb

from tests.oracle import check_against_duckdb

# events-as-tsdb view (FIXTURES.md mapping), duckdb flavor
EVENTS_TSDB = (
    'SELECT epoch_ms(ts) AS "timestamp", event_type AS tag, value FROM events'
)
# mid-January bounds that select a strict subset at every sf
LO = 1704500000000  # ~2024-01-06
HI = 1706000000000  # ~2024-01-23


def _check(spark, sf_dir, qm: QueryModel, where_sql: str, select_sql: str, tail_sql: str = ""):
    df = compile_query(events_as_tsdb(spark, sf_dir), qm)
    sql = f"WITH t AS ({EVENTS_TSDB}) SELECT {select_sql} FROM t {where_sql} {tail_sql}"
    check_against_duckdb(df, sql, sf_dir)


# ---- range filter: all 9 bound combinations (Queries/Utils.hs:21-30) ----

RANGE_CASES = {
    "gt": (QueryModel(gt=LO), f'WHERE "timestamp" > {LO}'),
    "ge": (QueryModel(ge=LO), f'WHERE "timestamp" >= {LO}'),
    "lt": (QueryModel(lt=HI), f'WHERE "timestamp" < {HI}'),
    "le": (QueryModel(le=HI), f'WHERE "timestamp" <= {HI}'),
    "gt_lt": (QueryModel(gt=LO, lt=HI), f'WHERE "timestamp" > {LO} AND "timestamp" < {HI}'),
    "gt_le": (QueryModel(gt=LO, le=HI), f'WHERE "timestamp" > {LO} AND "timestamp" <= {HI}'),
    "ge_lt": (QueryModel(ge=LO, lt=HI), f'WHERE "timestamp" >= {LO} AND "timestamp" < {HI}'),
    "ge_le": (QueryModel(ge=LO, le=HI), f'WHERE "timestamp" >= {LO} AND "timestamp" <= {HI}'),
    "none": (QueryModel(), ""),
}


@pytest.mark.parametrize("name", sorted(RANGE_CASES))
def test_range_collect(spark, sf_dir, name):
    qm, where = RANGE_CASES[name]
    _check(spark, sf_dir, qm, where, '"timestamp", tag, value')


# ---- aggregates: scalar / by tag / by timestamp (Queries.hs:139-158) ----

AGG_SQL = {
    Agg.COUNT: "CAST(count(*) AS DOUBLE)",
    Agg.SUM: "sum(value)",
    Agg.AVG: "avg(value)",
    Agg.MIN: "min(value)",
    Agg.MAX: "max(value)",
}


@pytest.mark.parametrize("agg", list(Agg))
def test_scalar_agg(spark, sf_dir, agg):
    _check(spark, sf_dir, QueryModel(agg_func=agg), "", f"{AGG_SQL[agg]} AS result")


@pytest.mark.parametrize("agg", list(Agg))
def test_group_by_tag(spark, sf_dir, agg):
    _check(
        spark, sf_dir,
        QueryModel(agg_func=agg, group_by=GroupBy.TAG, gt=LO, le=HI),
        f'WHERE "timestamp" > {LO} AND "timestamp" <= {HI}',
        f"tag AS grp, {AGG_SQL[agg]} AS result",
        "GROUP BY tag",
    )


def test_group_by_timestamp(spark, sf_dir):
    _check(
        spark, sf_dir,
        QueryModel(agg_func=Agg.SUM, group_by=GroupBy.TIMESTAMP, ge=LO, lt=HI),
        f'WHERE "timestamp" >= {LO} AND "timestamp" < {HI}',
        '"timestamp" AS grp, sum(value) AS result',
        'GROUP BY "timestamp"',
    )


def test_group_by_ts_sort_desc_limit(spark, sf_dir):
    _check(
        spark, sf_dir,
        QueryModel(agg_func=Agg.MAX, group_by=GroupBy.TIMESTAMP, sort=Sort.DESC, limit=50),
        "",
        '"timestamp" AS grp, max(value) AS result',
        'GROUP BY "timestamp" ORDER BY grp DESC LIMIT 50',
    )


# ---- point lookups ----

def test_ts_eq_hit(spark, sf_dir):
    tsdb = events_as_tsdb(spark, sf_dir)
    ts0 = tsdb.agg({"timestamp": "min"}).first()[0]
    _check(spark, sf_dir, QueryModel(ts_eq=ts0), f'WHERE "timestamp" = {ts0}',
           '"timestamp", tag, value')


def test_tag_eq_hit(spark, sf_dir):
    _check(spark, sf_dir, QueryModel(tag_eq="click"), "WHERE tag = 'click'",
           '"timestamp", tag, value')


def test_tag_and_ts_eq(spark, sf_dir):
    tsdb = events_as_tsdb(spark, sf_dir)
    row = tsdb.orderBy("timestamp").first()
    _check(
        spark, sf_dir,
        QueryModel(ts_eq=row["timestamp"], tag_eq=row["tag"]),
        f'WHERE "timestamp" = {row["timestamp"]} AND tag = \'{row["tag"]}\'',
        '"timestamp", tag, value',
    )


# ---- sort + limit (top-k) ----

@pytest.mark.parametrize("sort", list(Sort))
def test_collect_sort_limit(spark, sf_dir, sort):
    direction = "ASC" if sort is Sort.ASC else "DESC"
    _check(
        spark, sf_dir,
        QueryModel(sort=sort, limit=25),
        "",
        '"timestamp", tag, value',
        f'ORDER BY "timestamp" {direction}, tag {direction} LIMIT 25',
    )


# ---- error contract (SURVEY.md §2.5) ----

def test_illegal_combinations():
    with pytest.raises(IllegalQueryError):
        QueryModel(group_by=GroupBy.TAG)  # groupBy without aggFunc
    with pytest.raises(IllegalQueryError):
        QueryModel(gt=1, ge=1)
    with pytest.raises(IllegalQueryError):
        QueryModel(lt=1, le=1)
    with pytest.raises(IllegalQueryError):
        QueryModel(ts_eq=1, gt=0)


def test_data_dependent_errors(spark, sf_dir):
    tsdb = events_as_tsdb(spark, sf_dir)
    with pytest.raises(QueryError, match="No data for tag"):
        run_query(tsdb, QueryModel(tag_eq="no_such_tag"))
    with pytest.raises(QueryError, match="No data for timestamp"):
        run_query(tsdb, QueryModel(ts_eq=1))
    with pytest.raises(QueryError, match="Average failed"):
        run_query(tsdb, QueryModel(agg_func=Agg.AVG, gt=9 * 10**12))


def test_grouped_presence_errors(spark, sf_dir):
    """The reference probes indexes BEFORE groupBy is consulted
    (Utils.hs:93-96 routes every tagEq query to queryTag, which throws on
    the sIx lookup miss — Tag.hs:63-64; a tsEq miss on the TS path throws
    even under groupBy=timestamp — TS.hs:62-65)."""
    tsdb = events_as_tsdb(spark, sf_dir)
    with pytest.raises(QueryError, match="No data for tag"):
        run_query(
            tsdb,
            QueryModel(tag_eq="no_such_tag", agg_func=Agg.SUM, group_by=GroupBy.TAG),
        )
    with pytest.raises(QueryError, match="No data for timestamp"):
        run_query(
            tsdb,
            QueryModel(ts_eq=1, agg_func=Agg.SUM, group_by=GroupBy.TIMESTAMP),
        )
    # but tsEq miss WITHOUT tagEq under groupBy=tag is groupTag's mapMaybe
    # (Tag.hs:49-53): silently empty, never an error
    out = run_query(
        tsdb, QueryModel(ts_eq=1, agg_func=Agg.SUM, group_by=GroupBy.TAG)
    )
    assert out.count() == 0
    # grouped avg never raises "Average failed." — empty groups just
    # don't materialize (Queries.hs:147-150)
    out = run_query(
        tsdb,
        QueryModel(agg_func=Agg.AVG, group_by=GroupBy.TAG, gt=9 * 10**12),
    )
    assert out.count() == 0


def test_empty_range_identities(spark, sf_dir):
    """Documented deviation: empty-range min/max → NULL (reference: ±inf,
    Model.hs:146-148); count → 0, sum → NULL-vs-0 — we follow SQL (NULL)."""
    tsdb = events_as_tsdb(spark, sf_dir)
    row = compile_query(tsdb, QueryModel(agg_func=Agg.COUNT, gt=9 * 10**12)).first()
    assert row["result"] == 0.0
    row = compile_query(tsdb, QueryModel(agg_func=Agg.MIN, gt=9 * 10**12)).first()
    assert row["result"] is None


def test_from_json_roundtrip():
    qm = QueryModel.from_json(
        {"gt": 1, "le": 5, "tagEq": "x", "aggFunc": "avg", "groupBy": "tag",
         "sort": "desc", "limit": 3}
    )
    assert qm.gt == 1 and qm.le == 5 and qm.tag_eq == "x"
    assert qm.agg_func is Agg.AVG and qm.group_by is GroupBy.TAG
    assert qm.sort is Sort.DESC and qm.limit == 3
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"bogus": 1})


def test_from_json_integral_floats_coerced_like_aeson():
    """aeson's parseBoundedIntegral decodes Int fields over Scientific:
    integral floats (1.0, 1e3) are accepted and coerced; fractional or
    out-of-Int64-range values are rejected with a 400-class error."""
    import pytest

    from timeseries_db_spark.schema import IllegalQueryError

    qm = QueryModel.from_json({"gt": 1.0, "limit": 2e1})
    assert qm.gt == 1 and isinstance(qm.gt, int)
    assert qm.limit == 20 and isinstance(qm.limit, int)
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"gt": 1.5})
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"limit": 1e30})  # integral but > Int64
    with pytest.raises(IllegalQueryError):
        QueryModel.from_json({"gt": True})  # bool is not an int on the wire
