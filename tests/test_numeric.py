"""Cross-engine numeric helpers: duck_div vs DuckDB's `//` (which, on
integer operands, truncates toward zero — NOT floor division)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round, duck_div

CASES = [
    -7_200_001, -3_600_001, -3_600_000, -1, 0, 1, 3_599_999, 3_600_000,
    7_200_001,
    # beyond 2^53: a double-division implementation truncates one low here
    2_518_762_692_304_800_000,
    -2_518_762_692_304_800_000,
    (1 << 62) + 12_345,
]
DIV = 3_600_000


def test_duck_div_matches_duckdb(spark):
    df = spark.createDataFrame([(v,) for v in CASES], "x long").select(
        "x", duck_div(F.col("x"), DIV).alias("fd")
    )
    got = {r["x"]: r["fd"] for r in df.collect()}
    con = duckdb.connect()
    for v in CASES:
        (want,) = con.execute(f"SELECT {v} // {DIV}").fetchone()
        assert got[v] == want, f"duck_div({v}, {DIV}) = {got[v]} != {want}"
    # truncation toward zero on negatives (DuckDB integer `//` semantics)
    assert got[-1] == 0
    assert got[-3_600_001] == -1
    assert got[-7_200_001] == -2


def test_duck_round_matches_duckdb_at_ties(spark):
    vals = [51.51125, -51.51125, 2.00005, -2.00005, 0.123449999]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", duck_round(F.col("x"), 4).alias("r")
    )
    got = {r["x"]: r["r"] for r in df.collect()}
    con = duckdb.connect()
    for v in vals:
        (want,) = con.execute(f"SELECT round({v!r}::DOUBLE, 4)").fetchone()
        assert got[v] == want, f"duck_round({v}) = {got[v]} != {want}"
