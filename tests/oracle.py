"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark
DataFrame and a DuckDB SQL string over the same parquet tables, compare
row count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os
import struct

import duckdb
import pandas as pd

from timeseries_db_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_same(spark_df, oracle_df: pd.DataFrame) -> None:
    """Bitwise-exact comparison — the driver hashes raw values, so a
    +0.0/-0.0 or 1-ulp divergence that `==` forgives still fails the
    gate. Two equivalences are granted: NaN==NaN, and None≡NaN for
    float columns — pandas turns double NULL into NaN on `toPandas()`,
    so a Spark NULL and a DuckDB NULL both surface here as NaN and the
    distinction is unobservable post-conversion (the driver's hash sees
    the same pandas frames and conflates them identically)."""
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_df)
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    for col in got.columns:
        g, e = got[col], exp[col]
        for i, (gv, ev) in enumerate(zip(g, e)):
            if isinstance(gv, float) or isinstance(ev, float):
                g_nan = gv is None or (isinstance(gv, float) and math.isnan(gv))
                e_nan = ev is None or (isinstance(ev, float) and math.isnan(ev))
                if g_nan or e_nan:
                    assert g_nan and e_nan, (col, i, gv, ev)
                    continue
                gb = struct.pack("<d", float(gv))
                eb = struct.pack("<d", float(ev))
                assert gb == eb, (col, i, gv, ev, "bitwise")
            else:
                assert gv == ev, (col, i, gv, ev)


def check_against_duckdb(spark_df, sql: str, sf_dir: str) -> None:
    con = duck_connect(sf_dir)
    try:
        assert_same(spark_df, con.execute(sql).df())
    finally:
        con.close()
