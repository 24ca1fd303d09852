"""The reference-shaped ``timeseries`` fixture (FIXTURES.md §F1).

Mirrors the reference's deterministic demo generator
(``server/src/helpers/generateTS.hs:7-33``): dense consecutive-millisecond
timestamps starting at 16184810930000, four heavily-skewed tags and four
values derived from the timestamp by index arithmetic. This is the shape
every reference-surface query actually ran against, so registering queries
over it stresses exactly what the driver tables can't: range-boundary
off-by-ones on dense keys, group-by skew (``Munich`` takes every even row
— half the table), and count-vs-sum on constant-valued groups.

Generated, not stored: both engines derive the identical table from a
range — ``spark.range`` here, ``range(n)`` in the DuckDB oracle — so the
fixture costs no I/O and scales to any row count. ``spark.range`` yields a
splittable parallel source (one partition per core), so even the fixture
path exercises distributed execution.

Note the reference indexes tag/value rules by the *timestamp itself*
(``interval = [num..num+2000000]``, ``generateTS.hs:31-33``), not by a
0-based row number — replicated here (BASE_TS is even, so parity rules
land identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: generateTS.hs:28 — `num = 16184810930000`
BASE_TS = 16_184_810_930_000

#: default fixture size — 10% of the reference's 2,000,001-row demo set;
#: large enough for skew/boundary behavior, small enough for the oracle gate
N_ROWS = 200_001


def timeseries_fixture(spark: SparkSession, n_rows: int = N_ROWS) -> DataFrame:
    """The fixture as a DataFrame ``(timestamp:long, tag:string, value:double)``.

    Tag rules — ``generateTS.hs:7-12``; value rules — ``generateTS.hs:14-19``.
    """
    ts = F.col("timestamp")
    return (
        spark.range(n_rows)
        .select((F.lit(BASE_TS) + F.col("id")).alias("timestamp"))
        .select(
            "timestamp",
            F.when(ts % 2 == 0, "Munich")
            .when(ts % 3 == 0, "Skopje")
            .when(ts % 5 == 0, "London")
            .otherwise("Athens")
            .alias("tag"),
            F.when(ts % 6 == 0, F.lit(12.0))
            .when(ts % 4 == 0, F.lit(21.0))
            .when(ts % 10 == 0, F.lit(1223.0))
            .otherwise(F.lit(44.0))
            .cast("double")
            .alias("value"),
        )
    )


def timeseries_fixture_sql(n_rows: int = N_ROWS) -> str:
    """DuckDB generator for the identical table (oracle side)."""
    return f"""
        SELECT ts AS "timestamp",
               CASE WHEN ts % 2 = 0 THEN 'Munich'
                    WHEN ts % 3 = 0 THEN 'Skopje'
                    WHEN ts % 5 = 0 THEN 'London'
                    ELSE 'Athens' END AS tag,
               CAST(CASE WHEN ts % 6 = 0 THEN 12
                         WHEN ts % 4 = 0 THEN 21
                         WHEN ts % 10 = 0 THEN 1223
                         ELSE 44 END AS DOUBLE) AS value
        FROM (SELECT {BASE_TS} + i AS ts FROM range({n_rows}) r(i))
    """
