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


def _rg_stats(path, cols):
    """[(col -> (min, max)) per row group] over all part files."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {}
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema in cols:
                    st[col.path_in_schema] = (
                        col.statistics.min,
                        col.statistics.max,
                    )
            out.append(st)
    return out


def _overlap_frac(groups, col, lo, hi):
    hit = sum(1 for g in groups if not (g[col][1] < lo or g[col][0] > hi))
    return hit / len(groups)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order on (user_id, ts) makes every row group a rectangle in
    2-D space: a narrow predicate on EITHER dimension overlaps only a
    minority of row groups (pyarrow footer min/max — exactly what the
    parquet reader's row-group skipping consults), while the ts-sorted
    layout answers user probes by reading everything. Both layouts
    return identical query results."""
    from timeseries_db_spark.sources.layout import write_zorder

    n = 200_000
    df = spark.range(0, n).selectExpr(
        "CAST(id * 7919 % 200000 AS BIGINT) AS user_id",
        "id + 1704067200000 AS ts",
        "CAST(id % 97 AS DOUBLE) AS value",
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zorder(df, zpath, "user_id", "ts", num_files=4,
                 block_size_bytes=192 * 1024)
    (
        df.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("parquet.block.size", str(192 * 1024))
        .parquet(spath)
    )
    zg = _rg_stats(zpath, {"user_id", "ts"})
    sg = _rg_stats(spath, {"user_id", "ts"})
    assert len(zg) >= 8 and len(sg) >= 8  # multi-row-group layouts
    u_lo, u_hi = 100_000, 110_000         # 5% user window
    t_lo, t_hi = 1704067200000 + 60_000, 1704067200000 + 70_000  # 5% ts
    # ts-sorted: perfect on ts, useless on user
    assert _overlap_frac(sg, "ts", t_lo, t_hi) <= 0.25
    assert _overlap_frac(sg, "user_id", u_lo, u_hi) >= 0.9
    # z-order: prunes BOTH dimensions (rectangles ~1/sqrt(groups) wide)
    assert _overlap_frac(zg, "user_id", u_lo, u_hi) <= 0.5
    assert _overlap_frac(zg, "ts", t_lo, t_hi) <= 0.6
    # result equality across layouts
    q = "user_id BETWEEN 100000 AND 110000 AND ts BETWEEN {} AND {}".format(
        t_lo, t_hi
    )
    a = spark.read.parquet(zpath).filter(q).select("user_id", "ts", "value")
    b = spark.read.parquet(spath).filter(q).select("user_id", "ts", "value")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zorder_key_is_monotone_rectangular(spark):
    """Curve sanity: the Morton key of (0,0) is 0; doubling one
    normalized dimension moves higher bits than doubling the other
    (interleave, not concatenation); and keys stay within 2*ZBITS
    bits."""
    from timeseries_db_spark.sources.layout import ZBITS, _morton_expr

    import pyspark.sql.functions as F

    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1 << (ZBITS - 1), 0), (0, 1 << (ZBITS - 1))],
        "a long, b long",
    ).select(F.expr(_morton_expr("a", "b")).alias("z"))
    z = [r["z"] for r in rows.collect()]
    assert z[0] == 0
    assert z[1] == 2 and z[2] == 1  # a lands on odd bit positions
    assert z[3] == 1 << (2 * ZBITS - 1) and z[4] == 1 << (2 * ZBITS - 2)
    assert all(0 <= v < (1 << (2 * ZBITS)) for v in z)


def test_zorder_normalize_huge_domain(spark):
    """The pre-divide branch for domains >= 2^(63-ZBITS): keys stay in
    range, are monotone in each dimension, and the write path works on
    a 10^13-wide ts span without overflow."""
    from pyspark.sql import functions as F

    from timeseries_db_spark.sources.layout import ZBITS, _normalize_expr

    lo, hi = 0, 10**13  # > 2^42: triggers the divide-first branch
    expr = _normalize_expr("v", lo, hi)
    vals = [lo, 1, hi // 3, hi // 2, hi - 1, hi]
    out = [
        r["n"]
        for r in spark.createDataFrame([(v,) for v in vals], "v long")
        .select(F.expr(expr).alias("n"))
        .collect()
    ]
    assert all(0 <= n < (1 << ZBITS) for n in out), out
    assert out == sorted(out), out  # monotone
    assert out[0] < out[-1]         # actually spreads


def test_zorder_on_real_events_fixture(spark, sf_dir, tmp_path):
    """Z-order the real events table on (user_id, epoch-ms): lossless
    roundtrip, and row-group user_id spans shrink well below the global
    domain (the 2-D clustering materializes on real data, not just the
    synthetic grid)."""
    from pyspark.sql import functions as F

    from timeseries_db_spark.sources.layout import write_zorder
    from timeseries_db_spark.sources.tables import load_table, ts_to_millis

    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        "user_id", ts_to_millis(ev, "ts").alias("tms"), "value"
    )
    path = str(tmp_path / "zev")
    write_zorder(df, path, "user_id", "tms", num_files=4,
                 block_size_bytes=96 * 1024)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    a = df.agg(F.sum("value"), F.min("tms"), F.max("tms")).first()
    b = back.agg(F.sum("value"), F.min("tms"), F.max("tms")).first()
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1] and a[2] == b[2]
    groups = _rg_stats(path, {"user_id", "tms"})
    if len(groups) >= 4:  # enough row groups for spans to mean anything
        lo = min(g["user_id"][0] for g in groups)
        hi = max(g["user_id"][1] for g in groups)
        spans = sorted(
            (g["user_id"][1] - g["user_id"][0]) / max(hi - lo, 1)
            for g in groups
        )
        assert spans[len(spans) // 2] < 0.75, spans
