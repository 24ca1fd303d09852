"""Driver-contract simulation (verify skill): vanilla local[8] session
(only timeZone=UTC), import __spark_entry__, run entry(), then compare
selected queries() against oracle_sql() via DuckDB at sf0.01.

Usage: python plans/r18/driver_sim.py [entry ...]   (default: a core set)
       python plans/r18/driver_sim.py --all
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"

DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "corpus_contamination",
    "agg_by_tag_all",
    "derivatives_by_tag",
    "asof_hourly_enrich",
    "gapfill_hourly",
    "join_revenue_by_nation",
    "range_scan_9combos",
    "text_features",
    "text_vocab_topn",
    "sim_cosine_topk",
    "ann_topk_ivf",
]


def norm(pdf: pd.DataFrame) -> list:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pdf[c].notna(), None)
    rows = []
    for t in pdf.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                # NaN != NaN breaks tuple comparison; NULL doubles arrive
                # as None from Spark and NaN from DuckDB — normalize both.
                # Stringify so object columns mixing floats and strings
                # (nullable union legs) stay sortable.
                row.append("" if v != v else str(round(v, 4)))
            else:
                row.append(str(v) if v is not None else "")
        rows.append(tuple(row))
    rows.sort()
    return rows


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("r18-driver-sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    pdf = E.entry(spark).toPandas()
    assert len(pdf) > 0, "entry() returned 0 rows"
    print(f"entry() OK: {len(pdf)} rows")

    q = E.queries()
    o = E.oracle_sql()
    names = sys.argv[1:] or DEFAULT
    if names == ["--all"]:
        names = sorted(q.keys())
    con = duckdb.connect()
    import os

    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "customer", "nation", "region", "part", "supplier", "partsupp"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    n_bad = 0
    for name in names:
        try:
            got = norm(q[name](spark, SF_DIR).toPandas())
            want = norm(con.execute(o[name]).df())
            ok = got == want
            print(f"{name}: rows {len(got)}/{len(want)} "
                  f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                n_bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            n_bad += 1
    print(f"driver_sim: {len(names) - n_bad}/{len(names)} green")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
