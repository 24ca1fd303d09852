"""Capture .explain('formatted') for headline entries into
plans/r18/<name>_<suffix>.txt (judge-checkable plan evidence).

Usage: python plans/r18/capture_plans.py <suffix> [names...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from timeseries_db_spark.session import get_spark
from timeseries_db_spark import registry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("r18-plans")
    queries, _ = registry.build_registry()
    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: {n_exch} Exchange refs, {len(txt)} chars", flush=True)


if __name__ == "__main__":
    main()
