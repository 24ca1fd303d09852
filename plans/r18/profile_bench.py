"""r18 measurement harness (guide §1): decompose each headline entry's
bench wall into plan-build / noop-sink execution / toPandas phases, on
the SAME session shape bench.py uses. Writes plans/r18/profile_phases_full.json.

Usage: python plans/r18/profile_bench.py [names...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from timeseries_db_spark.session import get_spark
from timeseries_db_spark import registry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 3


def main() -> None:
    spark = get_spark("r18-profile")
    queries, _ = registry.build_registry()
    names = sys.argv[1:] or bench.HEADLINE
    # warmup: one full pass over every profiled entry first — Catalyst/
    # codegen JIT is cold for the first ~minute of a JVM, which otherwise
    # inflates whichever entries run first (measured: collect_sort_limit
    # "build" 1.1 s cold vs 0.2 s warm in the same session)
    for name in names:
        queries[name](spark, SF_DIR).toPandas()
    out = {"sf_dir": SF_DIR, "entries": {}}
    for name in names:
        rec = {"build": [], "noop": [], "pandas": [], "total": []}
        for _ in range(N):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            # fresh build for the end-to-end shape bench.py times
            t3 = time.perf_counter()
            queries[name](spark, SF_DIR).toPandas()
            t4 = time.perf_counter()
            rec["build"].append(t1 - t0)
            rec["noop"].append(t2 - t1)
            rec["total"].append(t4 - t3)
            rec["pandas"].append((t4 - t3) - (t2 - t1) - (t1 - t0))
        agg = {}
        for k, v in rec.items():
            v = sorted(v)
            agg[k] = {"min": round(v[0], 4), "med": round(v[len(v) // 2], 4)}
        out["entries"][name] = agg
        print(
            f"{name}: build {agg['build']['med']:.3f}  noop {agg['noop']['med']:.3f}"
            f"  total {agg['total']['med']:.3f}",
            flush=True,
        )
    path = os.path.join(os.path.dirname(__file__), "profile_phases_full.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
