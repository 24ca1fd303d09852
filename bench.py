"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan build + execution + collect of the
small result). A warmup query first pays JVM/codegen startup so the
numbers measure the engine, not JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseries_db_spark.session import get_spark
from timeseries_db_spark import registry

HEADLINE = [
    # reference surface: scan/filter/agg/group/sort/limit shapes
    "agg_sum",                 # full-scan scalar agg (onlyAgg fast path)
    "agg_avg_by_tag",          # range filter + low-card group
    "agg_sum_by_ts",           # range filter + high-card group (shuffle-heavy)
    "collect_sort_desc_limit", # top-k (TakeOrderedAndProject)
    "range_ge_lt",             # pushed-down range scan, raw rows
    "li_sum_by_tag",           # 10× bigger table, group-by
    "li_avg_by_tag",           # 10× bigger table, filter + group-by
    # north-star pipeline operators
    "join_revenue_by_nation",  # 3-way join, broadcast dims
    "asof_hourly_enrich",      # as-of join (union+window)
    "running_totals_by_tag",   # skew-safe two-pass window
    "dedup_minhash_lsh",       # shingle→minhash→band→bucket-join
    "text_quality_score",      # documents scan, expression-only scoring
    "sim_cosine_topk",         # brute-force ANN baseline (Arrow UDF)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("tsdb-bench")
    queries, _ = registry.build_registry()

    # warmup: JVM + whole-stage codegen + parquet footer caches
    queries["agg_count"](spark, sf_dir).collect()

    # best-of-2 per query: this box runs other workloads (load spikes of
    # ±40% observed between identical runs); the min of two runs measures
    # the engine rather than the neighbors
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
