"""Audit pass for the registry entries OPTIMIZATION_r17.md had not yet
examined by name: plan shape (Exchange count, join strategies, Python
boundary nodes) + noop-sink execution time (guide §1.4) at sf0.1.

Usage: python plans/r17/examine_rest.py [names...]
"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from timeseries_db_spark.session import get_spark
from timeseries_db_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "agg_quantiles_by_tag",
    "multimodal_resize_plan",
    "multimodal_audio_chunks",
    "sim_embedding_dedup",
    "join_top_orders_building",
    "sessionize_30m",
    "dedup_exact",
    "sim_quantize_int8",
    "fx_surface",
    "corpus_sample_stratified",
    "join_revenue_by_region",
    "join_part_brand_stats",
    "events_props_stats",
    "rollup_tag_day",
    "corpus_pack",
    "corpus_split",
    "multimodal_image_features",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("r17-examine")
    queries, _ = registry.build_registry()
    here = os.path.dirname(os.path.abspath(__file__))
    # warmup
    queries["collect_sort_limit"](spark, SF_DIR).toPandas()
    for name in names:
        spark.sparkContext.setJobDescription(f"examine:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(here, f"{name}_audit.txt"), "w") as f:
            f.write(txt)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        counts = {
            k: len(re.findall(k, txt))
            for k in (
                "Exchange",
                "SortMergeJoin",
                "BroadcastHashJoin",
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "CartesianProduct",
                "BroadcastNestedLoopJoin",
            )
        }
        flat = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(
            f"{name}: build={t_build:.2f}s noop={t_noop:.2f}s {flat}",
            flush=True,
        )


if __name__ == "__main__":
    main()
