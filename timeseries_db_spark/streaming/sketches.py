"""Streaming maintenance of mergeable sketches (HLL / CMS / histogram).

The sketch modules' merge laws (HLL registers merge by per-bucket max,
CMS counters and histogram buckets by addition — all pytest-pinned in
``tests/test_sketches.py``) are exactly what incremental maintenance
needs: each micro-batch sketches ITS OWN rows (a bounded aggregation),
then folds into the persisted state. State size is bounded by the
sketch (keys x 256 registers / 4096 counters / keys x 256 buckets)
regardless of stream volume — the live telemetry a 100 TB ingest keeps
where exact aggregates would need unbounded state.

Exactly-once without a transaction log: state version v{b} is defined
as ``merge(state v{b-1}, sketch(batch b))`` and written under the
BATCH ID. A re-delivered batch (crash between state write and
checkpoint commit) recomputes and overwrites v{b} with byte-identical
content — idempotent by construction, the same
checkpointed-batch-id discipline as ``streaming/ingest.py``. Readers
take the highest complete version (``_SUCCESS``-marked), so a torn
write of v{b} is invisible until rewritten. Versions older than b-1
are pruned after each write, bounding state at two generations.

``state_dir`` and ``checkpoint_dir`` form ONE unit: restarting with a
fresh checkpoint (batch ids reset to 0) against a RETAINED state_dir
would serve the old state as v>0 and skip merging — recycle or clear
both together, exactly as for the ingest path's table + checkpoint.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_db_spark.operators import sketches

_REG_SCHEMA = "key string, bucket bigint, m int"


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for e in os.listdir(state_dir):
        if e.startswith("v") and os.path.exists(
            os.path.join(state_dir, e, "_SUCCESS")
        ):
            out.append(int(e[1:]))
    return sorted(out)


def read_sketch_state(
    spark: SparkSession, state_dir: str, schema: str = _REG_SCHEMA
) -> DataFrame:
    """The latest complete sketch-state table (an empty frame of
    ``schema`` before the first batch commits)."""
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))


#: Backwards-compatible alias (HLL was the first maintained sketch).
read_hll_state = read_sketch_state


def start_sketch_maintenance(
    stream: DataFrame,
    batch_sketch: Callable[[DataFrame], DataFrame],
    merge: Callable[[DataFrame], DataFrame],
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain ANY mergeable sketch over a stream: ``batch_sketch``
    maps a micro-batch to its sketch table, ``merge`` folds the union
    of two sketch tables back to one (group + max/sum — the sketch's
    merge law). See the module docstring for the idempotence and
    pruning protocol."""
    spark = stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        regs = batch_sketch(batch)
        prior = [v for v in _versions(state_dir) if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(state_dir, f"v{prior[-1]}"))
            regs = merge(prev.unionByName(regs))
        regs.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        # prune versions < batch_id - 1: the checkpoint guarantees
        # batches <= batch_id - 1 are committed, so only v{batch_id-1}
        # can still be needed (as the prior of a re-delivered batch_id
        # after a crash between state write and checkpoint commit)
        for v in _versions(state_dir):
            if v < batch_id - 1:
                shutil.rmtree(
                    os.path.join(state_dir, f"v{v}"), ignore_errors=True
                )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_hll_maintenance(
    stream: DataFrame,
    key: str,
    value_col,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain per-``key`` HLL registers over a stream; query the live
    estimate any time with ``hll_estimate(read_sketch_state(...))``."""
    return start_sketch_maintenance(
        stream,
        lambda b: sketches.hll_registers(b, key, value_col),
        lambda u: u.groupBy("key", "bucket").agg(F.max("m").alias("m")),
        state_dir,
        checkpoint_dir,
    )


def start_cms_maintenance(
    stream: DataFrame,
    value_col,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain the 4096-row count-min counter table over a stream;
    point-query the live sketch with
    ``cms_estimate(read_sketch_state(spark, dir, "row int, idx bigint,
    cnt bigint"), items, col)``."""
    return start_sketch_maintenance(
        stream,
        lambda b: sketches.cms_counters(b, value_col),
        lambda u: u.groupBy("row", "idx").agg(F.sum("cnt").alias("cnt")),
        state_dir,
        checkpoint_dir,
    )


def start_histogram_maintenance(
    stream: DataFrame,
    key: str,
    value_col: str,
    lo: float,
    hi: float,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain per-``key`` fixed-grid histograms over a stream; live
    quantiles via ``histogram_quantile(read_sketch_state(spark, dir,
    "key string, b int, cnt bigint"), q, lo, hi)``."""
    return start_sketch_maintenance(
        stream,
        lambda b: sketches.histogram_counts(b, key, value_col, lo, hi),
        lambda u: u.groupBy("key", "b").agg(F.sum("cnt").alias("cnt")),
        state_dir,
        checkpoint_dir,
    )
