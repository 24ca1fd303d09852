"""Streaming maintenance of mergeable sketches (HLL registers).

The sketch modules' merge laws (HLL registers merge by per-bucket max,
CMS counters by addition — both pytest-pinned in ``tests/
test_sketches.py``) are exactly what incremental maintenance needs:
each micro-batch sketches ITS OWN rows (a bounded aggregation), then
folds into the persisted register state. State size is
O(keys x 256) regardless of stream volume — this is the NDV telemetry
a 100 TB ingest keeps live where an exact count(DISTINCT) would need
unbounded state.

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


def read_hll_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest complete register table (empty frame before the first
    batch commits)."""
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], _REG_SCHEMA)
    return spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))


def start_hll_maintenance(
    stream: DataFrame,
    key: str,
    value_col,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain per-``key`` HLL registers over a stream of rows; query
    the live estimate any time with ``hll_estimate(read_hll_state(...))``."""
    spark = stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        regs = sketches.hll_registers(batch, key, value_col)
        prior = [v for v in _versions(state_dir) if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(state_dir, f"v{prior[-1]}"))
            regs = (
                prev.unionByName(regs)
                .groupBy("key", "bucket")
                .agg(F.max("m").alias("m"))
            )
        regs.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        # prune versions < batch_id - 1: the checkpoint guarantees
        # batches <= batch_id - 1 are committed, so only v{batch_id-1}
        # can still be needed (as the prior of a re-delivered
        # batch_id after a crash between state write and checkpoint
        # commit). Without pruning, state storage grows O(batches) and
        # the listing scan degrades linearly — the bounded-state claim
        # holds per VERSION, the prune makes it hold overall.
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
