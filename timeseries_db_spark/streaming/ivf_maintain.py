"""Streaming IVF index MAINTENANCE (r16): keep the ANN index fresh
under arrival without re-clustering. At 100 TB the coarse quantizer
(`operators/similarity.py:ivf_centroids*`) is (re)built rarely — it
costs a corpus pass — while new embedding shards land continuously;
the production pattern (faiss/Milvus alike) is to ASSIGN arrivals to
the frozen quantizer incrementally (map-only, one broadcast of
≤ nlist centroids) and watch per-list growth for the moment the
assignment skews enough to justify a re-cluster.

This module is that pattern as one streaming query: embedding shards
arrive as a file-source stream, each micro-batch assigns against the
broadcast centroid matrix with the SAME engine-reproducible rule as
the batch path (round(cos, 6) DESC, centroid id ASC —
``_ivf_assign_fn``), and assignments land as idempotent per-batch
partition overwrites. ``list_growth`` is the re-cluster trigger
signal: per-list arrival counts, a one-groupBy read of the
assignment state.

Scale shape: the per-batch plan is ONE Arrow-batched map (no
Exchange) — assignment cost is linear in the batch's own rows, the
centroid broadcast is bounded by nlist, and nothing reaches the
driver but the initial centroid collect (already bounded — the same
collect every IVF consumer performs).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.operators.similarity import (
    _collect_matrix,
    _ivf_assign_fn,
)


def read_embedding_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of (vec_id, embedding) parquet shards — the
    arrival unit of a continuously-exported embedding corpus."""
    reader = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.parquet(path)


def start_ivf_assign_ingest(
    stream: DataFrame,
    cents_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start the incremental-assignment query: every arriving vector
    is assigned to its nearest centroid of the FROZEN quantizer
    ``cents_df`` (collected and broadcast once, sorted by vec_id so
    the stable tie-break matches the batch path and its SQL twin).
    Assignments land under ``out_dir/assign/batch=<id>/`` with the
    same idempotent per-batch overwrite as the corpus ingests."""
    spark = stream.sparkSession
    ids, cmat = _collect_matrix(cents_df)
    if cmat.shape[0] == 0:
        raise ValueError("IVF quantizer found an empty corpus")
    order = np.argsort(ids, kind="stable")
    bc = spark.sparkContext.broadcast((ids[order], cmat[order]))
    fn = _ivf_assign_fn(bc, 1)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch.select("vec_id", "embedding").mapInPandas(
            fn, schema="vec_id long, list_id long"
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "assign", f"batch={batch_id}")
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_assignments(spark, out_dir: str) -> DataFrame:
    """(batch, vec_id, list_id) — every incremental assignment."""
    return spark.read.parquet(os.path.join(out_dir, "assign"))


def list_growth(spark, out_dir: str) -> DataFrame:
    """(list_id, n_new) — per-list arrival counts since the quantizer
    was frozen: the re-cluster trigger signal (a skewed or outsized
    list says the frozen centroids no longer describe the data)."""
    return read_assignments(spark, out_dir).groupBy("list_id").agg(
        F.count("*").alias("n_new")
    )
