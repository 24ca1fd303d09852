"""Stream-stream joins with event-time bounds — the Structured Streaming
surface beyond single-stream aggregation (the reference has no joins and
no streams at all; north-star extension beside ``streaming/ingest.py``).

A stream-stream inner join buffers BOTH sides in state; without time
bounds that state grows forever. The two levers Spark requires (and this
module always sets):

* a watermark on each input, which bounds how late either side can be;
* an event-time range in the join condition, which lets the engine
  evict a buffered row once the other stream's watermark passes the
  range — state is O(rows within tolerance + lateness), not O(stream).

Scale: the join shuffles both streams on the equality key (tag) exactly
like a batch shuffle join; the time-range predicate is evaluated
residually inside each key's state store. At 100 TB/day the state per
executor is bounded by (rows/sec × tolerance) of its key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_alerts(
    events: DataFrame,
    alerts: DataFrame,
    *,
    tolerance: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join each event to the SAME-tag alerts raised at-or-before
    it within ``tolerance`` — the streaming analog of a bounded as-of
    fan-out (every qualifying alert matches, not just the latest: the
    latest-only reduction needs a post-aggregation, which stream-stream
    mode cannot chain after a join; do it downstream or in batch).

    Both inputs must carry the tsdb stream shape
    ``(timestamp, tag, value, event_time)`` —
    :func:`timeseries_db_spark.streaming.ingest.read_events_stream`
    output. Returns (timestamp, tag, value, alert_ts, alert_value)."""
    e = (
        events.withWatermark("event_time", watermark)
        .select("timestamp", "tag", "value", "event_time")
    )
    a = (
        alerts.withWatermark("event_time", watermark)
        .select(
            F.col("tag").alias("a_tag"),
            F.col("timestamp").alias("alert_ts"),
            F.col("value").alias("alert_value"),
            F.col("event_time").alias("a_time"),
        )
    )
    cond = (
        (F.col("tag") == F.col("a_tag"))
        & (F.col("a_time") >= F.expr(f"event_time - INTERVAL {tolerance}"))
        & (F.col("a_time") <= F.col("event_time"))
    )
    return e.join(a, cond, "inner").select(
        "timestamp", "tag", "value", "alert_ts", "alert_value"
    )


def _pinned_reference_read(reference, out_dir: str, batch_id: int) -> DataFrame:
    """Resolve the reference snapshot for one batch, PINNED across
    replays (ADVICE r8: a batch replayed after a crash used to join
    against the reference's CURRENT snapshot, so if the reference moved
    between the original attempt and the replay, the rewritten
    ``batch=<id>`` partition differed from what downstream readers may
    already have consumed). For a versioned reference (``version()`` +
    ``read(version=...)`` — the TsTable contract) the version is
    resolved once per batch id and recorded in a ``_refver/`` sidecar
    BEFORE any data write (atomic tmp+rename), so every replay reads the
    version the first attempt saw; references without versions fall back
    to ``read()`` with the weaker overwrite-consistent contract.

    Retention coupling (r10 ADVICE): the pin only holds as long as the
    reference RETAINS the pinned version — ``vacuum(retain_versions=N)``
    must cover the window in which a batch can still be replayed (the
    checkpoint's unfinished tail; for exactly-once downstreams, any
    batch a reader might reconcile). If the pinned version has been
    vacuumed between attempts, the replay cannot reproduce the original
    join; rather than crash the whole stream it logs a warning, reads
    the CURRENT snapshot, and RE-PINS to it (tmp+rename again), so
    replays from then on are stable against the new version — the same
    degradation an unversioned reference has from the start."""
    import os

    if not (hasattr(reference, "version") and callable(getattr(reference, "version"))):
        return reference.read()
    vdir = os.path.join(out_dir, "_refver")  # _-prefix: invisible to readers
    os.makedirs(vdir, exist_ok=True)
    vfile = os.path.join(vdir, f"batch-{batch_id}")

    def _pin(version: int) -> None:
        tmp = vfile + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, vfile)

    if os.path.exists(vfile):
        with open(vfile) as f:
            version = int(f.read())
        try:
            return reference.read(version=version)
        except ValueError:  # pinned version vacuumed since the pin
            import warnings

            current = reference.version()
            warnings.warn(
                f"asof-enrich batch {batch_id}: pinned reference version "
                f"{version} is no longer retained (vacuumed); degrading "
                f"to current version {current} and re-pinning — widen "
                "the reference's vacuum retain_versions to cover "
                "replayable batches",
                stacklevel=2,
            )
            _pin(current)
            return reference.read(version=current)
    version = reference.version()
    _pin(version)
    return reference.read(version=version)


def process_asof_batch(
    batch: DataFrame,
    batch_id: int,
    reference,
    out_dir: str,
    *,
    on: str = "tag",
    payload: list[str] | None = None,
) -> None:
    """One micro-batch of the as-of enrichment — module-level so tests
    can drive and replay it directly (the corpus-ingest pattern)."""
    import os

    from timeseries_db_spark.operators.asof import asof_join

    if payload is None:
        payload = ["ref_value"]
    if batch.limit(1).count() == 0:
        return
    enriched = asof_join(
        batch.select("timestamp", on, "value"),
        _pinned_reference_read(reference, out_dir, batch_id).withColumnRenamed(
            "value", "ref_value"
        ),
        on=on,
        payload=payload,
    )
    enriched.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}")
    )


def start_asof_enrich(
    stream: DataFrame,
    reference: "object",
    out_dir: str,
    checkpoint_dir: str,
    *,
    on: str = "tag",
    payload: list[str] | None = None,
):
    """Streaming AS-OF enrichment: each micro-batch of events is joined
    to the most recent reference row at-or-before its timestamp — the
    "enrich ticks with the latest reference data" pattern. The
    latest-only reduction a stream-stream join cannot express (no
    post-join aggregation in streaming mode) falls out naturally in
    ``foreachBatch``: the batch side is plain batch, so the tested
    batch :func:`~timeseries_db_spark.operators.asof.asof_join` runs
    verbatim against a per-batch snapshot of the reference table (a
    reference update between batches is picked up by the next batch,
    exactly the semantics a slowly changing dimension wants).

    ``reference`` is a :class:`~timeseries_db_spark.operators.dml.TsTable`
    (or any object with ``read() -> DataFrame``); its ``value`` column
    is renamed ``ref_value`` (the default payload) — a custom
    ``payload`` list must name columns the reference read actually
    carries. Output appends to ``out_dir`` as ``batch=<id>`` partition
    overwrites — idempotent on replay INCLUDING the reference side: for
    versioned references the snapshot each batch joined is pinned in a
    ``_refver/`` sidecar before the data write, so a replay after a
    crash rewrites value-identical rows even if the reference moved in
    between (see :func:`_pinned_reference_read`)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_asof_batch(
            batch, batch_id, reference, out_dir, on=on, payload=payload
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
