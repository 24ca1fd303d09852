"""Custom stateful streaming operator: per-tag running totals via
``applyInPandasWithState`` — the arbitrary-stateful-processing path the
brief calls out for semantics the built-in streaming operators can't
express (a cumulative, order-dependent fold that must survive across
micro-batches).

State per tag is two numbers ``(cnt, total)`` — O(distinct tags), not
O(history) — so state never grows with data volume; at 100 TB the state
store holds one tiny tuple per tag. Output is append-mode: each input row
is emitted exactly once, extended with the cumulative count/sum *as of*
that row.

Ordering contract: rows are folded in event-time order within each
micro-batch; across batches the fold follows arrival order. Totals equal
the batch twin (``operators/analytics.py``) when batches arrive
time-ordered (the normal case for time-partitioned ingest); out-of-order
arrivals fold late rows at arrival position — documented deviation, same
trade-off every streaming cumulative makes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from timeseries_db_spark.functions.numeric import np_duck_round

OUT_SCHEMA = (
    "timestamp long, tag string, value double, run_cnt double, run_sum double"
)
STATE_SCHEMA = "cnt long, total double"


def running_totals_stream(stream: DataFrame) -> DataFrame:
    """``stream`` is tsdb-shaped (timestamp, tag, value, …). Returns the
    same rows extended with cumulative per-tag ``run_cnt``/``run_sum``."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, total = state.get if state.exists else (0, 0.0)
        # concat ALL Arrow chunks before sorting: a group larger than
        # maxRecordsPerBatch arrives as several chunks, and chunk-local
        # sorting would fold later-chunk rows with earlier event times at
        # the wrong cumulative position. Memory = one group's micro-batch.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("timestamp")
            run_cnt = cnt + pd.RangeIndex(1, len(pdf) + 1)
            run_sum = total + pdf["value"].cumsum()
            cnt = int(run_cnt[-1])
            total = float(run_sum.iloc[-1])
            yield pd.DataFrame(
                {
                    "timestamp": pdf["timestamp"].to_numpy(),
                    "tag": key[0],
                    "value": pdf["value"].to_numpy(),
                    "run_cnt": run_cnt.to_numpy(dtype="float64"),
                    # duck-parity rounding, not pandas' half-to-even
                    "run_sum": np_duck_round(run_sum.to_numpy(), 4),
                }
            )
        state.update((cnt, total))

    return (
        stream.select("timestamp", "tag", "value")
        .groupBy("tag")
        .applyInPandasWithState(
            fold, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


# ---------------------------------------------------------------------------
# gap-based sessionization with event-time timeout
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "tag string, session_start long, session_end long, n long, total double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_stream(stream: DataFrame, gap_ms: int = 1_800_000) -> DataFrame:
    """Per-tag gap sessions over a watermarked tsdb stream: a session
    closes when the next event is more than ``gap_ms`` later (emitted
    immediately) or when the event-time watermark passes ``last + gap``
    with no successor (emitted via ``GroupStateTimeout.EventTimeTimeout``
    — the state-timeout pattern the built-in windows can't express).

    State per tag is one open session tuple — O(tags) regardless of
    volume. The input must carry ``withWatermark`` on ``event_time``
    (event-time timeouts are driven by the watermark)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tag = key[0]

        def session_row(s):
            return pd.DataFrame(
                {
                    "tag": [tag],
                    "session_start": [int(s[0])],
                    "session_end": [int(s[1])],
                    "n": [int(s[2])],
                    "total": [round(float(s[3]), 4)],
                }
            )

        if state.hasTimedOut:
            # watermark passed last+gap with no successor: final flush
            yield session_row(state.get)
            state.remove()
            return

        cur = list(state.get) if state.exists else None
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # see running_totals_stream: sort the whole micro-batch, not
            # each Arrow chunk, or cross-chunk event order breaks sessions
            pdf = pd.concat(chunks).sort_values("timestamp")
            for ts, v in zip(pdf["timestamp"].to_numpy(), pdf["value"].to_numpy()):
                ts = int(ts)
                if cur is None:
                    cur = [ts, ts, 1, float(v)]
                elif ts - cur[1] > gap_ms:
                    yield session_row(cur)
                    cur = [ts, ts, 1, float(v)]
                else:
                    cur[1] = max(cur[1], ts)
                    cur[2] += 1
                    cur[3] += float(v)
        if cur is not None:
            state.update(tuple(cur))
            # fire once the watermark proves no in-horizon successor can
            # extend this session (clamped above the current watermark,
            # which Spark requires)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1))

    return (
        stream.select("timestamp", "tag", "value", "event_time")
        .groupBy("tag")
        .applyInPandasWithState(
            fold,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_tsdb_batch(tsdb: DataFrame, gap_ms: int = 1_800_000) -> DataFrame:
    """Batch twin: lag/cumsum gap sessionization per tag — same output
    schema, for verifying the streaming operator end-to-end."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("tag").orderBy("timestamp")
    marked = tsdb.withColumn(
        "new_sess",
        (
            F.col("timestamp") - F.lag("timestamp").over(w) > gap_ms
        ).cast("int"),
    ).withColumn(
        "sess_id",
        F.sum(F.coalesce(F.col("new_sess"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("tag", "sess_id").agg(
        F.min("timestamp").alias("session_start"),
        F.max("timestamp").alias("session_end"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
    ).drop("sess_id")
