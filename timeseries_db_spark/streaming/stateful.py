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
#: state = the tag's raw events still inside the uncertainty horizon
#: (anything that could yet merge into a not-watermark-final session).
SESSION_STATE_SCHEMA = "ts array<long>, vals array<double>"


def sessionize_stream(stream: DataFrame, gap_ms: int = 1_800_000) -> DataFrame:
    """Per-tag gap sessions over a watermarked tsdb stream, finalized by
    the EVENT-TIME WATERMARK — not by arrival order.

    A session is only emitted once the watermark passes ``session_end +
    gap`` (no in-horizon event can extend or bridge it anymore), so
    out-of-order arrivals the watermark tolerates are merged exactly like
    the batch twin would. To make that sound, state keeps the raw events
    of the not-yet-final suffix (bounded by the gap + watermark horizon
    per tag, NOT by history); ``GroupStateTimeout.EventTimeTimeout``
    flushes a tag once the watermark proves no successor can arrive.

    The input must carry ``withWatermark`` on ``event_time``."""

    import numpy as np

    from timeseries_db_spark.functions.numeric import np_duck_round

    def sessions_of(ts: "np.ndarray", vals: "np.ndarray"):
        """Split sorted events into gap sessions → list of (start, end,
        n, total, first_idx)."""
        out = []
        start_i = 0
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > gap_ms:
                out.append((start_i, i))
                start_i = i
        out.append((start_i, len(ts)))
        return out

    def emit_rows(tag, ts, vals, spans):
        return pd.DataFrame(
            {
                "tag": tag,
                "session_start": [int(ts[a]) for a, b in spans],
                "session_end": [int(ts[b - 1]) for a, b in spans],
                "n": [int(b - a) for a, b in spans],
                "total": [
                    float(np_duck_round(np.array([vals[a:b].sum()]), 4)[0])
                    for a, b in spans
                ],
            }
        )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tag = key[0]
        if state.hasTimedOut:
            # watermark passed last+gap: every buffered session is final
            ts_l, v_l = state.get
            ts = np.asarray(ts_l, dtype="int64")
            vals = np.asarray(v_l, dtype="float64")
            if len(ts):
                yield emit_rows(tag, ts, vals, sessions_of(ts, vals))
            state.remove()
            return

        ts_l, v_l = state.get if state.exists else ([], [])
        chunks = [p for p in pdfs if len(p)]
        ts = np.concatenate(
            [np.asarray(ts_l, dtype="int64")]
            + [c["timestamp"].to_numpy("int64") for c in chunks]
        )
        vals = np.concatenate(
            [np.asarray(v_l, dtype="float64")]
            + [c["value"].to_numpy("float64") for c in chunks]
        )
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]
        if not len(ts):
            state.remove()
            return

        wm = state.getCurrentWatermarkMs()
        spans = sessions_of(ts, vals)
        # a session is final once no in-horizon event can extend it
        final = [sp for sp in spans if ts[sp[1] - 1] + gap_ms <= wm]
        if final:
            yield emit_rows(tag, ts, vals, final)
        keep_from = final[-1][1] if final else 0
        rest_ts, rest_vals = ts[keep_from:], vals[keep_from:]
        if len(rest_ts):
            state.update((rest_ts.tolist(), rest_vals.tolist()))
            state.setTimeoutTimestamp(max(int(rest_ts[-1]) + gap_ms, wm + 1))
        else:
            state.remove()

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
    from timeseries_db_spark.functions.numeric import duck_round

    return marked.groupBy("tag", "sess_id").agg(
        F.min("timestamp").alias("session_start"),
        F.max("timestamp").alias("session_end"),
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("_sum"),
    ).withColumn("total", duck_round(F.col("_sum"), 4)).drop("sess_id", "_sum")
