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
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("timestamp")
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
                    "run_sum": run_sum.round(4).to_numpy(),
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
