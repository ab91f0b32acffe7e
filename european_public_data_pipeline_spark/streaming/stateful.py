"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 — the extension surface for operators Spark's built-in
windows can't express).

``running_user_totals`` keeps one state row per user — cumulative event
count, cumulative value, last-seen timestamp — and emits the updated totals
every micro-batch. This is the canonical shape for custom per-key stream
state (fraud counters, rate limiters, feature freshness) that tumbling /
session windows cannot express because state must never close.

Scale notes: state is keyed by user_id and lives in the executor state
store; the only shuffle is the groupBy on the key. Batches arrive as Arrow
pandas frames (vectorized), not per-row Python. With a watermark +
``GroupStateTimeout`` idle keys can be evicted to bound state; totals here
are deliberately unbounded (a design choice, not an accident).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterable["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    n_events, total_value, last_ts = (
        state.get if state.exists else (0, 0.0, None)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or (batch_max is not pd.NaT and batch_max > last_ts):
            last_ts = batch_max
    state.update((n_events, total_value, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_value],
            "last_ts": [last_ts],
        }
    )


def running_user_totals_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Same running totals on the Spark 4 ``transformWithStateInPandas``
    API: a ``StatefulProcessor`` with typed ``ValueState`` — finer-grained
    state (per-variable TTL, timers, multiple state variables per key)
    than the single-tuple ``applyInPandasWithState`` model above. Both are
    kept: the processor API is the forward path, the legacy API is what
    most deployed pipelines still run.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package for the worker protocol — the test skips where
    protobuf is unavailable (as in this container).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType(), True),
            T.StructField("total_value", T.DoubleType(), True),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n_events, total_value = (
                self.totals.get() if self.totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n_events += len(pdf)
                total_value += float(pdf["value"].sum())
            self.totals.update((n_events, total_value))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n_events],
                    "total_value": [total_value],
                }
            )

        def close(self) -> None:
            pass

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("n_events", T.LongType(), True),
            T.StructField("total_value", T.DoubleType(), True),
        ]
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user cumulative totals as a custom stateful operator.

    Works on a streaming DataFrame (state persists across micro-batches via
    the state store) and degenerates to a single-batch groupApply on a batch
    DataFrame's grouped data in tests.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
