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
