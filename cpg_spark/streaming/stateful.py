"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState — the pattern for operators Spark's windowed aggs
can't express (state machines, custom eviction).

Batch twin: the window-algebra sessionization in queries.q_events_sessions
(lag + cumulative sum). The streaming version keeps one small state row
per user and emits a session exactly when a gap closes it, independent of
micro-batch boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 1800 * 1_000_000

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0

    out_rows = []
    # accumulate ALL Arrow chunks before sorting: a group spanning
    # multiple chunks in one micro-batch would otherwise process
    # timestamps out of order (`last` moving backwards merges/splits
    # sessions incorrectly); within-chunk sort alone is not enough
    all_ts = sorted(ts for pdf in pdfs for ts in pdf["ts_us"].tolist())
    for ts in all_ts:
        if last is not None and ts - last > SESSION_GAP_US:
            out_rows.append((user_id, start, last, n))
            start, n = ts, 0
        if start is None:
            start = ts
        last = ts
        n += 1
    state.update((start, last, n))
    if out_rows:
        yield pd.DataFrame(out_rows, columns=[f.name for f in SESSION_OUT.fields])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts_us) stream -> completed sessions. One state row
    per user; sessions emit when a 30-min gap closes them. Open sessions
    stay in state across micro-batches (and across AvailableNow drains,
    via the checkpoint)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
