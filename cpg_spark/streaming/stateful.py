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
    StringType,
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


# --- streaming DFA typestate monitor ----------------------------------------

DFA_VIOLATION_OUT = StructType(
    [
        StructField("key_id", LongType()),
        StructField("violation_ts_us", LongType()),
        StructField("symbol", StringType()),
        StructField("from_state", StringType()),
        StructField("n_events", LongType()),
    ]
)

# state: (cur_state, n_events, violated 0/1) — violated keys freeze, the
# batch evaluator's rule (dfa_evaluate keeps the stuck state and index)
DFA_STATE = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("n_events", LongType()),
        StructField("violated", LongType()),
    ]
)


def dfa_monitor_stream(
    events: DataFrame,
    transitions: dict[tuple[str, str], str],
    start_state: str = "S0",
) -> DataFrame:
    """Streaming typestate monitor — the DFAOrderEvaluator as a LIVE
    protocol check over an event stream (reference DFAOrderEvaluator.kt
    walks a finished graph; a web-scale ingest wants the same verdicts
    while events arrive). events(key_id long, ts_us long, symbol
    string) stream → one row per ORDER VIOLATION, emitted in the
    micro-batch where the offending symbol arrives.

    Semantics match the batch dfa_evaluate fold per key: symbols apply
    in ts order from start_state; the first symbol with no transition
    from the current state is the violation — the key's state FREEZES
    (violated flag) and later events for that key are absorbed without
    re-emitting, so each key reports at most one violation row, exactly
    like the batch violation_idx. One small state row per key, stable
    across micro-batches and AvailableNow restarts via the checkpoint.

    Ordering: all Arrow chunks of a key's micro-batch are gathered and
    sorted by ts_us before folding (the sessionize lesson); events
    arriving in LATER batches with earlier timestamps fold in arrival
    order — bound late data upstream with a watermark if replay order
    matters. transitions is dictionary-sized and closes over the
    state function (the broadcast-without-a-join pattern of
    dfa_evaluate)."""

    def monitor(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_id,) = key
        if state.exists:
            cur, n, violated = state.get
        else:
            cur, n, violated = start_state, 0, 0

        out_rows = []
        batch = sorted(
            (ts, sym)
            for pdf in pdfs
            for ts, sym in zip(pdf["ts_us"].tolist(), pdf["symbol"].tolist())
        )
        for ts, sym in batch:
            if violated:
                n += 1
                continue
            nxt = transitions.get((cur, sym))
            if nxt is None:
                out_rows.append((key_id, ts, sym, cur, n + 1))
                violated = 1
            else:
                cur = nxt
            n += 1
        state.update((cur, n, violated))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in DFA_VIOLATION_OUT.fields]
            )

    return events.groupBy("key_id").applyInPandasWithState(
        monitor,
        outputStructType=DFA_VIOLATION_OUT,
        stateStructType=DFA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
