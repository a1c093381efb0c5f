"""Custom stateful streaming operator: per-conversation extraction state.

``conversation_progress`` keeps, per conv_id, a running aggregate across
micro-batches — turns seen, last turn index, number of turns whose text
carries a payee marker — using ``applyInPandasWithState`` (the Spark-native
replacement for the reference's in-process mutable counters,
issuer_processor_v.py:63-69/614-620, which only work single-machine).

State schema is explicit and small (three longs), so the state store scales
to 10^9 conversations; a processing-time timeout closes idle conversations
and emits their final row (the "conversation finished" signal a downstream
merge would consume).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turns_seen", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
    T.StructField("payee_marker_turns", T.LongType()),
    T.StructField("closed", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("turns_seen", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
    T.StructField("payee_marker_turns", T.LongType()),
])

_PAYEE_MARKERS = ("PAY", "ORDER OF", "FAVOUR OF", "BENEFICIARY")


def _make_update(idle_timeout_ms: int):
    def _update(key, pdf_iter, state: GroupState):
        return _update_impl(key, pdf_iter, state, idle_timeout_ms)
    return _update


def _update_impl(key, pdf_iter, state: GroupState, idle_timeout_ms: int):
    (conv_id,) = key
    if state.hasTimedOut:
        turns, max_idx, markers = state.get
        state.remove()
        yield pd.DataFrame({
            "conv_id": [conv_id], "turns_seen": [turns],
            "max_turn_idx": [max_idx], "payee_marker_turns": [markers],
            "closed": [True],
        })
        return

    turns, max_idx, markers = state.get if state.exists else (0, -1, 0)
    for pdf in pdf_iter:
        turns += len(pdf)
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
            texts = pdf["text"].fillna("").str.upper()
            markers += int(
                texts.apply(lambda t: any(m in t for m in _PAYEE_MARKERS)).sum()
            )
    state.update((turns, max_idx, markers))
    state.setTimeoutDuration(idle_timeout_ms)  # close idle conversations
    yield pd.DataFrame({
        "conv_id": [conv_id], "turns_seen": [turns],
        "max_turn_idx": [max_idx], "payee_marker_turns": [markers],
        "closed": [False],
    })


def conversation_progress(stream: DataFrame, idle_timeout_ms: int = 30_000):
    """transcript stream → per-conversation running state (update mode)."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
