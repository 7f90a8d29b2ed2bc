"""Conversation sessionization on Spark 4's ``transformWithStateInPandas``
— the new-generation arbitrary-state API (SPARK-40434 successor, RocksDB
state store) twin of ``stateful.conversation_sessions``.

Same contract as the ``applyInPandasWithState`` version: turns for a
conv_id arrive across micro-batches; per-key state holds only scalars
(count, first/last event time, rolling text fingerprint — never the turn
text), and the session row is EMITTED exactly once after ``gap_ms`` of
processing-time quiet.  What the new API adds over GroupState:

- **explicit timers** (register/delete per key) instead of one implicit
  timeout slot — here each batch re-arms a single quiet timer;
- **typed state variables** (ValueState / ListState / MapState) with
  per-variable schemas and optional TTL, instead of one monolithic tuple;
- **composability**: init/handleInputRows/handleExpiredTimer separate the
  fold from the emission, so the fold logic is unit-testable.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``...state.RocksDBStateStoreProvider``) — bundled with Spark 4; the test
sets it per-query and restores the previous provider.

ENVIRONMENT NOTE: the transformWithState Python runner needs the
``protobuf`` package (its driver-side state-server protocol is proto-
encoded); this sandbox does not ship it, so the e2e test skips with the
exact reason when ``google.protobuf`` is absent.  The module still
imports and the processor's fold logic is the same `_fold_fp` kernel the
GroupState twin exercises end-to-end — on any normal Spark 4 install
(protobuf is a pyspark[connect] dependency) the test runs as-is.

Scale shape: identical to the GroupState version — state is O(#open
conversations) × four int64s, emission is append-mode compatible.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import SESSION_SCHEMA, STATE_SCHEMA, _fold_fp

if TYPE_CHECKING:  # pragma: no cover
    pass


class SessionProcessor(StatefulProcessor):
    """Fold turns into (n_turns, first_us, last_us, text_fp); emit on the
    quiet timer.  One ValueState + one processing-time timer per key."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n, first_us, last_us, fp = (
            self._state.get() if self._state.exists() else (0, None, None, 0)
        )
        for pdf in rows:
            pdf = pdf.sort_values("turn_idx")
            n += len(pdf)
            us = pdf["ts"].astype("int64") // 1000  # ns → us
            lo, hi = int(us.min()), int(us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            fp = _fold_fp(fp, pdf["text"].fillna(""))
        self._state.update((n, first_us, last_us, fp))
        # re-arm the quiet timer: drop any previous one, register anew
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._gap_ms
        )
        yield from ()

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._state.exists():
            return
        n, first_us, last_us, fp = self._state.get()
        self._state.clear()
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "text_fp": [fp],
            }
        )

    def close(self) -> None:
        pass


def conversation_sessions_tws(stream: DataFrame, gap_ms: int = 60_000) -> DataFrame:
    """transformWithStateInPandas twin of
    ``stateful.conversation_sessions`` — same input (TRANSCRIPT_DDL
    stream) and output (SESSION_SCHEMA, append mode)."""
    return stream.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_ms),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )
